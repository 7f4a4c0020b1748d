"""Pluggable fetch stages for the crawl engine.

The reference's core loop is fetch -> parse -> extract (scraper.py:491-558,
one-parse tests tests/test_scraper.py:436-488).  The engine expresses that
loop as a *stage*: a callable ``(batch: DataFrame) -> DataFrame`` that takes
a dequeued wave batch (LINKS columns) and returns it widened with the fetch
outcome columns ``_wave`` consumes:

    status_code int            NULL = connection-level failure
    content_type string
    transient_failures_remaining int   corpus-sim only (NULL on live HTTP)
    title string
    spans array<struct<kind,text,media_ref,offset>>   content spans
    out_links array<string>    every raw href the one-parse produced

Two implementations:

* :func:`corpus_fetch_stage` — the sandbox default: an equi-join against the
  synthetic corpus (no network in the sandbox).  ``out_links`` is derived
  from the corpus link spans, so discovery semantics are identical to round
  2's explode-the-link-spans path.
* :func:`http_extract_stage` — the production path: the pooled
  ``mapInPandas`` HTTP stage (sources/fetch.py, reference transport policy
  scraper.py:98-111) followed by the fused one-parse extraction UDF
  (functions/extraction.py:298-321) with the CSS include/exclude filters
  bound (reference cli.py:140-159, P6/P7).  This is what activates
  ``CrawlConfig.css_include``/``css_exclude``.

Scale notes: the corpus stage is one equi-join (broadcast or shuffled by
AQE); the HTTP stage adds no shuffle for the fetch itself (mapInPandas is
partition-local, politeness salting already spread hot hosts) and one
wave-sized equi-join to re-attach frontier metadata to the fetch results.
Extraction stays an Arrow-batched pandas UDF — one parse per document.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.functions.extraction import make_extract_udf
from crawler_to_md_spark.sources.fetch import (
    FetchPolicy,
    Transport,
    http_fetch_stage,
    proxy_self_test,
    requests_transport,
)

FetchStage = Callable[[DataFrame], DataFrame]

# columns every fetch stage must add to the batch
FETCH_STAGE_COLUMNS = (
    "status_code", "content_type", "transient_failures_remaining",
    "title", "spans", "out_links",
)


def corpus_fetch_stage(corpus: DataFrame) -> FetchStage:
    """Simulated fetch: left-join the wave batch against a pre-fetched page
    store on ``url``.  A corpus row with ``transient_failures_remaining > n``
    fails the n-th app-level attempt with 503 and succeeds after — the
    engine's retry/requeue path is exercised end-to-end."""
    corpus_cols = corpus.select(
        "url", "status_code", "content_type",
        "transient_failures_remaining", "title", "spans",
    )

    def stage(batch: DataFrame) -> DataFrame:
        return batch.join(corpus_cols, "url", "left").withColumn(
            "out_links",
            F.transform(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link")),
                lambda s: s["media_ref"],
            ),
        )

    return stage


def http_extract_stage(
    policy: FetchPolicy | None = None,
    transport_factory: Callable[[], Transport] = requests_transport,
    css_include: list[str] | None = None,
    css_exclude: list[str] | None = None,
    charset: str = "UTF-8",
    etag_col: str | None = None,
    last_modified_col: str | None = None,
) -> FetchStage:
    """Live fetch + one-parse extraction as one stage.

    The transport's retry state machine (sources/fetch.py:106-126) already
    performs the reference's TRANSPORT-level retries, so
    ``transient_failures_remaining`` is NULL — app-level retry classification
    in ``_wave`` sees the final status only, exactly like the reference's
    scraper sees the adapter's final response (scraper.py:98-111,491-549).
    Connection-level failures surface as NULL ``status_code`` -> the
    ``conn_error`` outcome.
    """
    extract = make_extract_udf(css_include, css_exclude)

    def stage(batch: DataFrame) -> DataFrame:
        results = http_fetch_stage(
            batch, policy, transport_factory,
            etag_col=etag_col, last_modified_col=last_modified_col)
        joined = batch.drop(
            *[c for c in (etag_col, last_modified_col) if c]
        ).join(results, "url", "left")
        html = F.when(F.col("fetched_html"), F.decode(F.col("body"), charset))
        parsed = joined.withColumn("__e", extract(html))
        base_cols = [c for c in batch.columns
                     if c not in (etag_col, last_modified_col)]
        return parsed.select(
            *base_cols,
            F.when(F.col("status_code") == 0, F.lit(None).cast("int"))
            .otherwise(F.col("status_code"))
            .alias("status_code"),
            "content_type",
            F.lit(None).cast("int").alias("transient_failures_remaining"),
            F.col("__e.title").alias("title"),
            F.col("__e.spans").alias("spans"),
            F.col("__e.out_links").alias("out_links"),
            # conditional-refetch outcome (sources/fetch.py O16): a 304
            # revalidation surfaces here; _wave keeps the committed doc,
            # and fresh response validators flow into the ok-doc metadata
            F.coalesce(F.col("not_modified"), F.lit(False))
            .alias("not_modified"),
            "etag",
            "last_modified",
        )

    return stage


def http_stage_from_config(
    config,
    transport_factory: Callable[[], Transport] = requests_transport,
) -> FetchStage:
    """Bind a :class:`~crawler_to_md_spark.operators.crawl.CrawlConfig`'s
    transport + CSS knobs into a live fetch stage (what a deployment — or a
    test with an injected transport — hands to ``CrawlEngine``)."""
    policy = FetchPolicy(
        timeout=config.timeout,
        proxy=config.proxy,
        max_retries=max(1, config.max_retries),
    )
    if config.proxy:
        # reference startup proxy check (scraper.py:122-146): fail fast on
        # the driver before any wave is scheduled
        proxy_self_test(policy, transport_factory(),
                        config.scope_base_url or "https://example.com/")
    return http_extract_stage(
        policy, transport_factory,
        css_include=config.css_include or None,
        css_exclude=config.css_exclude or None,
        # CrawlConfig.revalidate: the engine joins the committed docs'
        # stored validators as __etag/__lm before the stage runs
        etag_col="__etag" if getattr(config, "revalidate", False) else None,
        last_modified_col=(
            "__lm" if getattr(config, "revalidate", False) else None),
    )
