"""Operators over the interleaved text+media span table — the engine's
native document shape and the exact input hint of BASELINE.json:
``(doc_id:string, spans:array<struct<kind:string,text:string,
media_ref:string,offset:int>>)``.

The crawl stores every fetched page in this shape (store/schemas.py
DOCS_SCHEMA); markdown is a *projection* of it (functions/markdown.py).
These operators consume the span structure itself — the multimodal
pipeline steps a text-only column cannot express:

- ``media_manifest``  — the media-fetch frontier: every distinct media
  reference across the corpus with its reference count and first citing
  page.  A multimodal crawl is two frontiers (pages, then the media those
  pages embed); this derives the second from the first.
- ``span_stats``      — per-document interleaving statistics (span counts
  by role, text-token mass, media density) — the gate signals a
  vision-language curation pass filters on.
- ``pack_interleaved``— token-budget shard packing where media spans cost
  a fixed ``media_cost`` tokens (a vision-LM's per-image patch budget),
  so interleaved documents pack under their true sequence length, not
  their text length.

Scale notes.  ``media_manifest`` is one partial-aggregated shuffle keyed
by ``media_ref`` (map-side combine collapses per-page repeats; only
distinct refs with (count, min-url) move).  ``span_stats`` is a pure
scan-side projection — per-row folds over a bounded span array, no
Exchange, no Python.  ``pack_interleaved`` reuses packing.py's two-phase
distributed prefix sum: never a single-task global window, one number per
partition on the driver.

No reference analog: crawler-to-md serializes spans straight to markdown
TEXT (scraper.py:259-274) and keeps no media table; this is a mission
add-on for multimodal training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.packing import with_running_total
from crawler_to_md_spark.operators.textstats import token_count

__all__ = [
    "MEDIA_KINDS",
    "text_token_sum",
    "media_count",
    "media_manifest",
    "span_stats",
    "pack_interleaved",
    "media_context_pairs",
    "section_chunks",
]

# span kinds that reference an external media object.  Link spans also
# carry a media_ref (the href) but are navigation, not content — media
# membership is decided by KIND, never by media_ref presence.
MEDIA_KINDS = ("image", "video", "audio")

import itertools as _itertools

_cap_ids = _itertools.count()


def _cap_spans(docs: DataFrame, spans_col: str, max_spans: int | None,
               op_name: str) -> DataFrame:
    """Guard for the in-row O(n²) span operators: documents beyond
    ``max_spans`` spans are TRUNCATED to their first ``max_spans`` spans
    (document order), so one pathological 10^5-span page costs a bounded
    10^10-op row ceiling instead of stalling an executor.  The cap is
    surfaced, not silent: an ``observe`` metric
    ``n_truncated_docs`` (named ``<op>_span_cap_<n>``) counts affected
    documents on whatever action materializes the query — visible in the
    Spark UI / QueryExecution metrics.  ``max_spans=None`` disables."""
    if max_spans is None:
        return docs
    over = F.size(F.col(spans_col)) > max_spans
    return docs.observe(
        f"{op_name}_span_cap_{next(_cap_ids)}",
        F.sum(over.cast("long")).alias("n_truncated_docs"),
    ).withColumn(
        spans_col,
        F.when(over, F.slice(F.col(spans_col), 1, max_spans))
        .otherwise(F.col(spans_col)),
    )


def _is_media(s: Column) -> Column:
    return s["kind"].isin(*MEDIA_KINDS)


def _is_text(s: Column) -> Column:
    return (s["kind"] != "link") & ~_is_media(s) & s["text"].isNotNull()


def text_token_sum(spans: Column) -> Column:
    """Total whitespace tokens across a row's text spans (heading,
    paragraph, code — never link anchors or media).  One in-row fold over
    a bounded array; stays in the scan stage."""
    return F.aggregate(
        F.filter(spans, _is_text),
        F.lit(0).cast("long"),
        lambda acc, s: acc + token_count(s["text"]),
    )


def media_count(spans: Column) -> Column:
    return F.size(F.filter(spans, _is_media)).cast("long")


def media_manifest(
    docs: DataFrame,
    url_col: str = "url",
    spans_col: str = "spans",
    kinds: tuple[str, ...] = MEDIA_KINDS,
) -> DataFrame:
    """Distinct media references across the corpus: ``(media_ref, kind,
    n_refs, first_url)``.

    This is the fetch list for the media stage of a multimodal crawl —
    dedup BEFORE fetch, so an image embedded by 10^6 pages downloads
    once.  ``first_url`` (min citing URL) gives each ref a deterministic
    provenance anchor.  Plan: explode only media spans (the filter runs
    inside the scan projection), then one hash aggregate on
    ``(media_ref, kind)`` with map-side partial counts — per-ref fan-in
    skew is absorbed by the partial agg, not a shuffle of every citation.
    """
    kind_set = list(kinds)
    exploded = docs.select(
        F.col(url_col).alias("__url"),
        F.explode(
            F.filter(
                F.col(spans_col),
                lambda s: s["kind"].isin(*kind_set) & s["media_ref"].isNotNull(),
            )
        ).alias("s"),
    )
    return (
        exploded.select(
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
            F.col("__url").alias("url"),
        )
        .groupBy("media_ref", "kind")
        .agg(
            F.count("*").cast("long").alias("n_refs"),
            F.min("url").alias("first_url"),
        )
    )


def span_stats(
    docs: DataFrame,
    url_col: str = "url",
    spans_col: str = "spans",
) -> DataFrame:
    """Per-document interleaving statistics: ``(url, n_spans,
    n_text_spans, n_media_spans, n_link_spans, n_text_tokens,
    media_per_100_tokens)``.

    The last column is the media-density gate signal (images per 100 text
    tokens, rounded to 6 places) — vision-language curation drops pages
    that are all chrome and no prose.  Pure scan-side projection: every
    column is an in-row fold/size over the span array; no Exchange, no
    aggregate, no Python.
    """
    spans = F.col(spans_col)
    n_media = media_count(spans)
    n_text_tokens = text_token_sum(spans)
    return docs.select(
        F.col(url_col).alias("url"),
        F.size(spans).cast("long").alias("n_spans"),
        F.size(F.filter(spans, _is_text)).cast("long").alias("n_text_spans"),
        n_media.alias("n_media_spans"),
        F.size(F.filter(spans, lambda s: s["kind"] == "link"))
        .cast("long")
        .alias("n_link_spans"),
        n_text_tokens.alias("n_text_tokens"),
        F.round(
            n_media * 100 / F.greatest(n_text_tokens, F.lit(1)), 6
        ).alias("media_per_100_tokens"),
    )


def media_context_pairs(
    docs: DataFrame,
    url_col: str = "url",
    spans_col: str = "spans",
    kinds: tuple[str, ...] = MEDIA_KINDS,
    max_spans: int | None = 10_000,
) -> DataFrame:
    """Caption-candidate context for every media span: ``(url, media_ref,
    kind, context_before, context_after)`` where the contexts are the
    nearest TEXT span strictly before / after the media span in document
    order (NULL when none exists).

    This is how image-text pair corpora are mined from interleaved
    documents (the alt-text-free path): the prose adjacent to an image in
    reading order is its best caption candidate.  Link anchors and other
    media never qualify as context.

    Plan shape: everything is computed IN-ROW — for each media span a
    bounded prefix/suffix scan of the same row's span array (O(n²) per
    document over an array bounded by page size, still scan-stage work) —
    then one explode emits a row per media span.  No shuffle, no Python,
    no window; at 100 TB this is a pure map over the document scan.
    ``max_spans`` makes the O(n²) bound DELIBERATE: a pathological
    10^5-span document truncates to its first ``max_spans`` spans and the
    affected-doc count surfaces as an observed metric (see
    :func:`_cap_spans`).
    """
    docs = _cap_spans(docs, spans_col, max_spans, "media_context")
    kind_set = list(kinds)
    spans = F.col(spans_col)

    def pair(m: Column) -> Column:
        before = F.filter(
            spans, lambda s: _is_text(s) & (s["offset"] < m["offset"])
        )
        after = F.filter(
            spans, lambda s: _is_text(s) & (s["offset"] > m["offset"])
        )
        return F.struct(
            m["media_ref"].alias("media_ref"),
            m["kind"].alias("kind"),
            F.get(before, F.size(before) - 1)["text"].alias("context_before"),
            F.get(after, 0)["text"].alias("context_after"),
        )

    pairs = F.transform(
        F.filter(
            spans,
            lambda s: s["kind"].isin(*kind_set) & s["media_ref"].isNotNull(),
        ),
        pair,
    )
    return docs.select(
        F.col(url_col).alias("url"), F.explode(pairs).alias("p")
    ).select(
        "url",
        F.col("p.media_ref").alias("media_ref"),
        F.col("p.kind").alias("kind"),
        F.col("p.context_before").alias("context_before"),
        F.col("p.context_after").alias("context_after"),
    )


def section_chunks(
    docs: DataFrame,
    id_col: str = "url",
    spans_col: str = "spans",
    heading_prefix: str = "heading",
    max_spans: int | None = 10_000,
) -> DataFrame:
    """Split every interleaved document into heading-delimited sections —
    the chunking grain of RAG indexing and SFT example construction:
    ``(id, section_id, heading, n_spans, text)``.

    A section is a heading span plus everything up to (not including) the
    next heading; spans before the first heading form section 0 with a
    NULL heading (no row is emitted for an empty preamble).  ``text`` is
    the newline-join of the section's text spans (heading line included —
    the same text-span membership as ``span_stats``); media and link
    spans count in ``n_spans`` but never contribute text.

    Plan shape: section ids are per-span prefix heading-counts computed
    IN-ROW (bounded O(n²) array scans inside the document scan, like
    ``media_context_pairs``), sections are folded in-row, and one explode
    emits a row per section.  No shuffle, no window partitioned by
    document — the classic ``COUNT() OVER (PARTITION BY doc)`` form would
    shuffle the whole corpus; this never leaves the scan stage.
    ``max_spans`` bounds the quadratic term exactly as in
    :func:`media_context_pairs` (truncate + observed count).
    """
    docs = _cap_spans(docs, spans_col, max_spans, "section_chunks")
    spans = F.col(spans_col)

    def is_heading(s: Column) -> Column:
        return s["kind"].startswith(heading_prefix)

    # per-span section id: headings counted over the prefix INCLUDING the
    # span itself, so a heading starts its own section
    tagged = F.transform(
        spans,
        lambda s, i: F.struct(
            s.alias("s"),
            F.size(F.filter(F.slice(spans, 1, i + 1), is_heading)).alias(
                "sec"
            ),
        ),
    )
    sections = F.transform(
        F.array_distinct(F.transform(tagged, lambda t: t["sec"])),
        lambda sec: F.struct(
            sec.cast("long").alias("section_id"),
            F.get(
                F.filter(
                    tagged,
                    lambda t: (t["sec"] == sec) & is_heading(t["s"]),
                ),
                0,
            )["s"]["text"].alias("heading"),
            F.size(F.filter(tagged, lambda t: t["sec"] == sec))
            .cast("long")
            .alias("n_spans"),
            F.array_join(
                F.transform(
                    F.filter(
                        tagged,
                        lambda t: (t["sec"] == sec) & _is_text(t["s"]),
                    ),
                    lambda t: t["s"]["text"],
                ),
                "\n",
            ).alias("text"),
        ),
    )
    return docs.select(
        F.col(id_col).alias(id_col), F.explode(sections).alias("c")
    ).select(
        id_col,
        F.col("c.section_id").alias("section_id"),
        F.col("c.heading").alias("heading"),
        F.col("c.n_spans").alias("n_spans"),
        F.col("c.text").alias("text"),
    )


def pack_interleaved(
    docs: DataFrame,
    budget: int,
    media_cost: int = 256,
    url_col: str = "url",
    spans_col: str = "spans",
    approx_rows: int | None = None,
) -> DataFrame:
    """Multimodal token-budget shard packing.

    A vision-LM consumes an interleaved document as text tokens plus a
    fixed ``media_cost``-token patch block per media span, so the
    sequence-packing cost of a document is ``n_text_tokens + media_cost *
    n_media`` — packing on text length alone would overflow every shard
    containing images.  Same shard-assignment semantics as
    packing.pack_shards (a document belongs to the shard its FIRST token
    lands in), same two-phase distributed prefix sum on the scale path.

    Returns ``(url, n_text_tokens, n_media, cost, shard_id,
    shard_offset)`` in ``url`` order.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if media_cost < 0:
        raise ValueError(f"media_cost must be >= 0, got {media_cost}")
    spans = F.col(spans_col)
    weighted = docs.select(
        F.col(url_col).alias("url"),
        text_token_sum(spans).alias("n_text_tokens"),
        media_count(spans).alias("n_media"),
        (text_token_sum(spans) + F.lit(media_cost) * media_count(spans))
        .cast("long")
        .alias("cost"),
    )
    summed = with_running_total(
        weighted, "cost", ["url"], approx_rows=approx_rows
    )
    start = F.col("running_total") - F.col("cost")  # exclusive prefix
    return summed.select(
        "url",
        "n_text_tokens",
        "n_media",
        "cost",
        F.floor(start / budget).cast("long").alias("shard_id"),
        (start % budget).cast("long").alias("shard_offset"),
    )
