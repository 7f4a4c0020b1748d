"""URL scheduling: raw hrefs -> validated, deduped, unseen frontier rows.

This is the frontier's hot path — the operator the BASELINE throughput
metric measures ("URLs scheduled+deduped/sec").  One declarative chain:

    (page_url, href, parent_depth)
      -> resolve relative reference        [F2, native; dot-segments via
                                            vectorized UDF branch]
      -> canonicalize                      [F1, native codegen]
      -> validate scheme/scope/patterns    [P1-P5, native]
      -> robots gate                       [broadcast join]
      -> per-batch dedup + min parent depth [A4; one shuffle on url]
      -> bloom prefilter                   [Arrow UDF over broadcast shards]
      -> exact anti-join vs seen set       [J2; only bloom-positives shuffle]

Everything except the two declared vectorized UDFs (dot-segment urljoin,
bloom membership) runs inside whole-stage codegen.  The only full-width
shuffles are the dedup groupBy (keyed by url — uniform, no skew: URLs hash
evenly even when hosts don't) and the anti-join, whose probe side the bloom
prefilter cuts to the tiny maybe-seen fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import urlkit
from crawler_to_md_spark.functions.bloom import BloomShards
from crawler_to_md_spark.operators.politeness import robots_filter


def resolve_candidates(raw: DataFrame, assume_no_dot_segments: bool = False
                       ) -> DataFrame:
    """Resolve ``href`` against ``page_url``.  Common shapes resolve
    natively; dot-segment hrefs take the vectorized-urljoin branch.  The
    router predicate is :func:`urlkit.has_dot_segment` — the SAME guard
    the native resolver NULLs on, so no href can fall between the two
    paths and be silently dropped.

    ``assume_no_dot_segments`` skips the UDF branch entirely (pure JVM
    plan) when the caller knows hrefs are dot-free — e.g. the synthetic
    corpus; a real-HTML deployment leaves it False."""
    if assume_no_dot_segments:
        return urlkit.with_resolved_href(raw, "page_url", "href")
    dotty = urlkit.has_dot_segment(F.trim(F.col("href")))
    return urlkit.with_resolved_href(
        raw.filter(~dotty), "page_url", "href"
    ).unionByName(
        raw.filter(dotty).withColumn(
            "resolved", urlkit.resolve_href_udf(F.col("page_url"), F.col("href"))
        )
    )


def validate_candidates(
    resolved: DataFrame,
    scope_base_url: str | None = None,
    scope_domain: str | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    robots: DataFrame | None = None,
    robots_n_hosts: int | None = None,
) -> DataFrame:
    """Canonicalize + P1-P5 validation + robots gate (``robots_n_hosts``
    is the gate's broadcast-vs-shuffle hint, see politeness.robots_filter)."""
    canon = urlkit.with_canonical_url(resolved, "resolved", "url")
    # This filter MUST evaluate here, above the staged url projection —
    # if the optimizer's PushDownPredicates rule were active it would
    # substitute it down through the projections, DAG-unfolding the whole
    # resolve+canonicalize chain into one giant predicate (observed: 29 MB
    # of generated Java -> Janino 64 KB method limit -> interpreted hot
    # path).  The engine session excludes that rule (see session.py);
    # filters in this codebase are hand-placed where they should run.
    valid = canon.filter(
        urlkit.is_valid_link(
            F.col("url"),
            base_url=scope_base_url,
            domain_suffix=scope_domain,
            include_patterns=include_patterns or [],
            exclude_patterns=exclude_patterns or [],
        )
    )
    return robots_filter(
        valid.withColumn("host", urlkit.url_host(F.col("url"))),
        robots, robots_n_hosts,
    )


def dedup_candidates(valid: DataFrame) -> DataFrame:
    """Per-batch dedup (A4) with first-discovery depth = min parent + 1."""
    return (
        valid.groupBy("url", "host")
        .agg((F.min("parent_depth") + 1).cast("int").alias("depth"))
        .withColumn("url_hash", urlkit.url_hash(F.col("url")))
    )


MAYBE_COL = "__maybe"


def with_bloom_flag(
    cand: DataFrame, bloom: BloomShards | None
) -> DataFrame:
    """Stamp the bloom membership verdict as a column (``MAYBE_COL``).

    Callers persist the result ONCE and both downstream consumers (the
    sure-new branch and the suspect anti-join) read the cached boolean —
    round 1 evaluated the Arrow UDF twice, one full pass per branch."""
    if bloom is None:
        return cand
    maybe = bloom.might_contain_udf(cand.sparkSession)
    return cand.withColumn(MAYBE_COL, maybe(F.col("url_hash")))


# Below this many seen rows the anti-join build side is broadcast (~40 MB
# of (hash, url) pairs at 1M rows) — no shuffle of either side.  Above it,
# the bloom-prefiltered shuffled anti-join is the scale path (a 10^10-row
# frontier can never broadcast).
BROADCAST_SEEN_MAX = 2_000_000


UNSEEN_COL = "__unseen"


def flag_unseen(
    cand: DataFrame, seen: DataFrame, bloom: BloomShards | None = None,
    seen_count: int | None = None,
) -> DataFrame:
    """Like :func:`filter_unseen` but stamps the verdict as ``UNSEEN_COL``
    instead of filtering, so ONE pass over a persisted candidate frame
    serves the discovered-count metric (A4), the insert count (A3), and the
    insert rows — the wave loop previously ran three separate jobs for
    those.

    While the seen set is broadcast-small the verdict is a SINGLE left join
    probing the broadcast hash table — no bloom branch, no union: the
    candidate pipeline underneath evaluates exactly once, so the caller can
    observe+checkpoint the flagged frame in one job without first
    materializing the candidates.  Above the broadcast bound the
    bloom-prefiltered branch form takes over (only bloom-positives reach
    the shuffled exact join), identical to :func:`filter_unseen`."""
    seen_keys = seen.select("url_hash", "url").withColumn("__hit", F.lit(True))
    if seen_count is not None and seen_count <= BROADCAST_SEEN_MAX:
        if MAYBE_COL in cand.columns:
            cand = cand.drop(MAYBE_COL)
        return (
            cand.join(F.broadcast(seen_keys), ["url_hash", "url"], "left")
            .withColumn(UNSEEN_COL, F.col("__hit").isNull())
            .drop("__hit")
        )
    if bloom is None and MAYBE_COL not in cand.columns:
        return (
            cand.join(seen_keys, ["url_hash", "url"], "left")
            .withColumn(UNSEEN_COL, F.col("__hit").isNull())
            .drop("__hit")
        )
    if MAYBE_COL not in cand.columns:
        cand = with_bloom_flag(cand, bloom)
    sure_new = cand.filter(~F.col(MAYBE_COL)).drop(MAYBE_COL).withColumn(
        UNSEEN_COL, F.lit(True)
    )
    suspects = (
        cand.filter(F.col(MAYBE_COL)).drop(MAYBE_COL)
        .join(seen_keys, ["url_hash", "url"], "left")
        .withColumn(UNSEEN_COL, F.col("__hit").isNull())
        .drop("__hit")
    )
    return sure_new.unionByName(suspects.select(*sure_new.columns))


def filter_unseen(
    cand: DataFrame, seen: DataFrame, bloom: BloomShards | None = None,
    seen_count: int | None = None,
) -> DataFrame:
    """J2: keep candidates absent from the seen set.

    With bloom shards, only bloom-positive candidates (true dupes + the
    tiny FP fraction) reach the exact anti-join; bloom-negatives are new by
    construction, so a false positive can only cost a redundant check —
    never drop a URL.  If ``cand`` already carries ``MAYBE_COL`` (from
    :func:`with_bloom_flag`, ideally persisted), the flag is reused;
    otherwise it is computed inline.

    ``seen_count`` is a join-strategy hint the crawl engine supplies from
    its lineage counters (A1): while the frontier is small the exact
    anti-join broadcasts the seen keys instead of shuffling the candidate
    side (AQE can only make that call after materializing the shuffle).
    """
    seen_keys = seen.select("url_hash", "url")
    if seen_count is not None and seen_count <= BROADCAST_SEEN_MAX:
        seen_keys = F.broadcast(seen_keys)
    if bloom is None and MAYBE_COL not in cand.columns:
        return cand.join(seen_keys, ["url_hash", "url"], "left_anti")
    if MAYBE_COL not in cand.columns:
        cand = with_bloom_flag(cand, bloom)
    sure_new = cand.filter(~F.col(MAYBE_COL)).drop(MAYBE_COL)
    suspects = (
        cand.filter(F.col(MAYBE_COL)).drop(MAYBE_COL)
        .join(seen_keys, ["url_hash", "url"], "left_anti")
    )
    return sure_new.unionByName(suspects)


def schedule_candidates(
    raw: DataFrame,
    seen: DataFrame,
    bloom: BloomShards | None = None,
    scope_base_url: str | None = None,
    scope_domain: str | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
    robots: DataFrame | None = None,
    seen_count: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full chain.  ``raw`` needs (page_url, href, parent_depth); returns
    (all deduped candidates [persisted by caller], unseen subset).  The
    candidate frame carries the bloom verdict column so one persist covers
    both the metrics count and both unseen branches."""
    resolved = resolve_candidates(raw)
    valid = validate_candidates(
        resolved, scope_base_url, scope_domain,
        include_patterns, exclude_patterns, robots,
    )
    cand = with_bloom_flag(dedup_candidates(valid), bloom)
    return cand, filter_unseen(cand, seen, bloom, seen_count=seen_count)
