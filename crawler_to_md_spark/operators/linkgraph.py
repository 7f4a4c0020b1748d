"""Link-graph analysis over the crawl corpus: host-level PageRank.

A web-scale frontier cannot treat every URL as equally urgent — crawl
schedulers order hosts by link authority so the politeness budget is spent
on the sites the rest of the web points at (the classic
crawl-prioritization signal; the reference has no analog — its frontier is
a FIFO SQLite table).  ``pagerank`` computes the power iteration over the
host graph; ``host_edges`` derives that graph from the engine's canonical
page-level edge list (resolve → canonicalize → scope-filter, the same
derivation certified by the ``corpus_edges`` oracle query).

Cross-engine determinism by construction.  Float PageRank is not
reproducible across engines (summation order changes the low bits), so all
arithmetic here is INTEGER: ranks live in micro-units (``unit`` per node
at iteration 0), each node distributes ``rank div outdeg`` to every
out-neighbor, and the damping update is

    rank' = (unit * (den - num)) div den  +  (num * incoming) div den

with the default ``num/den = 4/5`` (damping 0.8).  Integer sums are
associative-exact, so the result is bit-identical for ANY partitioning,
any engine — the DuckDB oracle unrolls the same recurrence as chained
CTEs.  Overflow bound: total circulating mass never exceeds
``n_nodes * unit`` (the update is a convex combination), so pick ``unit``
such that ``num * n_nodes * unit < 2**63`` — at 10^8 hosts the default
``unit=10**9`` leaves 18 bits of headroom.

Scale shape (the part that must survive 100 TB):

- The edge list is joined every iteration, so it is hash-repartitioned on
  ``src`` ONCE and persisted; subsequent per-iteration joins reuse that
  layout (Spark sees the persisted ``outputPartitioning`` satisfies the
  join distribution) and only the (node, rank) side — one long per node —
  shuffles.
- Per-iteration work is one join + one partial-aggregated ``groupBy(dst)``
  (hot authorities absorb their fan-in in map-side combine) + one left
  join back to the node list.  Nothing driver-side: no ``collect`` in the
  loop at all for fixed ``iterations``.
- Lineage is truncated by an eager ``localCheckpoint`` every
  ``checkpoint_every`` iterations (the connected-components pattern,
  operators/dedup.py) so the plan does not grow with iteration count.
- Dangling hosts (no out-links) keep receiving the teleport term and
  their in-flow; the mass they would re-distribute leaks, which biases
  absolute values slightly but preserves ordering — the standard
  simplification, and it keeps both engines exactly aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.functions.urlkit import url_host

__all__ = ["anchor_text_index", "doc_edges", "host_edges", "pagerank",
           "pagerank_base", "rank_to_priority"]


def pagerank_base(unit: int, damp_num: int, damp_den: int) -> int:
    """The teleport term ``(unit * (den - num)) div den`` — exposed so
    tests and the SQL oracle share one definition."""
    return (unit * (damp_den - damp_num)) // damp_den


def doc_edges(
    docs: DataFrame,
    url_col: str = "url",
    spans_col: str = "spans",
) -> DataFrame:
    """Page-level edge list ``(src_url, dst_url)`` from crawled documents'
    link spans: each href resolved against its page URL, canonicalized,
    http(s)-only, distinct — the same resolve→canonicalize derivation the
    scheduler runs per wave, here corpus-wide for graph analysis."""
    from crawler_to_md_spark.functions import urlkit

    return (
        docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.filter(
                    F.col(spans_col), lambda s: s["kind"] == F.lit("link")
                )
            ).alias("s"),
        )
        .select(
            "src_url",
            urlkit.canonicalize(
                urlkit.resolve_href(F.col("src_url"), F.col("s.media_ref"))
            ).alias("dst_url"),
        )
        .filter(
            F.col("dst_url").isNotNull()
            & urlkit.is_supported_scheme(F.col("dst_url"))
        )
        .distinct()
    )


def host_edges(
    edges: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Collapse a page-level edge list to the distinct host graph
    ``(src, dst)``, self-loops dropped (intra-host navigation is not an
    authority signal).  One distinct shuffle on the host pair; at web
    scale this is the 10^10-edge → 10^8-node compression step that makes
    the iteration cheap."""
    return (
        edges.select(
            url_host(F.col(src_col)).alias("src"),
            url_host(F.col(dst_col)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    unit: int = 10**12,
    damp_num: int = 4,
    damp_den: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Integer power iteration over ``edges``; returns ``(node, rank)``
    with ``rank`` in micro-units (BIGINT).  See module docstring for the
    exact recurrence and determinism/overflow contract."""
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not (0 < damp_num < damp_den):
        raise ValueError(f"need 0 < damp_num < damp_den, got {damp_num}/{damp_den}")
    src, dst = F.col(src_col), F.col(dst_col)
    nodes = (
        edges.select(src.alias("node"))
        .union(edges.select(dst.alias("node")))
        .distinct()
        .persist()
    )
    deg = edges.groupBy(src.alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    # repartition-by-src once, persist: every iteration's join reuses this
    # layout, so only the (node, rank) side moves per round
    edges_deg = (
        edges.select(src.alias("__src"), dst.alias("__dst"))
        .join(deg.withColumnRenamed("node", "__src"), "__src")
        .repartition("__src")
        .persist()
    )
    base = pagerank_base(unit, damp_num, damp_den)
    ranks = nodes.select("node", F.lit(int(unit)).cast("long").alias("rank"))
    for i in range(iterations):
        contrib = (
            edges_deg.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank div deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__contrib"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(int(base))
                + F.expr(
                    f"({int(damp_num)} * coalesce(__contrib, CAST(0 AS BIGINT)))"
                    f" div {int(damp_den)}"
                )
            ).cast("long").alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the result and release the iteration state: without
    # this the persisted nodes/edge-layout frames outlive the call (a
    # storage leak across repeated invocations), and a lazy return would
    # re-run the last un-checkpointed rounds once per consumer
    ranks = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    edges_deg.unpersist()
    return ranks


def anchor_text_index(
    docs: DataFrame,
    k: int = 5,
    url_col: str = "url",
    spans_col: str = "spans",
    scope_domain: str | None = None,
    salt_shards: int = 8,
) -> DataFrame:
    """Per-target anchor-text index: ``(url, anchor, n_refs)`` — for every
    link target, its ``k`` most-cited anchor texts with citation counts.

    Anchor text is how the REST of the web describes a page — the classic
    relevance signal (used for query-document training pairs and retrieval
    labels).  Citation grain is the distinct (src page, anchor, target)
    triple, so a page repeating the same link 100× counts once, but two
    pages using the same words count twice.

    Scale shape: explode link spans → resolve+canonicalize (the
    scheduler's own derivation) → distinct triples (uniform shuffle: the
    triple is near-unique) → partial-aggregated count per (target, anchor)
    → top-``k`` per target via the SALTED two-phase window
    (politeness_cap's certified pattern — a hot target cited by 10^8 pages
    with 10^6 distinct anchors never funnels through one task; each salt
    shard keeps its own top-``k``, the survivors window is ≤
    ``salt_shards*k`` rows per target).  Ordering (n_refs DESC, anchor)
    is total, so the result is deterministic."""
    from crawler_to_md_spark.functions import urlkit

    links = (
        docs.select(
            F.col(url_col).alias("src_url"),
            F.explode(
                F.filter(
                    F.col(spans_col), lambda s: s["kind"] == F.lit("link")
                )
            ).alias("s"),
        )
        .select(
            "src_url",
            F.col("s.text").alias("anchor"),
            urlkit.canonicalize(
                urlkit.resolve_href(F.col("src_url"), F.col("s.media_ref"))
            ).alias("url"),
        )
        .filter(
            F.col("url").isNotNull()
            & F.col("anchor").isNotNull()
            & urlkit.is_supported_scheme(F.col("url"))
        )
    )
    if scope_domain:
        links = links.filter(urlkit.in_scope_domain(F.col("url"),
                                                    scope_domain))
    counts = (
        links.distinct()
        .groupBy("url", "anchor")
        .agg(F.count("*").cast("long").alias("n_refs"))
    )
    from pyspark.sql import Window

    order = [F.col("n_refs").desc(), F.col("anchor")]
    salted = counts.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col("anchor")), F.lit(salt_shards)).cast("int"),
    )
    w1 = Window.partitionBy("url", "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1")
    )
    w2 = Window.partitionBy("url").orderBy(*order)
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= k)
        .drop("__r2", "__salt")
    )


def rank_to_priority(ranks: DataFrame) -> DataFrame:
    """Turn ``pagerank`` output into the frontier's dequeue-priority table
    ``(host, priority)``: higher authority → lower priority value →
    dequeued first (install with ``CrawlEngine.set_host_priority``).
    Negation keeps the integer exactness — no float rescaling."""
    return ranks.select(
        F.col("node").alias("host"),
        (-F.col("rank")).cast("long").alias("priority"),
    )


def python_pagerank(
    edges: list[tuple[str, str]],
    iterations: int = 3,
    unit: int = 10**12,
    damp_num: int = 4,
    damp_den: int = 5,
) -> dict[str, int]:
    """Driver-side reference implementation of the SAME integer recurrence
    (tests compare the distributed operator against it exactly)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    out: dict[str, list[str]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    base = pagerank_base(unit, damp_num, damp_den)
    rank = {n: unit for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, dsts in out.items():
            share = rank[s] // len(dsts)
            for d in dsts:
                incoming[d] += share
        rank = {n: base + (damp_num * incoming[n]) // damp_den for n in nodes}
    return rank
