"""Crawl-health operators: soft-404 detection and crawl-trap (URL-template
explosion) detection.

Two frontier-protection signals every production crawler runs that the
reference cannot express (it stores pages one at a time in SQLite and has
no corpus-wide view; cf. reference crawler_to_md/database_manager.py —
per-row upserts, no aggregation surface):

**Soft-404s** — hosts that answer HTTP 200 with the same "not found" /
placeholder body for vast swaths of URLs.  Status-code gates (S4,
operators/crawl.py) cannot catch them; the signal is corpus-level: one
content digest owning an outsized share of a host's OK pages.  The
detector is two partial-aggregated shuffles — (host, digest) counts, then
per-host totals — and an integer share test (``n·den ≥ num·total``; no
float division, bit-stable across engines and partitionings).  At
10^8-host web scale both aggregations partial-agg map-side and the
totals join degrades gracefully from AQE broadcast to shuffled join.

**Crawl traps** — calendar pages, session-id permutations, faceted search:
URL families where a template ("/cal/day?date=N") explodes into unbounded
distinct URLs.  The frontier must cap these before they drown the dequeue.
The detector canonicalizes every URL to its template (digit runs → ``N``,
query values → ``*``) with native regexp (codegen'd, no Python), takes
DISTINCT urls (near-unique keys — uniform shuffle), and counts per
(host, template) with map-side combine; hosts/templates over the
threshold are trap candidates the scheduler can exclude with one
left-anti join (``drop_trap_urls``).

Both reports are pure relational plans — no UDFs, no windows, no
driver-side state — so they run unchanged at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a digest must own at least this many OK pages AND at least num/den of
# the host's OK pages to be called a soft-404 template
SOFT404_MIN_PAGES = 3
SOFT404_SHARE = (1, 2)  # num, den: half the host's pages

# distinct URLs a single (host, template) family may reach before it is
# flagged as a trap
TRAP_MIN_URLS = 50


def soft404_report(
    pages: DataFrame,
    min_pages: int = SOFT404_MIN_PAGES,
    share_num: int = SOFT404_SHARE[0],
    share_den: int = SOFT404_SHARE[1],
) -> DataFrame:
    """Per-(host, digest) soft-404 candidates over OK pages.

    ``pages`` needs columns ``host``, ``url``, ``text`` (the extracted
    body; callers pass markdown or raw text — the digest only needs to be
    consistent).  Returns ``(host, digest, n_pages, host_pages)`` for
    every digest that clears BOTH the absolute floor (``min_pages``) and
    the integer share test ``n_pages * share_den >= share_num *
    host_pages``.  The share test is exact integer arithmetic — no float
    ratio — so the flagged set is identical across engines and
    partitionings.
    """
    digests = pages.select(
        "host", "url", F.md5(F.col("text")).alias("digest")
    )
    per = digests.groupBy("host", "digest").agg(
        F.count("*").cast("long").alias("n_pages")
    )
    totals = per.groupBy("host").agg(
        F.sum("n_pages").cast("long").alias("host_pages")
    )
    joined = per.join(totals, "host")
    return joined.filter(
        (F.col("n_pages") >= F.lit(min_pages))
        & (F.col("n_pages") * F.lit(share_den)
           >= F.lit(share_num) * F.col("host_pages"))
    ).select("host", "digest", "n_pages", "host_pages")


def soft404_urls(
    pages: DataFrame,
    min_pages: int = SOFT404_MIN_PAGES,
    share_num: int = SOFT404_SHARE[0],
    share_den: int = SOFT404_SHARE[1],
) -> DataFrame:
    """The URLs covered by :func:`soft404_report` — the rows a cleaning
    pass drops.  Left-semi join against the (host, digest) report, so the
    page table streams through once."""
    report = soft404_report(pages, min_pages, share_num, share_den)
    digests = pages.withColumn("digest", F.md5(F.col("text")))
    return digests.join(
        report.select("host", "digest"), ["host", "digest"], "left_semi"
    ).select("host", "url", "digest")


def drop_soft404(
    pages: DataFrame,
    min_pages: int = SOFT404_MIN_PAGES,
    share_num: int = SOFT404_SHARE[0],
    share_den: int = SOFT404_SHARE[1],
) -> DataFrame:
    """The cleaning-pass complement of :func:`soft404_urls`: remove every
    page whose (host, digest) family was flagged, keeping all input
    columns.  Left-anti join on the small flagged set (AQE broadcasts it
    until it outgrows the threshold)."""
    report = soft404_report(pages, min_pages, share_num, share_den)
    with_d = pages.withColumn("__s4_digest", F.md5(F.col("text")))
    return with_d.join(
        report.select("host", F.col("digest").alias("__s4_digest")),
        ["host", "__s4_digest"], "left_anti",
    ).drop("__s4_digest")


def url_template(url: Column) -> Column:
    """Collapse a URL to its trap-detection template: every digit run
    becomes ``N``; every query/fragment value after ``=`` becomes ``*``.
    Pure native regexp (Java and RE2 agree on both patterns)."""
    t = F.regexp_replace(url, "[0-9]+", "N")
    return F.regexp_replace(t, "=[^&#]*", "=*")


def trap_report(
    urls: DataFrame, min_urls: int = TRAP_MIN_URLS
) -> DataFrame:
    """Per-(host, template) URL-family sizes over the threshold.

    ``urls`` needs columns ``host``, ``url``.  Distinct-URL first (the
    frontier can present the same URL many times), then one
    partial-aggregated count per (host, template).  Returns
    ``(host, template, n_urls)`` for families with ``n_urls >=
    min_urls`` — the families a web-scale frontier caps or excludes.
    """
    distinct = urls.select("host", "url").distinct()
    fam = distinct.select(
        "host", url_template(F.col("url")).alias("template")
    )
    counts = fam.groupBy("host", "template").agg(
        F.count("*").cast("long").alias("n_urls")
    )
    return counts.filter(F.col("n_urls") >= F.lit(min_urls))


def drop_trap_urls(
    urls: DataFrame, min_urls: int = TRAP_MIN_URLS
) -> DataFrame:
    """Remove every URL belonging to a flagged trap family — the
    scheduler-side exclusion pass (left-anti join on the small flagged
    set; AQE broadcasts it until it outgrows the threshold)."""
    traps = trap_report(urls, min_urls).select("host", "template")
    with_t = urls.withColumn("template", url_template(F.col("url")))
    return with_t.join(
        traps, ["host", "template"], "left_anti"
    ).drop("template")


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def duck_soft404_sql(
    pages_rel: str,
    min_pages: int = SOFT404_MIN_PAGES,
    share_num: int = SOFT404_SHARE[0],
    share_den: int = SOFT404_SHARE[1],
    prelude_ctes: str = "",
) -> str:
    """The readable GROUP BY / HAVING twin of :func:`soft404_report`."""
    with_clause = f"WITH {prelude_ctes}," if prelude_ctes else "WITH"
    return f"""
        {with_clause}
        per AS (
            SELECT host, md5(text) AS digest,
                   CAST(count(*) AS BIGINT) AS n_pages
            FROM {pages_rel}
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT host, CAST(sum(n_pages) AS BIGINT) AS host_pages
            FROM per GROUP BY 1
        )
        SELECT p.host, p.digest, p.n_pages, t.host_pages
        FROM per p JOIN tot t ON p.host = t.host
        WHERE p.n_pages >= {min_pages}
          AND p.n_pages * {share_den} >= {share_num} * t.host_pages
    """


def duck_trap_sql(
    urls_rel: str, min_urls: int = TRAP_MIN_URLS, prelude_ctes: str = ""
) -> str:
    """GROUP BY twin of :func:`trap_report` (DuckDB regexp_replace needs
    the explicit 'g' flag to match Spark's replace-all semantics)."""
    with_clause = f"WITH {prelude_ctes}," if prelude_ctes else "WITH"
    return f"""
        {with_clause}
        fam AS (
            SELECT DISTINCT host, url FROM {urls_rel}
        )
        SELECT host,
               regexp_replace(regexp_replace(url, '[0-9]+', 'N', 'g'),
                              '=[^&#]*', '=*', 'g') AS template,
               CAST(count(*) AS BIGINT) AS n_urls
        FROM fam
        GROUP BY 1, 2
        HAVING count(*) >= {min_urls}
    """


# ---------------------------------------------------------------------------
# Mirror-host detection
# ---------------------------------------------------------------------------

#: a content digest shared by more hosts than this is boilerplate (error
#: pages, licence texts) — it certifies nothing about mirroring and would
#: make the pair join quadratic in its host count, so it is cut exactly
#: like the LSH bucket cap (operators/dedup.py)
MIRROR_MAX_HOSTS_PER_DIGEST = 20

MIRROR_MIN_SHARED = 3
MIRROR_SHARE = (1, 2)   # shared >= half the smaller host's distinct digests


def host_mirror_pairs(
    pages: DataFrame,
    min_shared: int = MIRROR_MIN_SHARED,
    share_num: int = MIRROR_SHARE[0],
    share_den: int = MIRROR_SHARE[1],
    max_hosts_per_digest: int = MIRROR_MAX_HOSTS_PER_DIGEST,
) -> DataFrame:
    """Host pairs that serve largely the same content — mirror candidates.

    ``pages`` needs ``host`` and ``text``.  Distinct (host, digest) first;
    digests fanning out to more than ``max_hosts_per_digest`` hosts are
    cut (boilerplate — and the cap bounds the self-join exactly like the
    LSH bucket cap, so no digest explodes quadratically).  A pair
    qualifies when it shares ``min_shared`` digests AND the integer share
    test ``n_shared·den ≥ num·min(|A|,|B|)`` passes — covering the
    partial-mirror case where a small mirror carries a subset of a large
    origin.  Returns ``(host_a, host_b, n_shared)`` with host_a < host_b.
    """
    hd = pages.select(
        "host", F.md5(F.col("text")).alias("digest")).distinct()
    per_digest = hd.groupBy("digest").agg(
        F.count("*").alias("__n_hosts"))
    common = hd.join(
        per_digest.filter(F.col("__n_hosts") <= max_hosts_per_digest)
        .select("digest"), "digest")
    a, b = common.alias("a"), common.alias("b")
    raw_pairs = (
        a.join(b, "digest")
        .filter(F.col("a.host") < F.col("b.host"))
        .select(F.col("a.host").alias("host_a"),
                F.col("b.host").alias("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    sizes = hd.groupBy("host").agg(F.count("*").alias("__nd"))
    return (
        raw_pairs
        .join(sizes.select(F.col("host").alias("host_a"),
                           F.col("__nd").alias("__na")), "host_a")
        .join(sizes.select(F.col("host").alias("host_b"),
                           F.col("__nd").alias("__nb")), "host_b")
        .filter((F.col("n_shared") >= F.lit(min_shared))
                & (F.col("n_shared") * F.lit(share_den)
                   >= F.lit(share_num) * F.least("__na", "__nb")))
        .select("host_a", "host_b", "n_shared")
    )


def mirror_clusters(
    pages: DataFrame,
    min_shared: int = MIRROR_MIN_SHARED,
    share_num: int = MIRROR_SHARE[0],
    share_den: int = MIRROR_SHARE[1],
    max_hosts_per_digest: int = MIRROR_MAX_HOSTS_PER_DIGEST,
) -> DataFrame:
    """Collapse mirror pairs into clusters: (host, mirror_group) where
    ``mirror_group`` is the lexicographic min host of the connected
    component — pair lists alone can't drive crawl-budget decisions
    (A~B, B~C must yield ONE canonical origin, the near-dup collapse
    argument at host grain).  Components come from the certified
    alternating-star machinery (operators/dedup.connected_components)
    over xxhash64 node ids; the group label is re-derived as a min over
    host STRINGS so the output is engine-independent."""
    from crawler_to_md_spark.operators.dedup import connected_components

    pairs = host_mirror_pairs(
        pages, min_shared, share_num, share_den, max_hosts_per_digest)
    nodes = (
        pairs.select(F.col("host_a").alias("host"))
        .union(pairs.select(F.col("host_b")))
        .distinct()
        .withColumn("__nid", F.xxhash64("host"))
    )
    pair_ids = pairs.select(
        F.xxhash64("host_a").alias("a"), F.xxhash64("host_b").alias("b"))
    cc = connected_components(pair_ids, "a", "b")
    mapped = cc.join(nodes, cc["node"] == nodes["__nid"]).select(
        "host", "component")
    groups = mapped.groupBy("component").agg(
        F.min("host").alias("mirror_group"))
    return mapped.join(groups, "component").select("host", "mirror_group")
