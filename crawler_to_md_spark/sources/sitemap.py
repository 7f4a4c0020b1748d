"""Sitemap seed source: sitemap.xml / sitemap-index → ordered seed frame.

Complements the seed-file source (sources/seeds.py): a crawl of a site that
publishes a sitemap seeds from ``<urlset>`` locs instead of a hand-written
URL list.  Parsing is deliberately namespace-agnostic (``<loc>`` extraction
with entity unescape) — real-world sitemaps disagree about the xmlns while
agreeing about ``<loc>``, and the downstream seed path re-validates every
URL anyway (CrawlEngine.seed: canonicalize → P1-P5 → order-dedup).

Scale shape: sitemap files are capped at 50k URLs by the protocol, so one
file parses comfortably inside one task; a sitemap INDEX fans out to many
files — ``expand_sitemap_index`` returns the child URLs so the caller can
fetch them as a distributed stage (one task per child sitemap), then union
the resulting seed frames.  Order is preserved per file via ``posexplode``
and across files via the file's position in the index.
"""

from __future__ import annotations

import re
from xml.sax.saxutils import unescape

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LOC = re.compile(r"<loc\s*>\s*(.*?)\s*</loc\s*>", re.IGNORECASE | re.DOTALL)
_CDATA = re.compile(r"^<!\[CDATA\[(.*)\]\]>$", re.DOTALL)


def parse_sitemap_locs(xml: str) -> list[str]:
    """All ``<loc>`` values of a sitemap (or sitemap-index) document, in
    document order, entity-unescaped, CDATA-unwrapped."""
    out = []
    for m in _LOC.finditer(xml or ""):
        loc = m.group(1).strip()
        cd = _CDATA.match(loc)
        if cd:
            loc = cd.group(1).strip()
        out.append(unescape(loc))
    return out


def is_sitemap_index(xml: str) -> bool:
    return "<sitemapindex" in (xml or "").lower()


def sitemap_seed_frame(docs: DataFrame, xml_col: str = "xml",
                       order_col: str = "file_seq") -> DataFrame:
    """``(seed_seq, raw)`` seed rows from fetched sitemap documents.

    ``docs`` holds one row per sitemap file: ``(file_seq long, xml string)``
    — file_seq is the file's position (0 for a single sitemap; the index
    position when expanded from a sitemap index).  seed_seq interleaves
    (file_seq, position-in-file) so the global order matches a sequential
    read of the index, exactly what CrawlEngine.seed's first-occurrence
    dedup expects.  The parse is an Arrow-batched pandas UDF (the repo's
    UDF discipline, SURVEY §7): a web-scale sitemap-INDEX expansion makes
    file rows the data — 50k-URL files amortize the call, but the per-row
    bridge must still be vectorized, never row-at-a-time ``F.udf``.
    """
    parse = F.pandas_udf(
        lambda s: s.map(parse_sitemap_locs), "array<string>")
    return (
        docs.select(F.col(order_col).cast("long").alias("__f"),
                    parse(F.col(xml_col)).alias("__locs"))
        .select("__f", F.posexplode("__locs").alias("__p", "raw"))
        # protocol caps a sitemap at 50k URLs; 2^20 leaves headroom while
        # keeping seed_seq monotone across (file, position)
        .select((F.col("__f") * (1 << 20) + F.col("__p")).alias("seed_seq"),
                "raw")
    )


def expand_sitemap_index(xml: str) -> list[str]:
    """Child sitemap URLs of an index document (empty if not an index)."""
    return parse_sitemap_locs(xml) if is_sitemap_index(xml) else []


def fetch_sitemap_frames(
    urls: DataFrame,
    transport_factory,
    policy=None,
    url_col: str = "url",
    seq_col: str = "file_seq",
    scheme_timeout: float | None = None,
) -> DataFrame:
    """Distributed sitemap-file fetch: ``(file_seq, url)`` ->
    ``(file_seq, xml)``, one pooled transport session per task (the
    robots/fetch transport contract).  Unreachable or non-200 files
    produce no row — a missing sitemap is an empty seed contribution, not
    an error.  One task fetches many files; a 10^5-file sitemap-index
    expansion fans out across executors."""
    from typing import Iterable, Iterator

    import pandas as pd

    from crawler_to_md_spark.sources.fetch import FetchPolicy

    pol = policy or FetchPolicy()

    def run(batches: "Iterable[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        transport = transport_factory()
        for pdf in batches:
            seqs: list[int] = []
            xmls: list[str] = []
            for seq, url in zip(pdf[seq_col], pdf[url_col]):
                try:
                    status, _ct, body, err = transport(
                        str(url), pol.timeout, pol.proxy, True)
                except Exception:
                    continue
                if err is None and status == 200 and body is not None:
                    text = (body.decode("utf-8", errors="replace")
                            if isinstance(body, (bytes, bytearray))
                            else str(body))
                    seqs.append(int(seq))
                    xmls.append(text)
            yield pd.DataFrame({
                "file_seq": pd.Series(seqs, dtype="int64"),
                "xml": pd.Series(xmls, dtype="object"),
            })

    return urls.select(
        F.col(seq_col).cast("long").alias(seq_col), F.col(url_col)
    ).mapInPandas(run, schema="file_seq long, xml string")


def seeds_from_robots(
    hosts: DataFrame,
    transport_factory,
    policy=None,
    agent: str = "*",
    scheme: str = "https",
    host_col: str = "host",
) -> DataFrame:
    """The full discovery loop as one distributed statement: hosts ->
    robots.txt fetch (rules AND global ``Sitemap:`` directives, one
    request per host) -> distributed sitemap-file fetch -> sitemap-INDEX
    expansion (one nesting level, per the protocol) -> ordered
    ``(seed_seq, raw)`` seed frame, ready for ``CrawlEngine.seed``.

    Ordering is deterministic and document-order nested: directive files
    rank globally by (host, directive position) via the two-phase
    distributed rank (operators/seq.py — no single-task window at
    10^7-host scale); an index's children slot under their parent's rank;
    the final ``seed_seq`` is a second dense distributed rank over
    (file rank, position in file) — exact at any scale, no bit-packing
    overflow.  Callers wanting the rules table too should call
    ``fetch_robots(with_sitemaps=True)`` once and pass the frame to
    ``sitemap_frames_from_rules`` to avoid a second robots fetch.
    """
    from crawler_to_md_spark.sources.robots import fetch_robots

    rb = fetch_robots(
        hosts, policy=policy, transport_factory=transport_factory,
        agent=agent, scheme=scheme, host_col=host_col, with_sitemaps=True)
    return sitemap_frames_from_rules(
        rb, transport_factory, policy=policy)


def sitemap_frames_from_rules(
    rules: DataFrame,
    transport_factory,
    policy=None,
) -> DataFrame:
    """``fetch_robots(with_sitemaps=True)`` output -> ordered seed frame
    (see :func:`seeds_from_robots` for the ordering contract)."""
    from crawler_to_md_spark.operators.seq import with_ordered_seq

    directives = rules.select(
        "host", F.posexplode("sitemaps").alias("pos", "url"))
    ranked = with_ordered_seq(
        directives, ["host", "pos"], seq_col="file_seq")
    frames = fetch_sitemap_frames(ranked, transport_factory, policy=policy)

    # one index-expansion level: index frames contribute their children as
    # nested file ranks; plain frames pass through unchanged
    expand = F.pandas_udf(
        lambda s: s.map(expand_sitemap_index), "array<string>")
    with_kids = frames.withColumn("kids", expand(F.col("xml")))
    # a directive's rank spans [r*2^20, (r+1)*2^20): a plain file sits at
    # the span start, an index's children at +kpos within it — ranks are
    # disjoint across directives so the spans never collide
    plain = with_kids.filter(F.size("kids") == 0).select(
        (F.col("file_seq") * (1 << 20)).alias("file_seq"), "xml")
    kid_urls = (
        with_kids.filter(F.size("kids") > 0)
        .select("file_seq", F.posexplode("kids").alias("kpos", "url"))
        .select((F.col("file_seq") * (1 << 20) + F.col("kpos"))
                .alias("file_seq"), "url")
    )
    kid_frames = fetch_sitemap_frames(
        kid_urls, transport_factory, policy=policy)
    parse = F.pandas_udf(
        lambda s: s.map(parse_sitemap_locs), "array<string>")
    locs = (
        plain.unionByName(kid_frames)
        .select("file_seq", F.posexplode(parse(F.col("xml")))
                .alias("pos", "raw"))
    )
    return with_ordered_seq(
        locs, ["file_seq", "pos"], seq_col="seed_seq"
    ).select("seed_seq", "raw")
