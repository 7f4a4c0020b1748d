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
