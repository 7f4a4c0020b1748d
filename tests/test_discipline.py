"""UDF discipline, enforced mechanically (SURVEY §7): row-at-a-time
``F.udf`` is banned everywhere in the package and the entry harness — every
Python crossing must be an Arrow-batched ``pandas_udf`` / ``mapInPandas`` /
``applyInPandas`` (10-100x less serialization overhead; VERDICT r03
'What's wrong #2' caught two stragglers this test would have flagged)."""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent

# matches F.udf( / functions.udf( / bare udf( — but not pandas_udf(
PLAIN_UDF = re.compile(r"(?<![\w.])(?:F\.|functions\.)?(?<!pandas_)udf\(")

# files allowed to say "udf(" in prose/patterns (none hold real calls)
ALLOWLIST: set[str] = set()


def _source_files():
    yield PKG / "__spark_entry__.py"
    yield from sorted((PKG / "crawler_to_md_spark").rglob("*.py"))


def test_no_plain_row_udfs():
    offenders = []
    for path in _source_files():
        rel = str(path.relative_to(PKG))
        if rel in ALLOWLIST:
            continue
        for ln, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            if PLAIN_UDF.search(code):
                offenders.append(f"{rel}:{ln}: {line.strip()}")
    assert not offenders, (
        "plain row-at-a-time udf() calls found (use pandas_udf / "
        "mapInPandas):\n" + "\n".join(offenders)
    )


def test_pandas_udfs_are_the_declared_bridges():
    # sanity: the discipline isn't vacuous — the declared Arrow bridges
    # exist where the architecture says Python is unavoidable
    hits = []
    for path in _source_files():
        text = path.read_text()
        if "pandas_udf(" in text or "mapInPandas" in text \
                or "applyInPandas" in text:
            hits.append(path.name)
    for expected in ("urlkit.py", "extraction.py", "fetch.py", "robots.py",
                     "sitemap.py", "multimodal.py"):
        assert expected in hits, f"{expected} lost its Arrow bridge"
