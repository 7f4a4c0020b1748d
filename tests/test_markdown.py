"""Markdown function tests — mirror reference tests/test_export_manager.py
cases (headers, cleanup, minifier corpus incl. idempotence) plus the native
span serializer."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import markdown as md


def _one(spark, expr_sql: str, value: str):
    df = spark.createDataFrame([(value,)], "c string")
    return df.selectExpr(f"({expr_sql}) AS out").collect()[0]["out"]


# ---------------------------------------------------------------- serializer

def test_spans_to_markdown(spark):
    spans = [
        {"kind": "heading1", "text": "Title", "media_ref": None, "offset": 0},
        {"kind": "paragraph", "text": "Hello world.", "media_ref": None, "offset": 1},
        {"kind": "image", "text": None, "media_ref": "https://e.com/i.png", "offset": 2},
        {"kind": "code", "text": "print(1)", "media_ref": None, "offset": 3},
        {"kind": "heading2", "text": "Sub", "media_ref": None, "offset": 4},
        {"kind": "link", "text": "next", "media_ref": "https://e.com/n", "offset": 5},
    ]
    df = spark.createDataFrame(
        [(spans,)],
        f"spans {md_spans_ddl()}",
    )
    out = df.selectExpr(md.spans_to_markdown_expr("spans") + " AS m").collect()[0]["m"]
    assert out == (
        "# Title\n\nHello world.\n\n![](https://e.com/i.png)\n\n"
        "```\nprint(1)\n```\n\n## Sub"
    )
    out_links = df.selectExpr(
        md.spans_to_markdown_expr("spans", include_links=True) + " AS m"
    ).collect()[0]["m"]
    assert out_links.endswith("[next](https://e.com/n)")


def md_spans_ddl() -> str:
    return "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


# ------------------------------------------------------------- normalize

def test_normalize_markdown_column(spark):
    df = spark.createDataFrame([("a  \nb\t\n\n\n\nc\r\n  ",), (None,), ("",)], "c string")
    got = [r[0] for r in df.select(md.normalize_markdown(F.col("c"))).collect()]
    assert got == ["a\nb\n\nc", "", ""]


# ---------------------------------------------------------- adjust headers

def python_adjust_headers(content: str, inc: int = 1) -> str:
    """Direct transliteration of reference export_manager.py:25-45 for parity."""
    new_content = ""
    for line in content.split("\n"):
        if line.startswith("#"):
            hashes = len(line.split(" ")[0])
            new_hashes = min(hashes + inc, 6)
            line = "\n" + "#" * new_hashes + line[hashes:] + "\n"
        new_content += line + "\n"
    return new_content


@pytest.mark.parametrize(
    "content",
    [
        "# Title\nbody",
        "## A\n### B\nplain",
        "###### Max\ntext",  # cap at 6 (reference tests 106-113)
        "#solo",
        "text only",
        "# A\n\n# B",
    ],
)
def test_adjust_headers_matches_reference(spark, content):
    got = _one(spark, md.adjust_headers_expr("c"), content)
    assert got == python_adjust_headers(content)


# ---------------------------------------------------------------- cleanup

def test_cleanup_markdown(spark):
    df = spark.createDataFrame([("a\n\n\n\n\nb\n\n\nc",)], "c string")
    got = df.select(md.cleanup_markdown(F.col("c"))).collect()[0][0]
    assert got == "a\n\nb\n\nc"


# ---------------------------------------------------------------- minifier

MINIFY_CASES = [
    # (name, input, expected) — reference tests/test_export_manager.py
    ("blank_lines", "a\n\nb\n", "a\nb\n"),
    ("hard_break_two_spaces", "line one  \nline two\n", "line one  \nline two\n"),
    ("three_spaces_stripped", "line one   \nline two\n", "line one\nline two\n"),
    ("one_space_stripped", "line one \nline two\n", "line one\nline two\n"),
    ("fence_preserved", "```\n\ncode  here \n\n```\nafter\n", "```\n\ncode  here \n\n```\nafter\n"),
    ("tilde_fence", "~~~\n\nx\n\n~~~\n", "~~~\n\nx\n\n~~~\n"),
    ("indented_fence", "  ```\n\n  x\n\n  ```\n", "  ```\n\n  x\n\n  ```\n"),
    ("comment_inline", "a <!-- hidden --> b\n", "a  b\n"),
    ("comment_multiline", "a\n<!-- one\ntwo\nthree -->\nb\n", "a\nb\n"),
    ("comment_unterminated", "a\n<!-- never closed\nmore\n", "a\n"),
    ("rule_removed", "a\n---\nb\n-----\nc\n", "a\nb\nc\n"),
    ("rule_in_fence_kept", "```\n---\n```\n", "```\n---\n```\n"),
    ("empty", "", ""),
]


@pytest.mark.parametrize("name,inp,expected", MINIFY_CASES, ids=[c[0] for c in MINIFY_CASES])
def test_minify_cases(name, inp, expected):
    assert md.minify_markdown_str(inp) == expected


@pytest.mark.parametrize("name,inp,expected", MINIFY_CASES, ids=[c[0] for c in MINIFY_CASES])
def test_minify_idempotent(name, inp, expected):
    once = md.minify_markdown_str(inp)
    assert md.minify_markdown_str(once) == once


def test_minify_crlf_stability():
    # reference tests/test_export_manager.py:378-386
    inp = "a\r\n\r\nb\r\n"
    once = md.minify_markdown_str(inp)
    assert md.minify_markdown_str(once) == once


def test_minify_udf(spark):
    df = spark.createDataFrame([(c[1],) for c in MINIFY_CASES], "c string")
    got = [r[0] for r in df.select(md.minify_markdown_udf(F.col("c"))).collect()]
    assert got == [c[2] for c in MINIFY_CASES]


def test_minify_json_metadata_block():
    # the compiled-export metadata comment block must vanish under minify
    block = "<!--\nURL: https://e.com/x\ntitle: T\n-->\n\n# Body\n"
    out = md.minify_markdown_str(block)
    assert "URL:" not in out and "# Body" in out


def test_json_roundtrip_content():
    # sanity: cleanup + minify never invalidate JSON string storage
    content = "# A\n\n\n\nB  \nC\n"
    m = md.minify_markdown_str(content)
    assert json.loads(json.dumps({"c": m}))["c"] == m
