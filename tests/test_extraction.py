"""Extraction UDF parity tests.

Mirrors the reference's extraction behavior (tests/test_scraper.py:47-151,
436-538, 587-602): one parse feeds spans AND links, CSS include/exclude,
script/style stripping, empty-content detection — plus the round-trip
invariant: rendering a span sequence to HTML and extracting it reproduces
the spans exactly (kind, text, media_ref, order), the BASELINE per-row
check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import extraction
from crawler_to_md_spark.functions.extraction import (
    HAVE_LXML,
    extract_document,
    make_extract_udf,
    spans_to_html,
)


@pytest.fixture(
    params=[
        "stdlib",
        pytest.param("lxml", marks=pytest.mark.skipif(
            not HAVE_LXML, reason="lxml not installed (sandbox)")),
    ],
    autouse=True,
)
def html_parser(request, monkeypatch):
    """Run EVERY test in this module under both parse engines: the lxml
    fast path (reference knob R2, 3-10x on the 100 TB cost center) must
    produce byte-identical spans/links/titles.  In the sandbox the lxml
    leg skips; a deployment with lxml installed gets the full parity
    suite for free."""
    monkeypatch.setattr(extraction, "DEFAULT_PARSER", request.param)
    return request.param


def _kinds(spans):
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def test_basic_blocks_document_order():
    html = """
    <html><head><title> My  Page </title></head><body>
      <h1>Top</h1>
      <p>First  paragraph
         spans lines.</p>
      <img src="/img/a.png" alt="">
      <h2>Sub</h2>
      <pre>x = 1
y = 2</pre>
      <p>Last.</p>
    </body></html>"""
    title, spans, links = extract_document(html)
    assert title == "My Page"
    assert _kinds(spans) == [
        ("heading1", "Top", None),
        ("paragraph", "First paragraph spans lines.", None),
        ("image", None, "/img/a.png"),
        ("heading2", "Sub", None),
        ("code", "x = 1\ny = 2", None),
        ("paragraph", "Last.", None),
    ]
    assert [s["offset"] for s in spans] == list(range(6))
    assert links == []


def test_one_parse_links_and_content():
    """F7+F8 fused: inline anchors render markdownify-style in the block
    text AND their hrefs land in out_links (scraper.py:185-215,259-274)."""
    html = """<body>
      <p>See <a href="/docs/next">the next page</a> for more.</p>
      <a href="https://other.example.com/x">standalone</a>
      <p>Unlinked.</p>
    </body>"""
    title, spans, links = extract_document(html)
    assert _kinds(spans) == [
        ("paragraph", "See [the next page](/docs/next) for more.", None),
        ("link", "standalone", "https://other.example.com/x"),
        ("paragraph", "Unlinked.", None),
    ]
    assert links == ["/docs/next", "https://other.example.com/x"]


def test_script_style_always_stripped():
    html = """<body><p>Keep</p>
      <script>var x = "<p>fake</p>";</script>
      <style>p { color: red }</style>
      <p>Also keep</p></body>"""
    _, spans, links = extract_document(html)
    assert _kinds(spans) == [
        ("paragraph", "Keep", None), ("paragraph", "Also keep", None)]


def test_css_exclude_drops_subtree():
    html = """<body>
      <div class="nav"><p>menu</p><a href="/nav">n</a></div>
      <p id="main">content</p>
    </body>"""
    _, spans, links = extract_document(html, exclude=[".nav"])
    assert _kinds(spans) == [("paragraph", "content", None)]
    assert links == []  # excluded subtree contributes no links either


def test_css_include_reroots():
    html = """<body>
      <p>outside</p>
      <div id="article"><h1>In</h1><p>inside</p></div>
      <p>outside too</p>
    </body>"""
    _, spans, links = extract_document(html, include=["#article"])
    assert _kinds(spans) == [("heading1", "In", None), ("paragraph", "inside", None)]


def test_include_then_exclude_order():
    """Reference applies include re-root, then exclude, then strip
    (scraper.py:231-254)."""
    html = """<body>
      <div class="keep"><p>a</p><span class="ads"><p>ad</p></span><p>b</p></div>
      <p>dropped</p>
    </body>"""
    _, spans, _ = extract_document(html, include=[".keep"], exclude=[".ads"])
    assert _kinds(spans) == [("paragraph", "a", None), ("paragraph", "b", None)]


def test_lists_and_blockquote_markdownify_prefixes():
    html = """<body>
      <ul><li>alpha</li><li>beta</li></ul>
      <ol><li>one</li><li>two</li></ol>
      <blockquote>wise words</blockquote>
    </body>"""
    _, spans, _ = extract_document(html)
    assert _kinds(spans) == [
        ("paragraph", "* alpha", None),
        ("paragraph", "* beta", None),
        ("paragraph", "1. one", None),
        ("paragraph", "2. two", None),
        ("paragraph", "> wise words", None),
    ]


def test_inline_image_markdownify_syntax():
    html = '<body><p>before <img src="i.png" alt="pic"> after</p></body>'
    _, spans, _ = extract_document(html)
    assert _kinds(spans) == [("paragraph", "before ![pic](i.png) after", None)]


def test_empty_content_is_empty_span_list():
    """Blank markdown => failure (scraper.py:276-278); links may still
    exist (one-parse over empty-content pages)."""
    html = '<body><div>   </div><a href="/still/found">x</a></body>'
    _, spans, links = extract_document(html)
    content = [s for s in spans if s["kind"] != "link"]
    assert content == []
    assert links == ["/still/found"]


def test_malformed_html_is_lenient():
    html = "<body><p>unclosed<h1>heading</body>"
    _, spans, _ = extract_document(html)
    kinds = [s["kind"] for s in spans]
    assert "heading1" in kinds and "paragraph" in kinds


def test_none_input():
    title, spans, links = extract_document(None)
    assert (title, spans, links) == (None, [], [])


# ---------------------------------------------------------------------------
# round-trip: spans -> HTML -> spans (the BASELINE per-row invariant)
# ---------------------------------------------------------------------------


ROUNDTRIP_CASES = [
    [{"kind": "heading1", "text": "Doc 5", "media_ref": None, "offset": 0},
     {"kind": "paragraph", "text": "Some body text here.", "media_ref": None, "offset": 1},
     {"kind": "image", "text": None, "media_ref": "https://h/img/5.png", "offset": 2},
     {"kind": "code", "text": "print(5)", "media_ref": None, "offset": 3},
     {"kind": "link", "text": "child", "media_ref": "https://h/docs/p16", "offset": 4}],
    [{"kind": "heading3", "text": "Deep", "media_ref": None, "offset": 0},
     {"kind": "paragraph", "text": "a b c", "media_ref": None, "offset": 1}],
]


@pytest.mark.parametrize("spans", ROUNDTRIP_CASES)
def test_span_html_roundtrip(spans):
    html = spans_to_html("T", spans)
    title, got, links = extract_document(html)
    assert title == "T"
    assert _kinds(got) == _kinds(spans)
    assert [s["offset"] for s in got] == [s["offset"] for s in spans]


def test_roundtrip_on_synthetic_corpus(spark):
    """Render every span doc of a small corpus to HTML, extract with the
    fused UDF in Spark, and require exact span-sequence equality."""
    from crawler_to_md_spark.sources import corpus

    df = (
        corpus.synth_corpus(spark, "/root/testdata/sf0.001", replicas=1)
        .filter("cls = 'ok'")
        .limit(120)
    )
    rows = df.select("url", "title", "spans").collect()
    html_rows = [
        (r["url"], spans_to_html(r["title"], [s.asDict() for s in r["spans"]]))
        for r in rows
    ]
    html_df = spark.createDataFrame(html_rows, "url string, html string")
    extract = make_extract_udf()
    out = html_df.select("url", extract(F.col("html")).alias("e")).collect()
    want = {r["url"]: [tuple(s) for s in r["spans"]] for r in rows}
    for r in out:
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
               for s in r["e"]["spans"]]
        assert got == [tuple(s) for s in want[r["url"]]], r["url"]
        assert r["e"]["title"] is not None
    # out_links carry exactly the link-span hrefs, in document order
    for r, orig in zip(out, rows):
        hrefs = [s["media_ref"] for s in orig["spans"] if s["kind"] == "link"]
        assert list(r["e"]["out_links"]) == hrefs
