"""End-to-end crawl through the pluggable HTTP fetch stage: injected
transport + REAL one-parse extraction (operators/fetchstage.py), activating
``CrawlConfig.css_include``/``css_exclude`` — the reference's core
fetch->parse->extract loop (scraper.py:491-558) over the wave engine."""

from __future__ import annotations

import sys

import pytest
from pyspark import cloudpickle
from pyspark.sql import functions as F

# the injected transport lives in this test module, which executor python
# workers cannot import — ship it by value instead of by reference
cloudpickle.register_pickle_by_value(sys.modules[__name__])

from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
from crawler_to_md_spark.operators.fetchstage import (
    corpus_fetch_stage,
    http_extract_stage,
    http_stage_from_config,
)
from crawler_to_md_spark.sources.fetch import FetchPolicy

BASE = "https://site.example.com"

SITE = {
    f"{BASE}/": (
        200, "text/html; charset=utf-8",
        "<html><head><title>Home</title></head><body>"
        "<p>Welcome <a href='/a'>to A</a></p>"
        "<a href='/b'>standalone B</a>"
        "<div class='nav'><p>chrome</p><a href='/hidden'>H</a></div>"
        "</body></html>",
    ),
    f"{BASE}/a": (
        200, "text/html",
        "<html><head><title>A</title></head><body><h1>Alpha</h1>"
        "<p>alpha body</p><a href='/c'>C</a>"
        "<a href='/doc.pdf'>pdf</a><a href='/dead'>dead</a>"
        "</body></html>",
    ),
    f"{BASE}/b": (
        200, "text/html",
        "<html><head><title>B</title></head><body><p>bee</p></body></html>",
    ),
    f"{BASE}/c": (404, "text/html", "gone"),
    f"{BASE}/doc.pdf": (200, "application/pdf", "%PDF"),
    # /dead and /hidden are not in the table: connection error
}


class SiteTransport:
    """Deterministic site; /b fails once with 503 (transport-level retry)."""

    def __init__(self):
        self.b_failures = 1

    def __call__(self, url, timeout, proxy, want_body):
        if url == f"{BASE}/b" and self.b_failures > 0:
            self.b_failures -= 1
            return 503, "text/html", None, None
        if url not in SITE:
            raise ConnectionError("no route to host")
        status, ct, body = SITE[url]
        if "text/html" not in ct:
            return status, ct, None, None      # header-only skip
        return status, ct, body.encode(), None


def _stage(css_exclude=None):
    return http_extract_stage(
        policy=FetchPolicy(max_retries=3, sleep=lambda s: None),
        transport_factory=SiteTransport,
        css_exclude=css_exclude,
    )


@pytest.fixture(scope="module")
def live_engine(spark, tmp_path_factory):
    eng = CrawlEngine(
        spark,
        str(tmp_path_factory.mktemp("live_wh")),
        config=CrawlConfig(scope_base_url=f"{BASE}/", max_retries=2,
                           css_exclude=[".nav"]),
        fetch_stage=_stage(css_exclude=[".nav"]),
    )
    eng.seed([f"{BASE}/"])
    eng.run_to_completion()
    return eng


def test_live_crawl_seen_set_and_css_exclude_gates_discovery(live_engine):
    urls = {r["url"] for r in live_engine.links().collect()}
    assert urls == {
        f"{BASE}/", f"{BASE}/a", f"{BASE}/b", f"{BASE}/c",
        f"{BASE}/doc.pdf", f"{BASE}/dead",
    }
    # /hidden sat inside the excluded .nav subtree: never discovered (P7
    # scoping applies to the ONE parse that feeds both content and links)


def test_live_crawl_docs_taxonomy(live_engine):
    docs = {r["url"]: r for r in live_engine.docs().collect()}
    assert docs[f"{BASE}/"]["status"] == "ok"
    assert docs[f"{BASE}/a"]["status"] == "ok"
    # /b: transport-level 503 retried INSIDE the stage -> ok in one attempt
    assert docs[f"{BASE}/b"]["status"] == "ok"
    # connection failure -> failed doc row with reference error metadata
    dead = docs[f"{BASE}/dead"]
    assert dead["status"] == "failed" and dead["spans"] is None
    assert dead["metadata"]["error_type"] == "RequestException"
    # 404 and non-HTML: visited, skipped, NO doc row (scraper.py:496-528)
    assert f"{BASE}/c" not in docs and f"{BASE}/doc.pdf" not in docs


def test_live_crawl_extraction_spans_and_title(live_engine):
    home = live_engine.docs().filter(F.col("url") == f"{BASE}/").first()
    assert home["metadata"]["title"] == "Home"
    kinds_texts = [(s["kind"], s["text"]) for s in home["spans"]]
    # excluded .nav content ('chrome') is absent; inline link folded into
    # the paragraph text markdownify-style; standalone anchor is a span
    assert ("paragraph", "Welcome [to A](/a)") in kinds_texts
    assert ("link", "standalone B") in kinds_texts
    assert all("chrome" not in (t or "") for _, t in kinds_texts)


def test_live_crawl_retry_state_and_visited(live_engine):
    rows = {r["url"]: r for r in live_engine.links().collect()}
    assert all(r["visited"] for r in rows.values())
    assert rows[f"{BASE}/dead"]["retry_count"] == 2        # == max_retries
    assert rows[f"{BASE}/b"]["retry_count"] == 0           # success resets


def test_http_stage_from_config_binds_transport_knobs(spark, tmp_path):
    cfg = CrawlConfig(scope_base_url=f"{BASE}/", timeout=3.5,
                      css_exclude=[".nav"])
    stage = http_stage_from_config(cfg, transport_factory=SiteTransport)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), config=cfg,
                      fetch_stage=stage)
    eng.seed([f"{BASE}/"])
    eng.run()
    assert eng.visited_count() >= 1
    home = eng.docs().filter(F.col("url") == f"{BASE}/").first()
    assert home["metadata"]["title"] == "Home"


def test_proxy_self_test_runs_at_stage_build_and_fails_fast():
    """Reference scraper.py:122-146: with --proxy set, one header-only
    request through the proxy at startup; unreachable -> ValueError before
    any wave runs."""
    calls = []

    class ProxyProbe:
        def __call__(self, url, timeout, proxy, want_body):
            calls.append((url, proxy, want_body))
            return 200, "text/html", None, None

    cfg = CrawlConfig(scope_base_url=f"{BASE}/", proxy="http://px:3128")
    http_stage_from_config(cfg, transport_factory=ProxyProbe)
    assert calls == [(f"{BASE}/", "http://px:3128", False)]

    class DeadProxy:
        def __call__(self, url, timeout, proxy, want_body):
            raise ConnectionError("proxy down")

    with pytest.raises(ValueError, match="Proxy unreachable"):
        http_stage_from_config(cfg, transport_factory=DeadProxy)


def test_no_proxy_skips_self_test():
    calls = []

    class Probe:
        def __call__(self, url, timeout, proxy, want_body):
            calls.append(url)
            return 200, "text/html", None, None

    http_stage_from_config(CrawlConfig(scope_base_url=f"{BASE}/"),
                           transport_factory=Probe)
    assert calls == []


def test_corpus_stage_out_links_match_link_spans(spark):
    """The corpus stage's out_links derivation preserves round-2 discovery
    semantics: exactly the link spans' media_refs, in order."""
    from crawler_to_md_spark.store.schemas import SPANS_DDL

    df = spark.createDataFrame(
        [("u1", 200, "text/html", 0, "t",
          [("paragraph", "p", None, 0), ("link", "x", "/l1", 1),
           ("link", "y", "/l2", 2)])],
        f"url string, status_code int, content_type string, "
        f"transient_failures_remaining int, title string, spans {SPANS_DDL}",
    )
    batch = df.select("url")
    out = corpus_fetch_stage(df)(batch).select("out_links").first()[0]
    assert out == ["/l1", "/l2"]


# ---------------------------------------------------------------------------
# conditional refetch: 304 keeps the committed doc (O16)
# ---------------------------------------------------------------------------

class RevalidatingTransport:
    """First pass serves the site; after `flip()`, /b answers 304."""

    revalidate = False

    def __call__(self, url, timeout, proxy, want_body, headers=None):
        if RevalidatingTransport.revalidate and url == f"{BASE}/b":
            return 304, None, None, None, (None, None)
        if url not in SITE:
            raise ConnectionError("no route to host")
        status, ct, body = SITE[url]
        if "text/html" not in ct:
            return status, ct, None, None, (None, None)
        return status, ct, body.encode(), None, ('"etag-b"', None)


def test_304_revalidation_keeps_committed_doc(spark, tmp_path):
    stage = http_extract_stage(
        policy=FetchPolicy(max_retries=2, sleep=lambda s: None),
        transport_factory=RevalidatingTransport,
    )
    eng = CrawlEngine(
        spark, str(tmp_path / "wh"),
        config=CrawlConfig(scope_base_url=f"{BASE}/", max_retries=2),
        fetch_stage=stage,
    )
    RevalidatingTransport.revalidate = False
    eng.seed([f"{BASE}/"])
    eng.run_to_completion()
    doc_b = [r for r in eng.docs().collect() if r["url"] == f"{BASE}/b"]
    assert doc_b and doc_b[0]["status"] == "ok"
    first_batch = doc_b[0]["batch_id"]

    # TTL revisit: reopen /b, the server now answers 304
    RevalidatingTransport.revalidate = True
    eng.reopen([f"{BASE}/b"])
    eng.run(resume=True)
    rows = {r["url"]: r for r in eng.links().collect()}
    assert rows[f"{BASE}/b"]["visited"]          # revalidated, not retried
    assert rows[f"{BASE}/b"]["retry_count"] == 0
    doc_b2 = [r for r in eng.docs().collect() if r["url"] == f"{BASE}/b"]
    assert doc_b2 and doc_b2[0]["status"] == "ok"
    assert doc_b2[0]["batch_id"] == first_batch  # committed doc KEPT
    assert doc_b2[0]["spans"] is not None


class ValidatorTransport:
    """Serves the site with ETags; answers 304 ONLY to a correct
    If-None-Match — proving the engine actually stored and resent it."""

    def __call__(self, url, timeout, proxy, want_body, headers=None):
        if headers and headers.get("If-None-Match") == f'"v-{url[-1]}"':
            return 304, None, None, None, (None, None)
        if url not in SITE:
            raise ConnectionError("no route to host")
        status, ct, body = SITE[url]
        if "text/html" not in ct:
            return status, ct, None, None, (None, None)
        return status, ct, body.encode(), None, \
            (f'"v-{url[-1]}"', "Mon, 05 Jan 2026 00:00:00 GMT")


def test_revalidate_full_loop_stores_and_resends_validators(spark, tmp_path):
    """CrawlConfig(revalidate=True): crawl stores each ok page's ETag in
    doc metadata; a TTL reopen refetches WITH If-None-Match, the 304 keeps
    the committed doc."""
    cfg = CrawlConfig(scope_base_url=f"{BASE}/", max_retries=2,
                      revalidate=True)
    stage = http_stage_from_config(cfg, transport_factory=ValidatorTransport)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), config=cfg,
                      fetch_stage=stage)
    eng.seed([f"{BASE}/"])
    eng.run_to_completion()
    doc_b = [r for r in eng.docs().collect() if r["url"] == f"{BASE}/b"][0]
    assert doc_b["metadata"]["etag"] == '"v-b"'          # validator stored
    assert doc_b["metadata"]["last_modified"].startswith("Mon")
    first_batch = doc_b["batch_id"]

    eng.reopen([f"{BASE}/b"])
    eng.run(resume=True)
    doc_b2 = [r for r in eng.docs().collect() if r["url"] == f"{BASE}/b"][0]
    assert doc_b2["batch_id"] == first_batch             # 304 -> doc kept
    links = {r["url"]: r for r in eng.links().collect()}
    assert links[f"{BASE}/b"]["visited"]
    assert links[f"{BASE}/b"]["retry_count"] == 0
