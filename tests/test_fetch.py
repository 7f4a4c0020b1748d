"""Production HTTP fetch stage (sources/fetch.py): the mapInPandas
plumbing, retry/backoff state machine, pacing sleep-math, and header-only
non-HTML skip — all against an injectable deterministic transport
(the socket layer itself needs `requests`, absent here by design)."""

from __future__ import annotations

import pytest

from crawler_to_md_spark.sources import fetch


def _fetch6(*args, **kw):
    """Legacy 6-tuple view of fetch_one for the pre-conditional tests."""
    return fetch.fetch_one(*args, **kw)[:6]


class FakeTransport:
    """url -> scripted (status, content_type, body) with optional leading
    failures; records every call."""

    def __init__(self, table, fail_times=None):
        self.table = table
        self.fail_times = dict(fail_times or {})
        self.calls = []

    def __call__(self, url, timeout, proxy, want_body):
        self.calls.append((url, timeout, proxy, want_body))
        if self.fail_times.get(url, 0) > 0:
            self.fail_times[url] -= 1
            status, ct, body = self.table.get(url, (0, None, None))
            # scripted transient: forcelist status before the real answer
            return 503, ct, None, None
        if url not in self.table:
            raise ConnectionError("no route to host")
        status, ct, body = self.table[url]
        if not fetch._is_html(ct):
            return status, ct, None, None    # header-only: body not shipped
        return status, ct, body, None


TABLE = {
    "https://a/ok": (200, "text/html; charset=utf-8", b"<html>A</html>"),
    "https://a/pdf": (200, "application/pdf", b"%PDF"),
    "https://a/404": (404, "text/html", b"gone"),
    "https://b/flaky": (200, "text/html", b"<html>B</html>"),
}


def _policy(sleeps=None, **kw):
    rec = sleeps if sleeps is not None else []
    return fetch.FetchPolicy(sleep=rec.append, **kw)


def test_fetch_one_success_single_attempt():
    t = FakeTransport(TABLE)
    status, ct, body, attempts, is_html, err = _fetch6(
        "https://a/ok", _policy(), t)
    assert (status, attempts, is_html, err) == (200, 1, True, None)
    assert body == b"<html>A</html>"


def test_fetch_one_retries_forcelist_with_urllib3_backoff():
    sleeps = []
    t = FakeTransport(TABLE, fail_times={"https://b/flaky": 2})
    status, ct, body, attempts, is_html, err = _fetch6(
        "https://b/flaky", _policy(sleeps, backoff=1.0, max_retries=3), t)
    assert (status, attempts, is_html) == (200, 3, True)
    # urllib3 formula: backoff * 2**(attempt-1) -> 1s, 2s
    assert sleeps == [1.0, 2.0]


def test_fetch_one_exhausts_retries():
    sleeps = []
    t = FakeTransport(TABLE, fail_times={"https://b/flaky": 99})
    status, ct, body, attempts, is_html, err = _fetch6(
        "https://b/flaky", _policy(sleeps, max_retries=3), t)
    assert (status, attempts, is_html) == (503, 3, False)
    assert len(sleeps) == 2                  # no sleep after final attempt


def test_fetch_one_connection_error_becomes_row_not_raise():
    t = FakeTransport(TABLE)
    status, ct, body, attempts, is_html, err = _fetch6(
        "https://nowhere/x", _policy(max_retries=2), t)
    assert status == 0 and body is None and not is_html
    assert attempts == 2 and "ConnectionError" in err


def test_non_html_skips_body():
    t = FakeTransport(TABLE)
    status, ct, body, attempts, is_html, err = _fetch6(
        "https://a/pdf", _policy(), t)
    assert (status, is_html, body) == (200, False, None)


def test_http_fetch_stage_plumbing(spark):
    """mapInPandas end-to-end: schema, one row per input, taxonomy-ready
    error rows, html flag."""
    frontier = spark.createDataFrame(
        [(u,) for u in ["https://a/ok", "https://a/pdf", "https://a/404",
                        "https://nowhere/x"]],
        "url string",
    )
    # the factory must serialize by value into python workers (a class from
    # this test module is not importable there) -> closure over plain data
    table = dict(TABLE)

    def factory():
        def transport(url, timeout, proxy, want_body):
            if url not in table:
                raise ConnectionError("no route to host")
            status, ct, body = table[url]
            if not fetch._is_html(ct):
                return status, ct, None, None
            return status, ct, body, None

        return transport

    out = fetch.http_fetch_stage(
        frontier,
        policy=fetch.FetchPolicy(max_retries=2, sleep=lambda s: None),
        transport_factory=factory,
    )
    rows = {r["url"]: r for r in out.collect()}
    assert set(out.columns) == {"url", "status_code", "content_type", "body",
                                "attempts", "fetched_html", "error",
                                "etag", "last_modified", "not_modified"}
    assert len(rows) == 4
    assert rows["https://a/ok"]["fetched_html"] is True
    assert bytes(rows["https://a/ok"]["body"]) == b"<html>A</html>"
    assert rows["https://a/pdf"]["body"] is None          # header-only skip
    assert rows["https://a/404"]["status_code"] == 404
    assert rows["https://nowhere/x"]["status_code"] == 0
    assert rows["https://nowhere/x"]["attempts"] == 2
    assert "ConnectionError" in rows["https://nowhere/x"]["error"]


def test_delay_pacing_sleep_math():
    """O4: delay sleeps between consecutive requests of one partition,
    not before the first (reference scraper.py:469-475 sleep-math)."""
    sleeps = []
    pol = _policy(sleeps, delay=0.25)
    t = FakeTransport(TABLE)
    import pandas as pd

    batches = iter([pd.DataFrame({"url": ["https://a/ok", "https://a/404"]}),
                    pd.DataFrame({"url": ["https://a/pdf"]})])

    # run the inner generator directly (no Spark needed for sleep-math)
    from crawler_to_md_spark.sources.fetch import http_fetch_stage  # noqa: F401

    # reimplement the pacing contract through fetch_one + manual loop is
    # exactly what the stage does; assert via the stage's own generator:
    import types

    captured = []

    class FakeDF:
        def select(self, col):
            return self

        def mapInPandas(self, fn, schema):
            for out in fn(batches):
                captured.append(out)
            return types.SimpleNamespace(schema=schema)

    fetch.http_fetch_stage(FakeDF(), policy=pol,
                           transport_factory=lambda: t)
    # 3 requests total -> 2 pacing sleeps of 0.25 (none before the first),
    # spanning the batch boundary
    assert sleeps == [0.25, 0.25]
    assert sum(len(c) for c in captured) == 3


def test_requests_transport_constructs():
    """requests IS available here; the real transport must build a pooled
    session (network calls themselves need a live deployment)."""
    pytest.importorskip("requests")
    t = fetch.requests_transport()
    assert callable(t)


# ---------------------------------------------------------------------------
# conditional requests (ETag / If-Modified-Since)
# ---------------------------------------------------------------------------

def test_fetch_one_sends_validators_and_handles_304():
    seen = {}

    def transport(url, timeout, proxy, want_body, headers=None):
        seen["headers"] = headers
        if headers and headers.get("If-None-Match") == '"v1"':
            return 304, None, None, None, (None, None)
        return 200, "text/html", b"<html>new</html>", None, \
            ('"v2"', "Wed, 01 Jan 2026 00:00:00 GMT")

    pol = fetch.FetchPolicy(max_retries=2, sleep=lambda s: None)
    # matching validator -> 304, no body, not_modified
    (status, ct, body, attempts, is_html, err,
     vals, not_mod) = fetch.fetch_one(
        "https://a/x", pol, transport, validators=('"v1"', None))
    assert seen["headers"] == {"If-None-Match": '"v1"'}
    assert status == 304 and body is None and not_mod
    # stale validator -> full fetch, fresh validators captured
    (status, ct, body, attempts, is_html, err,
     vals, not_mod) = fetch.fetch_one(
        "https://a/x", pol, transport, validators=('"v0"', "old-date"))
    assert seen["headers"] == {"If-None-Match": '"v0"',
                               "If-Modified-Since": "old-date"}
    assert status == 200 and is_html and not not_mod
    assert vals == ('"v2"', "Wed, 01 Jan 2026 00:00:00 GMT")


def test_fetch_one_legacy_transport_still_works():
    def legacy(url, timeout, proxy, want_body):
        return 200, "text/html", b"<html>x</html>", None

    pol = fetch.FetchPolicy(max_retries=1, sleep=lambda s: None)
    out = fetch.fetch_one("https://a/x", pol, legacy)
    assert out[0] == 200 and out[6] == (None, None) and out[7] is False


def test_http_fetch_stage_conditional_columns(spark):
    frontier = spark.createDataFrame(
        [("https://a/fresh", '"f"', None),
         ("https://a/stale", '"s-old"', "old-date"),
         ("https://a/new", None, None)],
        "url string, etag string, lm string")

    def factory():
        def transport(url, timeout, proxy, want_body, headers=None):
            if headers and headers.get("If-None-Match") == '"f"':
                return 304, None, None, None, (None, None)
            return 200, "text/html", b"<html>b</html>", None, \
                ('"new"', "Thu, 02 Jan 2026 00:00:00 GMT")

        return transport

    out = {r["url"]: r for r in fetch.http_fetch_stage(
        frontier, policy=fetch.FetchPolicy(sleep=lambda s: None),
        transport_factory=factory, etag_col="etag",
        last_modified_col="lm").collect()}
    assert out["https://a/fresh"]["not_modified"] is True
    assert out["https://a/fresh"]["body"] is None
    assert out["https://a/stale"]["not_modified"] is False
    assert out["https://a/stale"]["etag"] == '"new"'
    assert out["https://a/new"]["etag"] == '"new"'
    assert out["https://a/new"]["last_modified"].startswith("Thu")
