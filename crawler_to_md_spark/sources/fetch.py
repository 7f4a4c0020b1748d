"""Production HTTP fetch stage: ``mapInPandas`` over frontier micro-batches.

The sandbox crawl simulates fetching with an equi-join against the synthetic
corpus (sources/corpus.py) because there is no network; a real deployment
replaces that join with THIS stage.  The Spark-side plumbing — Arrow batch
handling, result schema, per-partition connection reuse, the retry/backoff
state machine, pacing, and header-only non-HTML skip — is real and fully
tested with an injectable transport; the default transport uses ``requests``
(import-gated so environments without it get a clear error instead of a
worker-side ImportError).

Reference semantics reproduced (cited for parity review):

* connection pool + retry adapter — reference scraper.py:98-111:
  ``urllib3.Retry(total=3, backoff_factor=1, status_forcelist
  {429,500,502,503,504})`` mounted on a pooled session.  Here: one
  transport session per *partition* (created inside the mapInPandas
  generator, reused across all batches of that task — the Spark analog of
  the reference's process-wide pool), and an explicit retry loop with
  exponential backoff ``backoff * 2**(attempt-1)`` matching urllib3's
  formula.
* timeout / proxy knobs — reference scraper.py:122-146, cli.py:106-117.
* early termination for non-HTML — reference scraper.py:491-504: the GET
  streams headers first and skips the body download when Content-Type is
  not HTML.  The transport contract mirrors that: it is called with
  ``want_body=False`` re-issue only when the headers said HTML.
* per-request delay — reference scraper.py:469-475 (O4); the sleep is
  injectable so the sleep-math is unit-testable like tests/test_scraper.py.

Scale notes: fetch is embarrassingly parallel — no shuffle is introduced;
the input partitioning (already host-salted by the politeness stage)
becomes the connection-locality layout, so one partition's session reuses
keep-alive connections to the hosts of that salt shard.  Results stream
out as Arrow batches; bodies never accumulate beyond one batch per task.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

# (status_code, content_type, body, error) — body/error may be None
TransportResult = tuple[int, str | None, bytes | None, str | None]
# transport(url, timeout, proxy, want_body) -> TransportResult
Transport = Callable[[str, float, str | None, bool], TransportResult]

FETCH_RESULT_DDL = (
    "url string, status_code int, content_type string, body binary, "
    "attempts int, fetched_html boolean, error string, "
    "etag string, last_modified string, not_modified boolean"
)

RETRY_FORCELIST = (429, 500, 502, 503, 504)   # scraper.py:101
HTML_TYPES = ("text/html", "application/xhtml+xml")


@dataclass
class FetchPolicy:
    """Transport policy — the reference's adapter/CLI knobs as data."""

    timeout: float = 10.0                     # cli.py:112-117
    proxy: str | None = None
    max_retries: int = 3                      # urllib3 Retry(total=3)
    backoff: float = 1.0                      # backoff_factor=1
    forcelist: tuple[int, ...] = RETRY_FORCELIST
    delay: float = 0.0                        # O4: seconds between requests
    sleep: Callable[[float], None] = field(default=time.sleep, repr=False)


def requests_transport() -> Transport:
    """The real socket layer over a pooled ``requests`` session (one per
    partition task — see :func:`http_fetch_stage`).  The sandbox has no
    network, so this constructs but its calls are exercised only in a live
    deployment; tests inject deterministic transports instead."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "requests is not installed in this environment; inject a "
            "transport (see tests/test_fetch.py) or install requests "
            "for a live deployment"
        ) from e

    session = requests.Session()

    def transport(url, timeout, proxy, want_body,
                  headers=None):  # pragma: no cover
        proxies = {"http": proxy, "https": proxy} if proxy else None
        r = session.get(url, timeout=timeout, proxies=proxies, stream=True,
                        headers=headers or None)
        ct = r.headers.get("Content-Type")
        vals = (r.headers.get("ETag"), r.headers.get("Last-Modified"))
        if not want_body or not _is_html(ct):
            r.close()
            return r.status_code, ct, None, None, vals
        return r.status_code, ct, r.content, None, vals

    return transport


def _is_html(content_type: str | None) -> bool:
    ct = (content_type or "").split(";", 1)[0].strip().lower()
    return ct in HTML_TYPES


def _adapt_transport(transport):
    """Normalize a transport to the extended 5-arg/5-tuple contract,
    wrapping legacy 4-arg ones.  The signature is probed ONCE (inspect),
    never by catching TypeError from a live call: a TypeError raised
    INSIDE a new-style transport (e.g. a bad header value) must
    propagate, not silently re-issue the HTTP request with the
    conditional headers dropped — that was a duplicate GET per retry
    attempt and lost If-None-Match semantics."""
    if getattr(transport, "_ctm_adapted", False):
        return transport
    try:
        import inspect

        sig = inspect.signature(transport)
        n_pos = sum(
            1 for p in sig.parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        new_style = n_pos >= 5 or any(
            p.kind == p.VAR_POSITIONAL for p in sig.parameters.values()
        )
    except (TypeError, ValueError):  # C-level callables: assume modern
        new_style = True

    def call(url, timeout, proxy, want_body, headers=None):
        if new_style:
            result = transport(url, timeout, proxy, want_body, headers)
        else:
            result = transport(url, timeout, proxy, want_body)
        if len(result) == 4:
            status, ct, body, err = result
            return status, ct, body, err, (None, None)
        return result

    call._ctm_adapted = True
    return call


def _call_transport(transport, url, policy, headers):
    """Invoke a transport through the normalized contract (see
    :func:`_adapt_transport`; hot paths pre-adapt once per partition)."""
    transport = _adapt_transport(transport)
    return transport(url, policy.timeout, policy.proxy, True, headers)


def fetch_one(
    url: str, policy: FetchPolicy, transport: Transport,
    validators: tuple[str | None, str | None] | None = None,
) -> tuple[int, str | None, bytes | None, int, bool, str | None,
           tuple[str | None, str | None], bool]:
    """One URL through the retry state machine.  Returns
    (status, content_type, body, attempts, fetched_html, error,
    (etag, last_modified), not_modified).

    ``validators`` are the previous fetch's cache validators: when set,
    the request carries ``If-None-Match`` / ``If-Modified-Since`` and a
    304 answer comes back as ``not_modified=True`` with no body — the
    TTL-recrawl path (reopen_due) re-verifies a page for the cost of
    headers instead of the full transfer."""
    headers = {}
    if validators:
        etag, last_mod = validators
        if etag:
            headers["If-None-Match"] = etag
        if last_mod:
            headers["If-Modified-Since"] = last_mod
    attempts = 0
    status, ct, body, err, resp_vals = 0, None, None, None, (None, None)
    while attempts < max(1, policy.max_retries):
        attempts += 1
        try:
            status, ct, body, err, resp_vals = _call_transport(
                transport, url, policy, headers or None
            )
        except Exception as e:  # connection-level failure (RequestException)
            status, ct, body, err, resp_vals = (
                0, None, None, f"{type(e).__name__}: {e}", (None, None))
        if status not in policy.forcelist and err is None:
            break
        if attempts < policy.max_retries:
            # urllib3 formula: backoff_factor * 2**(retry_number)
            policy.sleep(policy.backoff * (2 ** (attempts - 1)))
    # not_modified only counts when validators were actually SENT: a
    # server spuriously answering 304 on a first-ever fetch must fall
    # through to the http_skip taxonomy, not mark the URL visited-ok
    # with no doc row ever committed
    return (status, ct, body, attempts,
            _is_html(ct) and status == 200, err, resp_vals,
            status == 304 and validators is not None)


def proxy_self_test(
    policy: FetchPolicy,
    transport: Transport,
    test_url: str,
) -> None:
    """Reference startup proxy check (scraper.py:122-146): one driver-side
    header-only request through the configured proxy before any wave runs;
    an unreachable proxy fails fast with ValueError instead of surfacing as
    N_urls connection-failure doc rows mid-crawl."""
    try:
        transport(test_url, policy.timeout, policy.proxy, False)
    except Exception as exc:
        raise ValueError(f"Proxy unreachable: {exc}") from exc


def http_fetch_stage(
    frontier: DataFrame,
    policy: FetchPolicy | None = None,
    transport_factory: Callable[[], Transport] = requests_transport,
    url_col: str = "url",
    etag_col: str | None = None,
    last_modified_col: str | None = None,
) -> DataFrame:
    """The fetch stage: ``mapInPandas`` so each task holds ONE pooled
    transport session across all of its Arrow batches.

    ``transport_factory`` is called once per partition *inside* the task
    (sessions are not picklable and must not be driver-created); tests
    inject a deterministic fake.  Output schema: FETCH_RESULT_DDL — one row
    per input row, never raises out of the batch (errors become rows, the
    crawl's failure taxonomy takes it from there).
    """
    pol = policy or FetchPolicy()
    cols = [url_col]
    if etag_col:
        cols.append(etag_col)
    if last_modified_col:
        cols.append(last_modified_col)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one session per partition/task; signature probed once here, not
        # per URL (_adapt_transport is a no-op on already-adapted callables)
        transport = _adapt_transport(transport_factory())
        first = True
        for pdf in batches:
            out = {k: [] for k in ("url", "status_code", "content_type",
                                   "body", "attempts", "fetched_html",
                                   "error", "etag", "last_modified",
                                   "not_modified")}
            etags = pdf[etag_col] if etag_col else [None] * len(pdf)
            lms = (pdf[last_modified_col] if last_modified_col
                   else [None] * len(pdf))
            for url, etag, lm in zip(pdf[url_col], etags, lms):
                if not first and pol.delay > 0:
                    pol.sleep(pol.delay)   # O4 pacing, scraper.py:469-475
                first = False
                vals = ((etag if isinstance(etag, str) else None),
                        (lm if isinstance(lm, str) else None))
                (status, ct, body, attempts, is_html, err,
                 resp_vals, not_mod) = fetch_one(
                    str(url), pol, transport,
                    validators=vals if any(vals) else None,
                )
                out["url"].append(url)
                out["status_code"].append(status)
                out["content_type"].append(ct)
                out["body"].append(body)
                out["attempts"].append(attempts)
                out["fetched_html"].append(is_html)
                out["error"].append(err)
                out["etag"].append(resp_vals[0])
                out["last_modified"].append(resp_vals[1])
                out["not_modified"].append(not_mod)
            yield pd.DataFrame(out)

    return frontier.select(*cols).mapInPandas(run, schema=FETCH_RESULT_DDL)
