"""URL canonicalization, scope predicates, and filename mapping.

Semantics mirror the reference implementation
(/root/reference/crawler_to_md/utils.py:109-144 ``normalize_url``,
utils.py:147-193 ``is_supported_scheme``/``is_url_in_scope``,
utils.py:10-90 filename helpers) but are expressed as **native Spark column
expressions** so they run inside whole-stage codegen on the JVM — no Python
in the hot path.  A vectorized pandas UDF (:func:`canonicalize_udf`) provides
the full urllib.parse semantics (IPv6 hosts, userinfo, exotic ports) and is
the documented parity oracle; the native path matches it on every URL shape
the engine's corpus and the reference's test-suite exercise (verified in
tests/test_urlkit.py).

Canonical form (reference utils.py:109-144):
  * strip surrounding whitespace; drop the ``#fragment``
  * require an absolute URL with a scheme and a hostname
  * lowercase scheme and hostname; keep an explicit port; drop userinfo
  * keep path / params / query byte-for-byte
An invalid URL canonicalizes to NULL (the reference raises ValueError and
callers skip the URL — scraper.py:205-207, 481-487).
"""

from __future__ import annotations

import functools
import itertools
import re
from urllib.parse import urljoin, urlparse, urlunparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# --------------------------------------------------------------------------
# Native canonicalization (hot path, whole-stage codegen)
#
# These primitives run once per candidate URL per wave — at 10^10-URL
# frontier scale this is the hottest expression chain in the engine, so it
# is written with substring/translate operations only: a profile of the
# scheduling stage showed the earlier regex-based variant (6+ matcher
# allocations per URL) memory-bandwidth-bound.  The one check that needs a
# character class (scheme alphabet) uses translate() against the allowed
# set instead of a pattern.
# --------------------------------------------------------------------------

_SEP = "://"
_SCHEME_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789+.-"

# NOTE on expression shape: every helper must reference its input column a
# BOUNDED, small number of times.  Catalyst's CollapseProject inlines
# withColumn chains by substitution, so a helper that mentions its input k
# times multiplies the upstream tree by k — layered helpers then blow up
# multiplicatively (observed: 42 MiB task binaries and whole-stage codegen
# bailing out, which silently fell back to interpreted evaluation).  The
# split-once pattern below keeps each derivation linear.


def defrag(url: Column) -> Column:
    """Drop everything from the first ``#`` (reference scraper.py:204)."""
    return F.substring_index(url, "#", 1)


def _after_sep(url: Column) -> Column:
    """Everything after the FIRST ``://`` (NULL when absent) — one input
    reference via split-with-limit."""
    return F.get(F.split(url, _SEP, 2), 1)


def url_scheme(url: Column) -> Column:
    """Lowercased text before the first ``://`` (the whole string when no
    separator — callers validate with :func:`_valid_scheme` / NULL
    ``_after_sep``)."""
    return F.lower(F.substring_index(url, _SEP, 1))


def url_netloc(url: Column) -> Column:
    """netloc exactly as written (may contain userinfo / port)."""
    return F.coalesce(
        F.substring_index(F.substring_index(_after_sep(url), "/", 1), "?", 1),
        F.lit(""),
    )


def _rest_of(after: Column, netloc: Column) -> Column:
    return F.coalesce(F.substr(after, F.length(netloc) + 1), F.lit(""))


def url_rest(url: Column) -> Column:
    """path + params + query (fragment must already be stripped)."""
    after = _after_sep(url)
    netloc = F.substring_index(F.substring_index(after, "/", 1), "?", 1)
    return _rest_of(after, netloc)


def _hostport_of(netloc: Column) -> Column:
    return F.substring_index(netloc, "@", -1)


def url_host(url: Column) -> Column:
    """Lowercased hostname: netloc minus userinfo minus port (first-colon
    prefix; substring_index returns the whole string when no colon)."""
    return F.coalesce(
        F.lower(F.substring_index(_hostport_of(url_netloc(url)), ":", 1)),
        F.lit(""),
    )


def _port_num_of(hostport: Column) -> Column:
    """Parsed port int; NULL when absent or non-numeric."""
    return F.when(
        hostport.contains(":"), F.substring_index(hostport, ":", -1)
    ).try_cast("int")


def url_port(url: Column) -> Column:
    """Explicit port digits (normalized, no leading zeros) or ''."""
    port_num = _port_num_of(_hostport_of(url_netloc(url)))
    return F.when(
        port_num.isNotNull() & (port_num >= 0), port_num.cast("string")
    ).otherwise(F.lit(""))


def url_path(url: Column) -> Column:
    """path+params (everything before ``?``) of an absolute URL."""
    return F.substring_index(url_rest(url), "?", 1)


def _valid_scheme(scheme_lower: Column) -> Column:
    """[a-z][a-z0-9+.-]*: translate() empties valid schemes; the first
    char must be a letter."""
    first = F.substring(scheme_lower, 1, 1)
    return (
        (scheme_lower != F.lit(""))
        & (F.translate(scheme_lower, _SCHEME_CHARS, "") == F.lit(""))
        & (first >= F.lit("a"))
        & (first <= F.lit("z"))
    )


def canonicalize(url: Column) -> Column:
    """Native canonical form, NULL when invalid.

    Matches reference ``normalize_url`` (utils.py:109-144) for all URLs
    without IPv6 literals or percent-encoded hosts; the pandas-UDF path
    (:func:`canonicalize_udf`) covers the long tail and is cross-checked in
    tests.  Ports that are present but non-numeric (``http://h:ab/``) are
    invalid, exactly like ``urlparse(...).port`` raising ValueError.
    """
    s = defrag(F.trim(url))
    after = _after_sep(s)
    scheme = url_scheme(s)
    netloc = F.substring_index(F.substring_index(after, "/", 1), "?", 1)
    hostport = _hostport_of(netloc)
    host = F.lower(F.substring_index(hostport, ":", 1))
    port_num = _port_num_of(hostport)
    rest = _rest_of(after, netloc)

    bad_port = hostport.contains(":") & (
        port_num.isNull() | (port_num > 65535) | (port_num < 0)
    )
    valid = (
        after.isNotNull()
        & _valid_scheme(scheme)
        & (host != F.lit(""))
        & ~bad_port
        & ~host.contains("[")  # IPv6 literals -> UDF path only
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(
            port_num.isNotNull(), F.concat(F.lit(":"), port_num.cast("string"))
        ).otherwise(F.lit("")),
        rest,
    )
    return F.when(valid, canon).otherwise(F.lit(None).cast("string"))


_barrier_ids = itertools.count()


def _plan_barrier(df):
    """Insert a CollectMetrics (``observe``) node between staged URL
    projections — a PLANNER barrier, not a data transform.

    Why: SparkPlanner's ``PhysicalOperation`` pattern re-collects the
    whole Project chain at EVERY recursion level, substituting and
    trimming aliases into progressively larger expression trees
    (hot frame in stack samples: ``PhysicalOperation$.trimAliases``).
    On the resolve+canonicalize chain this cost ~4 s of driver time per
    planned query — per crawl wave — independent of data size.
    ``CollectMetrics`` is not a Project/Filter, so the collection stops at
    each stage boundary: measured planning time 4.5 s -> 0.01 s, same
    results.  Runtime cost is one count accumulator per row; the metric
    itself is never read."""
    return df.observe(
        f"__plan_barrier_{next(_barrier_ids)}", F.count(F.lit(1)).alias("rows")
    )


# public name: other operators stage expensive projections behind the same
# barrier (CollapseProject would otherwise inline the staged alias back
# into every downstream use — similarity.simhash_sketch re-cast its vector
# 32x that way)
plan_barrier = _plan_barrier


def with_canonical_url(df, src_col: str, out_col: str = "url"):
    """DataFrame-level canonicalization with manual common-subexpression
    elimination.

    The column-level :func:`canonicalize` duplicates shared subtrees
    (hostport, port, netloc) inside one big CASE expression; under
    whole-stage codegen every duplicate is generated again, and fused with
    an upstream resolve projection the generated method crosses the JVM's
    64 KB limit — Spark then silently falls back to INTERPRETED evaluation
    for the engine's hottest stage.  Staged ``withColumns`` name each
    shared piece once, so codegen computes each into a local and the
    generated code stays small.  (CollapseProject will not re-inline them:
    it only collapses cheap or singly-referenced expressions.)

    Semantics are identical to :func:`canonicalize`; use this form on the
    high-volume scheduling path, the Column form for small/one-off data.

    The stage dicts are memoized per (src_col, out_col): Column trees are
    immutable name-based expressions, and rebuilding this chain through
    py4j cost a measured ~1.5 s of driver time per crawl wave.
    """
    stages, final, internals = _canonical_stage_plan(src_col)
    for st in stages:
        df = _plan_barrier(df.withColumns(st))
    return _plan_barrier(df.withColumn(out_col, final)).drop(*internals)


@functools.lru_cache(maxsize=32)
def _canonical_stage_plan(src_col: str):
    """(stage dicts, final column, internal names) for with_canonical_url."""
    s = defrag(F.trim(F.col(src_col)))
    internals = ["__after", "__scheme", "__netloc", "__hostport", "__rest",
                 "__host", "__portnum"]
    stages = (
        {
            "__after": _after_sep(s),
            "__scheme": url_scheme(s),
        },
        {
            "__netloc": F.substring_index(
                F.substring_index(F.col("__after"), "/", 1), "?", 1
            ),
        },
        {
            "__hostport": _hostport_of(F.col("__netloc")),
            "__rest": _rest_of(F.col("__after"), F.col("__netloc")),
        },
        {
            "__host": F.lower(F.substring_index(F.col("__hostport"), ":", 1)),
            "__portnum": _port_num_of(F.col("__hostport")),
        },
    )
    hostport, host, portnum = F.col("__hostport"), F.col("__host"), F.col("__portnum")
    bad_port = hostport.contains(":") & (
        portnum.isNull() | (portnum > 65535) | (portnum < 0)
    )
    valid = (
        F.col("__after").isNotNull()
        & _valid_scheme(F.col("__scheme"))
        & (host != F.lit(""))
        & ~bad_port
        & ~host.contains("[")
    )
    canon = F.concat(
        F.col("__scheme"), F.lit("://"), host,
        F.when(portnum.isNotNull(), F.concat(F.lit(":"), portnum.cast("string")))
        .otherwise(F.lit("")),
        F.col("__rest"),
    )
    final = F.when(valid, canon).otherwise(F.lit(None).cast("string"))
    return stages, final, internals


def url_hash(canon_url: Column) -> Column:
    """64-bit identity hash of a canonical URL (frontier join/bucket key)."""
    return F.xxhash64(canon_url)


def is_supported_scheme(canon_url: Column) -> Column:
    """http/https only (reference utils.py:147-162)."""
    return url_scheme(canon_url).isin("http", "https")


# --------------------------------------------------------------------------
# Scope predicates
# --------------------------------------------------------------------------


def in_scope_site(url: Column, base_url: str) -> Column:
    """Reference single-site scope (utils.py:165-193).

    Same scheme + same netloc + path-prefix with ``/`` boundary rules:
    base path ``/docs`` matches ``/docs`` and ``/docs/x`` but NOT ``/docs1``;
    a base path of ``/`` (or empty) matches everything on the host.
    """
    b = urlparse(base_url)
    base_path = b.path or "/"
    scheme_ok = url_scheme(url) == F.lit(b.scheme.lower())
    netloc_ok = url_netloc(url) == F.lit(b.netloc)
    cand_path = F.when(url_path(url) == F.lit(""), F.lit("/")).otherwise(url_path(url))
    if base_path == "/":
        path_ok = F.lit(True)
    elif not base_path.endswith("/"):
        path_ok = (cand_path == F.lit(base_path)) | cand_path.startswith(base_path + "/")
    else:
        path_ok = cand_path.startswith(base_path)
    return scheme_ok & netloc_ok & path_ok


def in_scope_domain(url: Column, domain_suffix: str) -> Column:
    """Web-scale generalization: host equals the suffix or ends with .suffix.

    The reference crawls a single site; a distributed frontier commonly
    scopes to a registrable domain instead.  ``domain_suffix='example.com'``
    admits ``example.com`` and ``a.example.com`` but not ``evilexample.com``.
    """
    h = url_host(url)
    suffix = domain_suffix.lower()
    return (h == F.lit(suffix)) | h.endswith("." + suffix)


def _java_escape(literal: str) -> str:
    """Escape a literal for Java regex (reference uses re.escape,
    scraper.py:84-92); Java rejects escapes of word characters so only
    metacharacters are escaped."""
    return re.sub(r"([\\^$.|?*+()\[\]{}])", r"\\\1", literal)


def include_exclude_filter(
    url: Column,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
) -> Column:
    """P3/P4: URL must contain >=1 include substring and no exclude substring
    (reference scraper.py:84-92, 309-312: escaped-literal alternation)."""
    cond = F.lit(True)
    if include_patterns:
        alt = "|".join(_java_escape(p) for p in include_patterns)
        cond = cond & url.rlike(alt)
    if exclude_patterns:
        alt = "|".join(_java_escape(p) for p in exclude_patterns)
        cond = cond & ~url.rlike(alt)
    return cond


def is_valid_link(
    canon_url: Column,
    base_url: str | None = None,
    domain_suffix: str | None = None,
    include_patterns: list[str] | None = None,
    exclude_patterns: list[str] | None = None,
) -> Column:
    """P5: full link validator (reference scraper.py:287-314) over an
    already-canonicalized URL column."""
    cond = canon_url.isNotNull() & is_supported_scheme(canon_url)
    if base_url:
        cond = cond & in_scope_site(canon_url, base_url)
    if domain_suffix:
        cond = cond & in_scope_domain(canon_url, domain_suffix)
    return cond & include_exclude_filter(canon_url, include_patterns, exclude_patterns)


# --------------------------------------------------------------------------
# Relative-reference resolution (native subset of urljoin)
# --------------------------------------------------------------------------


def has_dot_segment(href: Column) -> Column:
    """True iff the href contains an RFC-3986 dot segment — ``.`` or ``..``
    as a COMPLETE path segment — the only relative shapes the native
    resolver cannot handle (they need path normalization, reference
    scraper.py:203 via urljoin).

    This is the single routing predicate: :func:`resolve_href` NULLs
    exactly these hrefs and ``operators/schedule.resolve_candidates``
    routes exactly these to :func:`resolve_href_udf`, so the symmetric
    difference between "routed to UDF" and "native NULL fallback" is
    empty.  Hrefs with a ``.`` adjacent to ``/`` that is NOT a dot segment
    (``v1.2./spec``, ``a.b./c``, ``?next=./x``) resolve natively instead
    of being silently dropped.  String ops only — no per-href regex in the
    hot path.
    """
    return (
        (href == F.lit(".")) | (href == F.lit(".."))
        | href.startswith("./") | href.startswith("../")
        | href.endswith("/.") | href.endswith("/..")
        | href.contains("/./") | href.contains("/../")
    )


def url_dirname_expr(url: Column) -> Column:
    """Directory of a URL: drop the last path segment, ensure trailing '/'
    (reference utils.py:58-90). Query/params are dropped like urlunparse
    with empty params/query."""
    base = F.concat(url_scheme(url), F.lit("://"), url_netloc(url), url_path(url))
    trimmed = F.regexp_replace(base, r"(://[^/]*(?:/[^/]*)*)/[^/]*$", "$1")
    # When the path had no '/', trimmed == base; re-extract scheme://netloc + dir
    dir_ = F.when(
        url_path(url).contains("/"),
        F.concat(
            url_scheme(url),
            F.lit("://"),
            url_netloc(url),
            F.regexp_replace(url_path(url), r"/[^/]*$", ""),
        ),
    ).otherwise(F.concat(url_scheme(url), F.lit("://"), url_netloc(url)))
    return F.when(dir_.endswith("/"), dir_).otherwise(F.concat(dir_, F.lit("/")))


def with_resolved_href(df, page_col: str, href_col: str, out_col: str = "resolved"):
    """DataFrame-level href resolution with manual CSE (same rationale as
    :func:`with_canonical_url`: the Column form duplicates the page-dirname
    subtree, and downstream substitution multiplies it into generated code
    beyond the JVM's 64 KB method limit).  Semantics identical to
    :func:`resolve_href`; dot-segment hrefs resolve to NULL here.
    Stage dicts memoized like :func:`with_canonical_url`."""
    stages, final, internals = _resolved_stage_plan(page_col, href_col)
    for st in stages:
        df = _plan_barrier(df.withColumns(st))
    return _plan_barrier(df.withColumn(out_col, final)).drop(*internals)


@functools.lru_cache(maxsize=32)
def _resolved_stage_plan(page_col: str, href_col: str):
    """(stage dicts, final column, internal names) for with_resolved_href."""
    page, href = F.col(page_col), F.col(href_col)
    internals = ["__h", "__psch", "__pnl", "__ppath", "__pdir0", "__pdir"]
    stages = (
        {
            "__h": F.trim(href),
            "__psch": url_scheme(page),
            "__pnl": url_netloc(page),
            "__ppath": url_path(page),
        },
        {
            # page directory: drop the last path segment (utils.py:58-90)
            "__pdir0": F.when(
                F.col("__ppath").contains("/"),
                F.concat(
                    F.col("__psch"), F.lit("://"), F.col("__pnl"),
                    F.regexp_replace(F.col("__ppath"), r"/[^/]*$", ""),
                ),
            ).otherwise(
                F.concat(F.col("__psch"), F.lit("://"), F.col("__pnl"))
            ),
        },
        {
            "__pdir": F.when(
                F.col("__pdir0").endswith("/"), F.col("__pdir0")
            ).otherwise(F.concat(F.col("__pdir0"), F.lit("/"))),
        },
    )
    h = F.col("__h")
    has_scheme = h.contains(":") & _valid_scheme(
        F.lower(F.substring_index(h, ":", 1))
    )
    origin = F.concat(F.col("__psch"), F.lit("://"), F.col("__pnl"))
    final = (
        F.when(has_dot_segment(h), F.lit(None).cast("string"))
        .when(has_scheme, h)
        .when(h.startswith("//"), F.concat(F.col("__psch"), F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        # query-only: replace the page's query, keep its path (urljoin)
        .when(h.startswith("?"), F.concat(origin, F.col("__ppath"), h))
        # fragment-only: the page itself (urljoin + defrag)
        .when(h.startswith("#"), defrag(page))
        .when(h == F.lit(""), page)
        .otherwise(F.concat(F.col("__pdir"), h))
    )
    return stages, final, internals


def resolve_href(page_url: Column, href: Column) -> Column:
    """Resolve an href against its page URL — native subset of urljoin
    (reference scraper.py:203).

    Handles: absolute URLs, protocol-relative ``//host/p``, root-relative
    ``/p``, query-only ``?q=1``, fragment-only ``#sec``, and plain relative
    ``p`` (resolved against the page directory).  True dot-segment hrefs
    (:func:`has_dot_segment`) fall back to NULL here and are handled by
    the pandas-UDF path; ``operators/schedule.resolve_candidates`` routes
    exactly those through :func:`resolve_href_udf`.
    """
    href_t = F.trim(href)
    page_scheme = url_scheme(page_url)
    origin = F.concat(page_scheme, F.lit("://"), url_netloc(page_url))
    # scheme-prefixed iff text before the first ':' is a valid scheme
    # (substring+translate — no per-href regex in the hot path)
    has_scheme = href_t.contains(":") & _valid_scheme(
        F.lower(F.substring_index(href_t, ":", 1))
    )
    return (
        F.when(has_dot_segment(href_t), F.lit(None).cast("string"))
        .when(has_scheme, href_t)
        .when(href_t.startswith("//"), F.concat(page_scheme, F.lit(":"), href_t))
        .when(href_t.startswith("/"), F.concat(origin, href_t))
        .when(href_t.startswith("?"), F.concat(origin, url_path(page_url), href_t))
        .when(href_t.startswith("#"), defrag(page_url))
        .when(href_t == F.lit(""), page_url)
        .otherwise(F.concat(url_dirname_expr(page_url), href_t))
    )


# --------------------------------------------------------------------------
# Filename / export-path mapping (native)
# --------------------------------------------------------------------------


def url_to_filename_expr(url: Column) -> Column:
    """netloc+path with '/' and '.' -> '_', '_' runs collapsed, ends trimmed
    (reference utils.py:30-55)."""
    base = F.concat(url_netloc(url), url_path(url))
    underscored = F.translate(base, "/.", "__")
    collapsed = F.regexp_replace(underscored, "_+", "_")
    return F.regexp_replace(collapsed, "^_|_$", "")


def randomstring_to_filename_expr(s: Column) -> Column:
    """Keep letters/digits/-_. ; space -> '_'; drop the rest
    (reference utils.py:10-27; Python isalnum == unicode letters+digits)."""
    spaced = F.regexp_replace(s, " ", "_")
    return F.regexp_replace(spaced, r"[^\p{L}\p{N}\-_.]", "")


def export_relpath_expr(url: Column, base_url: str | None = None) -> Column:
    """Per-page export path (reference export_manager.py:281-290): strip the
    base_url then the scheme; trailing '/' (or empty) -> 'index.md', else
    append '.md'."""
    u = url
    if base_url:
        u = F.replace(u, F.lit(base_url), F.lit(""))
    u = F.regexp_replace(u, r"^https?://", "")
    return F.when(
        (u == F.lit("")) | u.endswith("/"), F.concat(u, F.lit("index.md"))
    ).otherwise(F.concat(u, F.lit(".md")))


# --------------------------------------------------------------------------
# Pandas-UDF parity path (full urllib.parse semantics)
# --------------------------------------------------------------------------


def _normalize_one(url: str | None) -> str | None:
    """Exact reference normalize_url (utils.py:109-144), None for invalid."""
    if url is None or not isinstance(url, str):
        return None
    candidate = url.strip()
    if not candidate:
        return None
    try:
        parsed = urlparse(candidate)
        if not parsed.scheme or not parsed.netloc:
            return None
        hostname = (parsed.hostname or "").lower()
        if not hostname:
            return None
        netloc = hostname
        if parsed.port is not None:  # raises ValueError on junk ports
            netloc = f"{netloc}:{parsed.port}"
        path = parsed.path or ""
        return urlunparse((parsed.scheme.lower(), netloc, path, parsed.params, parsed.query, ""))
    except ValueError:
        return None


@pandas_udf(StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """Arrow-vectorized exact-urllib canonicalization (defrag + normalize)."""
    return urls.map(lambda u: _normalize_one(u.split("#", 1)[0]) if isinstance(u, str) else None)


@pandas_udf(StringType())
def resolve_href_udf(page_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Arrow-vectorized full urljoin + defrag (reference scraper.py:203-204)."""

    def _resolve(page: str, href: str) -> str | None:
        if not isinstance(page, str) or not isinstance(href, str):
            return None
        return urljoin(page, href).split("#", 1)[0]

    return pd.Series([_resolve(p, h) for p, h in zip(page_urls, hrefs)])
