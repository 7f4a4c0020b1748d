"""robots.txt source: fetch per-host rules and build the robots gate table.

The north rule calls for "per-host politeness buckets and robots.txt gating";
``operators/politeness.robots_filter`` already gates the frontier on a
``(host string, disallow array<string>)`` rules table — this module is the
production producer of that table.  (The reference itself has no robots
support; the gate is one of this engine's additions, so the parsing below
follows RFC 9309 rather than any reference code.)

Pipeline shape, Spark-first: the distinct-host set is orders of magnitude
smaller than the frontier (one row per registrable host), so robots fetching
is a tiny ``mapInPandas`` stage — one pooled transport session per
partition, one GET per host — and the resulting rules table broadcasts into
the gate join (politeness.py:139-149).  At 10^10 frontier rows and ~10^6
hosts the rules table is a few hundred MB: still broadcastable, refreshed
per crawl run, never per wave.

RFC 9309 subset implemented (documented simplifications):

* group selection: the group whose ``User-agent`` token is the longest
  case-insensitive substring of our agent product token wins; ``*`` is the
  fallback.  Multiple groups with the same specificity merge (RFC 9309 §2.2.1).
* ``Disallow`` path prefixes only.  ``Allow`` overrides are NOT modeled —
  the gate errs conservative (a path both allowed and disallowed stays
  disallowed), which for a politeness gate is the safe direction.
* an empty ``Disallow:`` value (allow-all marker) contributes no prefix.
* unreachable / non-200 robots.txt → no rules row → host fully allowed,
  matching the NULL semantics of ``robots_allowed`` (politeness.py:130-136)
  and the RFC's "unavailable = allow" for 4xx.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.sources.fetch import FetchPolicy, Transport

ROBOTS_RESULT_DDL = ("host string, disallow array<string>, "
                     "allow array<string>")

#: the rules-frame contract every gate/union site normalizes to
RULES_COLS = ["host", "disallow", "allow"]


def _robots_groups(
    text: str,
) -> list[tuple[list[str], list[str], list[str], float | None]]:
    """Parse robots.txt into groups of (agent tokens, disallow prefixes,
    allow prefixes, crawl-delay seconds or None).  A line's trailing ``#``
    comment is stripped; blank lines only end a group's user-agent header
    run, per RFC 9309 §2.2; ``Crawl-delay`` is the de-facto extension most
    large crawlers honor."""
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] | None = None
    cur_allow: list[str] = []
    cur_delay: float | None = None
    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if cur_dis is not None:
                # a rules run ended: close the group, start a new header run
                groups.append((cur_agents, cur_dis, cur_allow, cur_delay))
                cur_agents, cur_dis, cur_allow, cur_delay = [], None, [], None
            cur_agents.append(value.lower())
        elif field in ("disallow", "allow", "crawl-delay", "sitemap"):
            if field == "sitemap":
                continue             # global directive, not part of a group
            if not cur_agents:
                continue             # rules before any user-agent: ignored
            if cur_dis is None:
                cur_dis = []
            if field == "disallow" and value:
                cur_dis.append(value)
            elif field == "allow" and value:
                cur_allow.append(value)
            elif field == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass             # malformed delay: ignore the line
    if cur_agents:
        groups.append((cur_agents, cur_dis or [], cur_allow, cur_delay))
    return groups


def _specificity(tokens: list[str], agent_lc: str) -> int:
    best = -1
    for t in tokens:
        if t == "*":
            best = max(best, 0)
        elif t and t in agent_lc:
            best = max(best, len(t))
    return best


def parse_robots(text: str, agent: str = "*") -> list[str]:
    """Disallow path prefixes applying to ``agent`` from a robots.txt body.

    Returns the merged prefixes of the most specific matching group(s):
    the longest ``User-agent`` token that is a substring of ``agent``
    (case-insensitive), falling back to the ``*`` group(s).
    """
    agent_lc = (agent or "*").lower()
    groups = _robots_groups(text)
    best_spec = max((_specificity(a, agent_lc) for a, _, _, _ in groups),
                    default=-1)
    if best_spec < 0:
        return []
    merged: list[str] = []
    for tokens, rules, _, _ in groups:
        if _specificity(tokens, agent_lc) == best_spec:
            merged.extend(p for p in rules if p not in merged)
    return merged


def parse_allow(text: str, agent: str = "*") -> list[str]:
    """``Allow`` path prefixes applying to ``agent`` — same group
    selection as :func:`parse_robots`.  Fed to the gate's RFC 9309
    longest-match precedence (politeness.robots_allowed): the most
    specific matching rule wins, Allow winning octet-length ties."""
    agent_lc = (agent or "*").lower()
    groups = _robots_groups(text)
    best_spec = max((_specificity(a, agent_lc) for a, _, _, _ in groups),
                    default=-1)
    if best_spec < 0:
        return []
    merged: list[str] = []
    for tokens, _, allows, _ in groups:
        if _specificity(tokens, agent_lc) == best_spec:
            merged.extend(p for p in allows if p not in merged)
    return merged


def ensure_rules_cols(df: "DataFrame") -> "DataFrame":
    """Normalize any rules frame to ``(host, disallow, allow)`` — manual
    tables and pre-round-4 committed stores carry no ``allow`` column."""
    out = df
    if "allow" not in out.columns:
        out = out.withColumn("allow", F.lit(None).cast("array<string>"))
    return out.select(*RULES_COLS)


def parse_sitemaps(text: str) -> list[str]:
    """``Sitemap:`` directive URLs from a robots.txt body, in document
    order, first-occurrence deduped.  Per the sitemaps.org protocol the
    directive is GLOBAL (independent of any user-agent group), so this
    reads every line rather than the selected group — reference-free
    engine addition feeding sitemap.seeds_from_robots."""
    out: list[str] = []
    seen: set[str] = set()
    for raw_line in (text or "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        field, colon, value = line.partition(":")
        if colon and field.strip().lower() == "sitemap":
            v = value.strip()
            if v and v not in seen:
                seen.add(v)
                out.append(v)
    return out


def parse_crawl_delay(text: str, agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds applying to ``agent``, or None when the
    matching group(s) declare none.  Same group selection as
    ``parse_robots``; when several groups tie on specificity the LARGEST
    delay wins (the conservative read).  Feeds
    ``politeness.crawl_delay_budgets`` → per-host wave budgets."""
    agent_lc = (agent or "*").lower()
    groups = _robots_groups(text)
    best_spec = max((_specificity(a, agent_lc) for a, _, _, _ in groups),
                    default=-1)
    if best_spec < 0:
        return None
    delays = [
        d for tokens, _, _, d in groups
        if _specificity(tokens, agent_lc) == best_spec and d is not None
    ]
    return max(delays) if delays else None


def requests_text_transport() -> Transport:
    """Transport returning the body for ANY content type (robots.txt is
    text/plain, which the HTML-gated page transport deliberately drops).
    Import-gated like ``requests_transport``; tests inject fakes."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "requests is not installed in this environment; inject a "
            "transport (see tests/test_robots.py) or install requests "
            "for a live deployment"
        ) from e

    session = requests.Session()

    def transport(url, timeout, proxy, want_body):  # pragma: no cover
        proxies = {"http": proxy, "https": proxy} if proxy else None
        r = session.get(url, timeout=timeout, proxies=proxies)
        return r.status_code, r.headers.get("Content-Type"), (
            r.content if want_body else None), None

    return transport


def fetch_robots(
    hosts: DataFrame,
    policy: FetchPolicy | None = None,
    transport_factory: Callable[[], Transport] = requests_text_transport,
    agent: str = "*",
    scheme: str = "https",
    host_col: str = "host",
    emit_all: bool = False,
    with_sitemaps: bool = False,
) -> DataFrame:
    """Fetch + parse ``robots.txt`` for every distinct host in ``hosts``.

    One ``mapInPandas`` stage: each task opens one transport session and
    GETs ``{scheme}://{host}/robots.txt`` per host; the body is parsed in
    the same task (no second pass, no driver round-trip).  Hosts whose
    robots.txt is unreachable or non-200 produce NO output row — absent
    from the rules table means fully allowed (robots_allowed NULL
    semantics).  With ``emit_all=True`` those hosts instead produce a
    ``disallow IS NULL`` row (same allowed semantics) so the result doubles
    as a COVERAGE table: one row per attempted host, the shape the crawl
    engine's anti-join coverage tracking needs (store/schemas.py
    ROBOTS_SCHEMA).  The result feeds ``politeness.robots_filter`` /
    ``CrawlEngine(robots=...)`` directly.  ``with_sitemaps=True`` adds a
    ``sitemaps array<string>`` column (the body's global ``Sitemap:``
    directives) parsed from the SAME fetch — no second request per host.
    """
    pol = policy or FetchPolicy()

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        transport = transport_factory()   # one session per partition/task
        for pdf in batches:
            out_host: list[str] = []
            out_rules: list[list[str] | None] = []
            out_allow: list[list[str] | None] = []
            out_maps: list[list[str] | None] = []
            for host in pdf[host_col]:
                url = f"{scheme}://{host}/robots.txt"
                rules: list[str] | None = None
                allows: list[str] | None = None
                maps: list[str] | None = None
                try:
                    status, _ct, body, err = transport(
                        url, pol.timeout, pol.proxy, True)
                except Exception:     # connection failure = no rules
                    status, body, err = None, None, None
                if err is None and status == 200 and body is not None:
                    text = body.decode("utf-8", errors="replace") if isinstance(
                        body, (bytes, bytearray)) else str(body)
                    rules = parse_robots(text, agent)
                    allows = parse_allow(text, agent)
                    maps = parse_sitemaps(text)
                if rules is None and not emit_all:
                    continue
                out_host.append(str(host))
                out_rules.append(rules)
                out_allow.append(allows)
                out_maps.append(maps)
            # explicit object dtype: an all-miss batch would otherwise
            # produce empty float64 columns Arrow cannot cast to
            # list<string>
            cols = {"host": pd.Series(out_host, dtype="object"),
                    "disallow": pd.Series(out_rules, dtype="object"),
                    "allow": pd.Series(out_allow, dtype="object")}
            if with_sitemaps:
                cols["sitemaps"] = pd.Series(out_maps, dtype="object")
            yield pd.DataFrame(cols)

    ddl = ROBOTS_RESULT_DDL + (", sitemaps array<string>"
                               if with_sitemaps else "")
    return (
        hosts.select(F.col(host_col).alias(host_col))
        .distinct()
        .mapInPandas(run, schema=ddl)
    )
