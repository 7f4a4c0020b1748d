"""Per-host politeness budgets and robots gating, skew-safe.

The reference's politeness is *global*: a requests/min window plus a fixed
inter-request delay on a single thread (scraper.py:428-475).  A distributed
frontier needs the budget *per host* — and the corpus (like the real web) is
Zipf-skewed: one hot host can own half the frontier, so a plain
``row_number() OVER (PARTITION BY host)`` funnels half the data through one
task.

``politeness_cap`` keeps EXACT top-``budget``-per-host semantics with a
bounded worst-case group via two phases (SURVEY.md §7 "hard parts"):

  phase 1  window over (host, salt) — salt = url_hash mod S spreads a hot
           host over S tasks; each salt shard keeps its own best ``budget``
           rows.  Any row in the true per-host top-``budget`` is in its
           shard's top-``budget``, so phase 1 never discards a winner.
  phase 2  window over (host) on the survivors — at most S*budget rows per
           host regardless of frontier skew — takes the true top ``budget``.

Priority order is (priority, depth, url): lower priority first, then BFS
depth, then canonical URL — the window-ranked micro-batch priority queue of
the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import urlkit

PRIORITY_COLS = ["priority", "depth", "url"]


def politeness_cap(
    pending: DataFrame,
    host_budget: int,
    salt_shards: int = 8,
    priority_cols: list[str] | None = None,
) -> DataFrame:
    """Exact per-host top-``budget`` dequeue with skew-bounded windows."""
    order = [F.col(c) for c in (priority_cols or PRIORITY_COLS) if c in pending.columns]
    salted = pending.withColumn(
        "__salt", F.pmod(F.col("url_hash"), F.lit(salt_shards)).cast("int")
    )
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= host_budget)
        .drop("__r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= host_budget)
        .drop("__r2", "__salt")
    )


# per-host budget for hosts absent from a budgets table when no default is
# given: effectively uncapped (larger than any real wave)
HOST_BUDGET_UNCAPPED = 1 << 31


def politeness_cap_per_host(
    pending: DataFrame,
    budgets: DataFrame,
    default_budget: int | None = None,
    salt_shards: int = 8,
    n_hosts_hint: int | None = None,
    priority_cols: list[str] | None = None,
) -> DataFrame:
    """``politeness_cap`` with a PER-HOST budget table ``(host, budget)``
    — the adaptive-politeness form: a host declaring ``Crawl-delay: 30``
    (``crawl_delay_budgets``) or answering 429/5xx
    (``adaptive_host_budgets``) gets a smaller wave allowance than a
    healthy one.  Hosts absent from the table get ``default_budget``
    (None = uncapped).

    Exactness under the same two-phase argument as ``politeness_cap``:
    any row in its host's true top-``b(h)`` is in its salt shard's
    top-``b(h)``, so phase 1 never discards a winner; phase 2 sees at
    most ``salt_shards * b(h)`` rows per host.  The budgets table is
    O(distinct hosts) — broadcast at or below ``ROBOTS_BROADCAST_MAX``,
    pinned shuffled-hash above (the robots_filter contract)."""
    order = [F.col(c) for c in (priority_cols or PRIORITY_COLS)
             if c in pending.columns]
    b = budgets.select("host", F.col("budget").cast("int").alias("__hb"))
    if n_hosts_hint is None or n_hosts_hint <= ROBOTS_BROADCAST_MAX:
        b = F.broadcast(b)
    else:
        b = b.hint("shuffle_hash")
    dflt = int(default_budget) if default_budget is not None \
        else HOST_BUDGET_UNCAPPED
    salted = (
        pending.join(b, "host", "left")
        .withColumn("__b", F.coalesce(F.col("__hb"), F.lit(dflt)))
        .withColumn(
            "__salt", F.pmod(F.col("url_hash"), F.lit(salt_shards)).cast("int")
        )
    )
    w1 = Window.partitionBy("host", "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("__b"))
        .drop("__r1")
    )
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= F.col("__b"))
        .drop("__r2", "__salt", "__hb", "__b")
    )


def crawl_delay_budgets(
    delays: DataFrame,
    window_seconds: float = 60.0,
    max_budget: int | None = None,
    host_col: str = "host",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Turn per-host ``Crawl-delay`` seconds (sources/robots.py
    ``parse_crawl_delay``) into wave budgets for a ``window_seconds``
    dequeue cadence: ``max(1, floor(window / delay))`` requests per wave.
    NULL / non-positive delays are dropped (those hosts fall back to the
    cap's ``default_budget``); ``max_budget`` optionally clamps the top."""
    out = (
        delays.filter(
            F.col(delay_col).isNotNull() & (F.col(delay_col) > 0)
        )
        .select(
            F.col(host_col).alias("host"),
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(window_seconds)) / F.col(delay_col))
                .cast("int"),
            ).alias("budget"),
        )
    )
    if max_budget is not None:
        out = out.withColumn(
            "budget", F.least(F.col("budget"), F.lit(int(max_budget)))
        )
    return out


def adaptive_host_budgets(
    failed_docs: DataFrame,
    base_budget: int,
    floor: int = 1,
    max_halvings: int = 5,
    url_col: str = "url",
) -> DataFrame:
    """Exponential-backoff budgets from observed per-host failures:
    ``budget = max(floor, base_budget >> min(n_failed, max_halvings))``.
    Feed it the engine's failed docs (``docs().filter("status =
    'failed'")``) between runs — hosts that answered 429/5xx/timeouts get
    their next-run wave allowance halved per failure.  One
    partial-aggregated shuffle of (host, count); integer arithmetic so
    the budgets are engine-reproducible."""
    return (
        failed_docs.select(urlkit.url_host(F.col(url_col)).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("__nf"))
        .select(
            "host",
            F.greatest(
                F.lit(int(floor)),
                F.expr(
                    f"CAST({int(base_budget)} AS INT) div "
                    f"CAST(pow(2, least(__nf, {int(max_halvings)})) AS INT)"
                ),
            ).cast("int").alias("budget"),
        )
    )


def global_cap(batch: DataFrame, limit: int | None,
               priority_cols: list[str] | None = None) -> DataFrame:
    """Reference LIMIT-batched dequeue (database_manager.py:217-224) as a
    TakeOrderedAndProject: cap the whole wave at ``limit`` URLs by priority.
    Use for rate-limit-style global budgets; None = uncapped."""
    if limit is None:
        return batch
    order = [F.col(c) for c in (priority_cols or PRIORITY_COLS) if c in batch.columns]
    return batch.orderBy(*order).limit(limit)


class Pacer:
    """O3/O4: time-based global politeness (reference scraper.py:428-475).

    The reference gates each request serially: ``sleep(delay)`` before
    every fetch (scraper.py:470-475), and after ``rate_limit`` requests
    inside a 60 s window, ``sleep(60 - elapsed)`` then reset
    (scraper.py:455-468; sleep-math tests tests/test_scraper.py:1219-1280).
    A wave engine amortizes both driver-side: the wave dequeue is capped at
    the window's REMAINING budget (so no wave overshoots the
    requests/minute contract), the per-request delay becomes one
    ``sleep(delay * n)`` per wave, and the window sleep fires when the
    budget is exhausted.  ``clock``/``sleeper`` are injectable so tests
    assert the sleep math without wall-clock time.
    """

    WINDOW_SECONDS = 60.0

    def __init__(self, rate_limit: int = 0, delay: float = 0.0,
                 clock=None, sleeper=None):
        import time

        self.rate_limit = int(rate_limit or 0)
        self.delay = float(delay or 0.0)
        self._clock = clock or time.monotonic
        self._sleep = sleeper or time.sleep
        self._window_start: float | None = None
        self._sent_in_window = 0
        self.sleeps: list[float] = []   # log for tests/metrics

    def wave_budget(self) -> int | None:
        """Max URLs the next wave may dequeue (None = uncapped)."""
        if not self.rate_limit:
            return None
        return max(1, self.rate_limit - self._sent_in_window)

    def after_wave(self, n_requests: int) -> None:
        """Account ``n_requests`` (failed fetches count too,
        scraper.py:493,535) and sleep per the reference math."""
        if n_requests <= 0:
            return
        if self.delay:
            self._do_sleep(self.delay * n_requests)
        if not self.rate_limit:
            return
        if self._window_start is None:
            self._window_start = self._clock()
        self._sent_in_window += n_requests
        if self._sent_in_window >= self.rate_limit:
            elapsed = self._clock() - self._window_start
            if elapsed < self.WINDOW_SECONDS:
                self._do_sleep(self.WINDOW_SECONDS - elapsed)
            self._window_start = self._clock()
            self._sent_in_window = 0

    def _do_sleep(self, seconds: float) -> None:
        self.sleeps.append(seconds)
        self._sleep(seconds)


def robots_allowed(url: Column, disallow: Column,
                   allow: Column | None = None) -> Column:
    """RFC 9309 rule precedence: the most specific (longest) matching
    prefix wins; ``Allow`` wins octet-length ties.  NULL disallow (host
    absent from the rules table) = allowed, like a missing robots.txt.
    Without an ``allow`` column the gate degrades to the prefix-only
    disallow check (pre-round-4 rules tables)."""
    path = urlkit.url_path(url)

    def longest_match(rules: Column) -> Column:
        # max octet length of a matching prefix, -1 when none match
        return F.aggregate(
            rules,
            F.lit(-1),
            lambda acc, p: F.greatest(
                acc,
                F.when(path.startswith(p), F.length(p)).otherwise(F.lit(-1)),
            ),
        )

    dmax = longest_match(disallow)
    if allow is None:
        return F.when(disallow.isNull(), F.lit(True)).otherwise(dmax < 0)
    amax = F.when(allow.isNull(), F.lit(-1)).otherwise(longest_match(allow))
    return F.when(disallow.isNull(), F.lit(True)).otherwise(
        (dmax < 0) | (amax >= dmax)
    )


# Below this many covered hosts the rules table is broadcast (a domain- or
# site-scoped crawl has tens of hosts; even 10^6 rules rows is ~100 MB) —
# the gate then adds no shuffle.  Above it — a domain-UNBOUNDED web crawl
# sees 10^7-10^8 distinct hosts — the broadcast would be tens of GB per
# executor, so the gate degrades to a shuffled left join on ``host``
# (mirrors schedule.BROADCAST_SEEN_MAX on the URL-seen anti-join).
ROBOTS_BROADCAST_MAX = 1_000_000


# Unranked hosts sort after every ranked one (a fresh host has no authority
# signal yet); large enough that no negated PageRank micro-unit rank — ranks
# are bounded by n_nodes * unit < 2^63 — can collide with it.
HOST_PRIORITY_UNRANKED = 2**62


def host_priority_join(
    pending: DataFrame,
    priorities: DataFrame | None,
    n_hosts_hint: int | None = None,
) -> DataFrame:
    """Attach the dequeue ``priority`` column to a frontier batch.

    ``priorities`` is a per-host table ``(host, priority)`` — lower
    dequeues first (e.g. ``linkgraph.rank_to_priority``'s negated PageRank
    micro-units, so high-authority hosts are crawled first).  ``None``
    keeps the default queue discipline: BFS depth.  Hosts absent from the
    table get ``HOST_PRIORITY_UNRANKED`` (after every ranked host); ties
    still break by (depth, url) via PRIORITY_COLS.

    Same join-strategy contract as ``robots_filter``: the table is
    O(distinct hosts), so it is broadcast at or below
    ``ROBOTS_BROADCAST_MAX`` covered hosts and pinned to a shuffled-hash
    join above (a domain-unbounded crawl has 10^7-10^8 hosts — never
    re-promote to a tens-of-GB broadcast)."""
    if priorities is None:
        return pending.withColumn("priority", F.col("depth"))
    prio = priorities.select(
        "host", F.col("priority").cast("long").alias("__hp")
    )
    if n_hosts_hint is None or n_hosts_hint <= ROBOTS_BROADCAST_MAX:
        prio = F.broadcast(prio)
    else:
        prio = prio.hint("shuffle_hash")
    return (
        pending.join(prio, "host", "left")
        .withColumn(
            "priority",
            F.coalesce(F.col("__hp"), F.lit(HOST_PRIORITY_UNRANKED)),
        )
        .drop("__hp")
    )


def robots_filter(
    batch: DataFrame,
    robots: DataFrame | None,
    n_hosts_hint: int | None = None,
) -> DataFrame:
    """Gate a frontier batch on a per-host rules table
    ``(host, disallow array<string>, allow array<string>)`` with RFC 9309
    longest-match precedence (2-column legacy tables gate disallow-only).

    ``n_hosts_hint`` is a join-strategy hint (the crawl engine supplies its
    covered-host counter): at or below ``ROBOTS_BROADCAST_MAX`` the rules
    side is broadcast, above it the join shuffles both sides on ``host`` —
    host-keyed, so the hot-host skew of the *frontier* side is the same
    skew the politeness window already bounds, and AQE's skew-join split
    applies.  ``None`` (unknown cardinality, e.g. a manually-supplied
    table) keeps the broadcast, matching the reference's domain-scoped
    deployments."""
    if robots is None:
        return batch
    from crawler_to_md_spark.sources.robots import ensure_rules_cols

    rules = ensure_rules_cols(robots)
    if n_hosts_hint is None or n_hosts_hint <= ROBOTS_BROADCAST_MAX:
        rules = F.broadcast(rules)
    else:
        # pin shuffled-hash with the one-row-per-host rules side as the
        # build side: above the threshold the stats-based planner would
        # normally shuffle anyway, but checkpointed rules frames can carry
        # unknown/underestimated sizes and must never be re-promoted to a
        # tens-of-GB broadcast
        rules = rules.hint("shuffle_hash")
    joined = batch.join(rules, "host", "left")
    return joined.filter(
        robots_allowed(F.col("url"), F.col("disallow"), F.col("allow"))
    ).drop("disallow", "allow")
