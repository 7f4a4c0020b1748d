"""The crawl engine: frontier waves as snapshot-committed micro-batches.

Reference lifecycle (scraper.py:364-598): a driver ``while True`` loop —
dequeue <=200 unvisited, fetch each serially, parse once, classify failures,
commit one SQLite transaction, insert discovered links, repeat until the
frontier drains.  That loop *is* a micro-batch pipeline; here each wave is
one declarative DataFrame plan ending in one atomic snapshot commit:

    pending --(politeness window-rank)--> batch            [L1 + north-rule PQ]
           --(left join corpus)--------> simulated fetch   [S3/J3]
           --(when() cascade)----------> outcome/retry     [O5, scraper.py:496-549]
           --(explode link spans)------> candidates        [F8/A4]
           --(resolve+canonicalize+validate)               [F1/F2/P1-P5]
           --(bloom prefilter + exact anti-join)           [J2, north-rule]
           --(ordered seq)-------------> new frontier rows [L2 analog]
           --(commit snapshot)---------> links/docs/metrics [O7]

Semantics preserved from the reference (tests mirror tests/test_scraper.py):
  * every dequeued URL is marked visited, even on failure (scraper.py:479)
  * 404/403/non-HTML: visited, no page row, retry untouched (scraper.py:496-528)
  * 5xx/429/connection-error/empty-content: retry_count+1 and a NULL-spans
    doc row with failure metadata (scraper.py:505-549,561-579; metadata
    shape scraper.py:166-183)
  * empty-content pages still contribute out-links — the one-parse
    architecture (scraper.py:551-558, IMPROVEMENTS.md:23-31)
  * success resets retry_count to 0 (database_manager.py:355-371)
  * resume requeues failed pages with retry_count < max_retries
    (scraper.py:404-415, database_manager.py:294-317)

Fetch is a PLUGGABLE stage (operators/fetchstage.py): the sandbox default is
an equi-join against the synthetic corpus on ``url`` (no network here); a
production deployment passes ``http_extract_stage(...)`` — the pooled HTTP
``mapInPandas`` stage (sources/fetch.py, reference transport retry policy
scraper.py:98-111) fused with the one-parse extraction UDF carrying the
config's CSS include/exclude filters (P6/P7).  A corpus row with
``transient_failures_remaining > n`` fails the n-th app-level attempt with
503 and succeeds after — exercising the retry/requeue path end-to-end.

Ordering: the reference's intra-wave order is Python-set iteration order —
nondeterministic across runs (scraper.py:589-592, SURVEY.md §2.6).  The
engine defines the canonical order (depth, url) and verifies wave-partition
plus seen-set equality, which is exactly what IS deterministic in the
reference.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import urlkit
from crawler_to_md_spark.functions.bloom import BloomShardStore
from crawler_to_md_spark.operators import schedule
from crawler_to_md_spark.operators.crawlhealth import drop_trap_urls
from crawler_to_md_spark.operators.politeness import (
    Pacer,
    global_cap,
    host_priority_join,
    politeness_cap,
    politeness_cap_per_host,
    robots_filter,
)
from crawler_to_md_spark.operators.seq import with_ordered_seq
from crawler_to_md_spark.store.schemas import (
    DOCS_SCHEMA,
    LINKS_SCHEMA,
    METRICS_SCHEMA,
    ROBOTS_SCHEMA,
)
from crawler_to_md_spark.store.warehouse import (
    AppendUpdate,
    BucketedUpdate,
    LiteralAppend,
    SnapshotStore,
)

RETRIABLE_STATUSES = (429, 500, 502, 503, 504)  # scraper.py:101-106 forcelist

_PROFILE = bool(os.environ.get("CMS_PROFILE"))


@dataclass
class _WaveDelta:
    """Read-your-writes view of the wave whose COMMIT is still in flight.

    The pipelined run loop starts wave k+1's dequeue while wave k's
    snapshot commit writes its buckets; the next wave's frontier view is
    the last-COMMITTED snapshot composed with this in-memory delta:
    ``fetched``'s urls are now visited (every dequeued URL is marked
    visited, O2), and ``new_links`` (persisted) are new unvisited rows
    plus new seen-set members.  Both frames are checkpointed/persisted,
    so composing them costs one broadcast join + one union — no
    recomputation of wave k's lineage."""

    fetched: DataFrame
    new_links: "DataFrame | None"
    # exact counts from the wave's observed stats: the composition joins
    # broadcast these frames only while they are broadcast-sized (an
    # uncapped wave on a huge frontier must not broadcast millions of rows)
    n_fetched: int = 0
    n_new: int = 0


def _observation_result(obs: Observation, timeout: float = 5.0,
                        state: "dict | None" = None):
    """Bounded wait for observed metrics.  ``Observation.get`` blocks with
    no timeout; a daemon getter thread caps the wait so a metrics-routing
    change in a future Spark degrades to the agg fallback instead of
    hanging the crawl driver.  The timeout is short — the eager checkpoint
    job has already completed synchronously when this is called — and the
    first miss is remembered in ``state`` (the calling ENGINE's flag dict,
    not a process global — one engine's miss must not downgrade every other
    engine in the process) so later waves do not re-wait (or leak another
    blocked getter thread) every wave."""
    state = state if state is not None else {}
    if state.get("obs_unavailable"):
        return None
    import threading

    box: dict = {}

    def _get():
        try:
            box.update(v=obs.get)
        except Exception:
            pass  # e.g. NO_OBSERVE_BEFORE_GET — counts as a miss below

    th = threading.Thread(target=_get, daemon=True)
    th.start()
    th.join(timeout)
    if "v" not in box:
        state["obs_unavailable"] = True
        from crawler_to_md_spark.progress import get_logger

        get_logger().warning(
            "observed metrics did not arrive within %.1fs; falling back to "
            "per-wave aggregation for the rest of this engine", timeout)
        return None
    return box["v"]


class _phase_timer:
    """Prints per-phase wall times when CMS_PROFILE is set (perf triage)."""

    def __init__(self, wave_id: int):
        self.wave_id = wave_id
        self.t = None

    def mark(self, label: str) -> None:
        import time

        now = time.time()
        if _PROFILE and self.t is not None:
            print(f"[wave {self.wave_id}] {self.label:<16} {now - self.t:6.2f}s")
        self.t = now
        self.label = label


@dataclass
class CrawlConfig:
    """Engine knobs; defaults mirror the reference CLI (cli.py:92-165)."""

    scope_base_url: str | None = None        # --url single-site scope (P2)
    scope_domain: str | None = None          # registrable-domain scope (web-scale)
    include_patterns: list[str] = field(default_factory=list)   # P3
    exclude_patterns: list[str] = field(default_factory=list)   # P4
    max_retries: int = 3                     # --max-retries (cli.py:160-165)
    discover_links: bool = True              # False = static frontier (O9)
    host_budget: int | None = None           # per-host URLs per wave (politeness)
    global_budget: int | None = None         # per-wave cap (wave-size analog of L1)
    rate_limit: int = 0                      # requests/min, 0 = off (O3, cli.py:92-98)
    delay: float = 0.0                       # sec between requests (O4, cli.py:99-105)
    timeout: float = 10.0                    # transport knob (cli.py:112-117);
    proxy: str | None = None                 # with simulated fetch these are
    #                                          recorded for the production
    #                                          mapInPandas HTTP stage only
    css_include: list[str] = field(default_factory=list)   # P6 (extraction)
    css_exclude: list[str] = field(default_factory=list)   # P7 (extraction)
    salt_shards: int = 8                     # politeness skew fan-out
    max_waves: int = 200
    assume_no_dot_segments: bool = False     # skip urljoin-UDF branch
    # AQE's stage-materialization barriers cost ~1s/wave on small
    # micro-batches; a cluster run with large waves should keep it on
    # (skew-join + partition coalescing outweigh the barrier cost there)
    aqe_in_waves: bool = False
    use_bloom: bool = True
    # URL-seen filter backend: "bloom" (default; functions/bloom.py) or
    # "cuckoo" (functions/cuckoo.py — supports DELETION, e.g. a recrawl
    # policy re-opening URLs after TTL).  Same sharded-file architecture,
    # same lineage key; a warehouse must be resumed with the same backend
    # it was seeded with.
    seen_filter: str = "bloom"
    bloom_shards: int = 32
    bloom_bits: int = 1 << 20                # per shard; power of 2
    bloom_hashes: int = 7
    cuckoo_buckets: int = 1 << 15            # per shard; 4 slots/bucket
    # links/docs bucket count (pmod(url_hash, B)): wave commits rewrite
    # only buckets containing touched URLs, so per-wave write volume is
    # O(frontier/B * touched_buckets + wave), not O(frontier).  Size B so
    # frontier/B stays a comfortable parquet file (10^10 URLs -> B ~ 64k);
    # local tests/bench use the default
    store_buckets: int = 64
    # crawl-trap guard: when set, each wave's pending set drops every URL
    # whose (host, url-template) family has >= this many distinct pending
    # URLs (operators/crawlhealth.drop_trap_urls — calendar/session-id/
    # facet explosions never reach the dequeue).  Costs one distinct +
    # partial-agg + anti-join over the pending set per wave; leave None
    # unless the frontier is domain-unbounded.
    trap_min_urls: int | None = None
    # conditional refetch (O16): when True and the fetch stage is the live
    # HTTP stage, each wave joins the committed docs' stored cache
    # validators onto the batch (one left join against the docs table) and
    # the stage sends If-None-Match / If-Modified-Since; 304 answers keep
    # the committed doc (see the not_modified outcome).  Fresh validators
    # are stored in the ok-doc metadata for the next cycle.  Off by
    # default — it only pays on recrawl-heavy (TTL revisit) workloads.
    revalidate: bool = False


class CrawlEngine:
    """Distributed BFS-with-dedup over a snapshot-committed frontier."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        corpus: DataFrame | None = None,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        pacer: Pacer | None = None,
        fetch_stage=None,
        robots_transport_factory=None,
        robots_agent: str = "crawler-to-md-spark",
    ):
        """``fetch_stage`` is the pluggable fetch->parse->extract step
        (operators/fetchstage.py): default = equi-join against ``corpus``
        (sandbox simulation); pass ``http_extract_stage(...)`` (or inject a
        test transport via ``http_stage_from_config``) for a live crawl —
        that path runs the fused extraction UDF with the config's
        ``css_include``/``css_exclude`` filters bound (P6/P7).

        ``robots_transport_factory`` (optional) turns on PER-WAVE robots
        coverage: at run start the engine fetches robots.txt for every
        frontier host it hasn't covered yet, and after each wave for the
        hosts that wave's inserted links introduced — so a fresh
        domain-scoped crawl never fetches a page from a host whose rules
        were never read.  Without it, robots gating uses only the static
        ``robots`` table (and ``refresh_robots`` between runs)."""
        self.spark = spark
        self.config = config or CrawlConfig()
        self._fetch_stage = fetch_stage
        self._robots_transport_factory = robots_transport_factory
        self._robots_agent = robots_agent
        # Covered-host tracking is TABLE membership, never a driver-side
        # set: the rules table carries one row per attempted host
        # (``disallow IS NULL`` = fetched, no reachable rules = allowed)
        # and new hosts are found with an anti-join against it — a
        # domain-unbounded web crawl sees 10^7-10^8 distinct hosts, which
        # neither a Python set nor a single collect_set row survives.
        # Only the COUNT lives on the driver, as the gate's broadcast-vs-
        # shuffle hint (politeness.ROBOTS_BROADCAST_MAX).
        self._n_robots_hosts: int | None = None
        # rules rows fetched since the last snapshot commit; appended to
        # the store's `robots` table with the next wave commit so coverage
        # survives restarts (resume never re-fetches a covered host)
        self._robots_pending: DataFrame | None = None
        # per-engine observed-metrics health: one missed Observation
        # downgrades THIS engine to the agg fallback, not the process
        self._obs_state: dict = {}
        # strategy-selected store: parquet snapshots in the sandbox, Iceberg
        # when a catalog is configured (store/iceberg.py; set
        # CMS_STORE_BACKEND=iceberg to require it)
        from crawler_to_md_spark.store.iceberg import make_store

        self.store = make_store(
            spark, warehouse_dir,
            schemas={"links": LINKS_SCHEMA, "docs": DOCS_SCHEMA,
                     "metrics": METRICS_SCHEMA, "robots": ROBOTS_SCHEMA},
        )
        # normalize to (host, disallow, allow): manual tables may omit the
        # round-4 allow column (sources/robots.ensure_rules_cols)
        from crawler_to_md_spark.sources.robots import ensure_rules_cols

        self.robots = ensure_rules_cols(robots) if robots is not None else None
        # optional host-authority queue discipline (linkgraph.pagerank →
        # rank_to_priority → set_host_priority); None = BFS depth order
        self.host_priority: DataFrame | None = None
        self._host_priority_hint: int | None = None
        # optional per-host adaptive wave budgets (crawl_delay_budgets /
        # adaptive_host_budgets); None = uniform config.host_budget
        self.host_budgets: DataFrame | None = None
        self.host_exclusions: DataFrame | None = None
        self._host_budgets_hint: int | None = None
        # injectable for sleep-math tests (reference scraper.py:428-475)
        self.pacer = pacer or Pacer(self.config.rate_limit, self.config.delay)
        self._corpus_path = os.path.join(warehouse_dir, "corpus")
        if corpus is not None and not os.path.exists(self._corpus_path):
            # materialize once: every wave's fetch join then scans stable
            # parquet with pushdown instead of re-deriving the generator plan
            corpus.write.mode("overwrite").parquet(self._corpus_path)

    # ------------------------------------------------------------------
    # corpus / bloom
    # ------------------------------------------------------------------

    @property
    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self._corpus_path)

    @property
    def fetch_stage(self):
        """Resolve the wave fetch stage: injected > corpus join > live HTTP
        (requests transport) built from the config's transport knobs."""
        if self._fetch_stage is None:
            from crawler_to_md_spark.operators.fetchstage import (
                corpus_fetch_stage,
                http_stage_from_config,
            )

            if os.path.exists(self._corpus_path):
                self._fetch_stage = corpus_fetch_stage(self.corpus)
            else:
                self._fetch_stage = http_stage_from_config(self.config)
        return self._fetch_stage

    def _bloom_dir(self) -> str:
        return os.path.join(self.store.dir, "bloom")

    def _seen_store_cls(self):
        if self.config.seen_filter == "cuckoo":
            from crawler_to_md_spark.functions.cuckoo import CuckooShardStore

            return CuckooShardStore
        return BloomShardStore

    def _load_bloom(self) -> BloomShardStore | None:
        if not self.config.use_bloom:
            return None
        version = self.store.lineage.get("bloom_version")
        if version is None:
            return None
        return self._seen_store_cls().open(self._bloom_dir(), version)

    def set_host_priority(self, priorities: DataFrame,
                          n_hosts: int | None = None) -> None:
        """Install a host-authority queue discipline: ``priorities`` is
        ``(host, priority)`` — lower dequeues first (typically
        ``linkgraph.rank_to_priority(linkgraph.pagerank(...))``, so
        high-authority hosts are fetched before the long tail).  Ties
        break by (depth, url) as before; hosts absent from the table
        dequeue last.  ``n_hosts`` is the broadcast-vs-shuffle hint
        (politeness.host_priority_join); pass the table's host count when
        it may exceed ROBOTS_BROADCAST_MAX."""
        self.host_priority = priorities.select(
            "host", F.col("priority").cast("long").alias("priority"))
        self._host_priority_hint = n_hosts

    def _ok_metadata(self, fetched: DataFrame):
        """The ok-doc metadata map: title, plus the response cache
        validators when revalidation is on and the stage supplies them
        (stored for the next TTL-recrawl cycle's conditional request)."""
        base = F.create_map(F.lit("title"), F.col("title"))
        if self.config.revalidate and "etag" in fetched.columns:
            vals = F.map_filter(
                F.create_map(
                    F.lit("etag"), F.col("etag"),
                    F.lit("last_modified"), F.col("last_modified"),
                ),
                lambda k, v: v.isNotNull(),
            )
            return F.map_concat(base, vals)
        return base

    def set_host_exclusions(self, hosts: DataFrame) -> None:
        """Install a host-exclusion table: ``hosts`` is ``(host)`` — every
        pending URL on a listed host is dropped from dequeue (stays an
        unvisited row; clearing the table re-admits it).  The intended
        feeders are the crawl-health reports: non-canonical mirror hosts
        (``crawlhealth.mirror_clusters`` rows where host != mirror_group —
        don't spend budget on a clone) and operator blocklists.  One
        left-anti join per wave; AQE broadcasts the table until it
        outgrows the threshold."""
        self.host_exclusions = hosts.select("host")

    def set_host_budgets(self, budgets: DataFrame,
                         n_hosts: int | None = None) -> None:
        """Install per-host adaptive wave budgets: ``budgets`` is
        ``(host, budget)`` (politeness.crawl_delay_budgets from robots
        Crawl-delay, or politeness.adaptive_host_budgets from the previous
        run's failures).  Hosts absent from the table keep the uniform
        ``config.host_budget`` (None = uncapped).  ``n_hosts`` is the
        broadcast-vs-shuffle hint, as in set_host_priority."""
        self.host_budgets = budgets.select(
            "host", F.col("budget").cast("int").alias("budget"))
        self._host_budgets_hint = n_hosts

    # ------------------------------------------------------------------
    # seeding (scraper.py:375-402 + utils.py:94-106 order-dedup)
    # ------------------------------------------------------------------

    def seed(self, urls: "list[str] | DataFrame") -> int:
        """Validate, canonicalize, order-dedup and commit the seed frontier
        as snapshot 0.  Returns the number of accepted seeds.

        ``urls`` is either a Python list (reference ``--url`` shape,
        cli.py:181-190) or a DataFrame with ``(seed_seq long, raw string)``
        — the distributed seed-file source (sources/seeds.py), which never
        materializes a 10^8-line seed list on the driver."""
        spark = self.spark
        if isinstance(urls, DataFrame):
            raw = urls.select("seed_seq", "raw")
        else:
            raw = spark.createDataFrame(
                [(i, u) for i, u in enumerate(urls)], "seed_seq long, raw string"
            )
        canon = raw.withColumn("url", urlkit.canonicalize_udf(F.col("raw")))
        valid = canon.filter(
            urlkit.is_valid_link(
                F.col("url"),
                base_url=self.config.scope_base_url,
                domain_suffix=self.config.scope_domain,
                include_patterns=self.config.include_patterns,
                exclude_patterns=self.config.exclude_patterns,
            )
        )
        valid = robots_filter(
            valid.withColumn("host", urlkit.url_host(F.col("url"))),
            self.robots, self._robots_host_count(),
        )
        # order-preserving dedup: first occurrence wins (utils.py:94-106)
        w = Window.partitionBy("url").orderBy("seed_seq")
        deduped = (
            valid.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        links = with_ordered_seq(
            deduped.select(
                "url",
                urlkit.url_hash(F.col("url")).alias("url_hash"),
                "host",
                F.lit(False).alias("visited"),
                F.lit(0).alias("retry_count"),
                F.lit(0).alias("depth"),
                F.lit(0).cast("long").alias("batch_id"),
                "seed_seq",
            ),
            ["seed_seq"],
        ).select(*LINKS_SCHEMA.fieldNames()).persist()

        lineage: dict = {"runs": 0, "counters": {"seeds": links.count()}}
        if self.config.use_bloom:
            c = self.config
            if c.seen_filter == "cuckoo":
                bloom = self._seen_store_cls().create(
                    self._bloom_dir(), c.bloom_shards, c.cuckoo_buckets)
            else:
                bloom = BloomShardStore.create(
                    self._bloom_dir(), c.bloom_shards, c.bloom_bits,
                    c.bloom_hashes)
            bloom.add_dataframe(links)
            lineage["bloom_version"] = bloom.version
        B = self.config.store_buckets
        all_buckets = list(range(B))
        self.store.commit(
            {
                "links": BucketedUpdate(links, all_buckets, B),
                "docs": BucketedUpdate(
                    spark.createDataFrame([], DOCS_SCHEMA), all_buckets, B),
                "metrics": LiteralAppend([], METRICS_SCHEMA),
            },
            batch_id=0,
            lineage=lineage,
        )
        links.unpersist()
        return lineage["counters"]["seeds"]

    # ------------------------------------------------------------------
    # reference DatabaseManager API analogs (tests/test_scraper.py DummyDB)
    # ------------------------------------------------------------------

    def links(self) -> DataFrame:
        return self.store.read("links")

    def docs(self) -> DataFrame:
        return self.store.read("docs")

    def metrics(self) -> DataFrame:
        return self.store.read("metrics")

    def total_link_count(self) -> int:        # A1, database_manager.py:227-237
        return self.links().count()

    def visited_count(self) -> int:           # A2, database_manager.py:239-251
        return self.links().filter("visited").count()

    def retriable_failed(self) -> DataFrame:  # J1, database_manager.py:294-317
        failed = self.docs().filter(F.col("spans").isNull()).select("url")
        links = self.links().filter(F.col("retry_count") < self.config.max_retries)
        return failed.join(links, "url", "inner")

    # ------------------------------------------------------------------
    # one wave
    # ------------------------------------------------------------------

    def _wave(
        self, wave_id: int, run_id: int, bloom: BloomShardStore | None,
        links_base: "DataFrame | None" = None,
        prev_delta: "_WaveDelta | None" = None,
    ):
        """COMPUTE one micro-batch (dequeue → fetch → classify → discover)
        and return ``(urls dequeued, links inserted, commit_fn, delta)``.

        The snapshot commit is NOT performed here: ``commit_fn(rules)``
        is a closure the run loop submits to its one-slot commit thread
        AFTER the previous wave's commit landed, so wave k+1's compute
        phase overlaps wave k's bucket writes.  ``commit_fn`` builds the
        links/docs read-modify-write plans at RUN time (against the
        then-current manifest — the previous commit has landed by
        construction) and performs the atomic snapshot advance.

        Read-your-writes: when the previous wave's commit is (possibly)
        still in flight, ``links_base`` is the last-COMMITTED links scan
        (captured by the loop before submitting that commit — pinned
        files, so it is the same frame whether or not the commit has
        since landed) and ``prev_delta`` carries the in-memory wave
        state; their composition is exactly the links table the
        sequential loop would have read."""
        cfg = self.config
        pt = _phase_timer(wave_id)
        pt.mark("fetch+stats")
        B = cfg.store_buckets
        entry = self.store.bucket_entry("links")
        if entry is not None:
            B = int(entry["n_buckets"])
        bucket_of = F.pmod(F.col("url_hash"), F.lit(B)).cast("int")
        if links_base is None:
            links_all = self.store.read("links")
        else:
            links_all = links_base
            if prev_delta is not None:
                # wave k's dequeued urls are visited now (O2: every
                # dequeued URL, success or failure); wave-sized frame ->
                # broadcast the flag join while it is broadcast-sized
                # (an uncapped wave falls back to the planner's choice).
                # retry_count is NOT patched: within a run a visited row
                # never re-dequeues, and the committed value (what resume
                # reads) comes from wave k's commit, which lands before
                # any later commit.
                upd_prev = (prev_delta.fetched.select("url")
                            .withColumn("__pv", F.lit(True)))
                if prev_delta.n_fetched <= schedule.BROADCAST_SEEN_MAX:
                    upd_prev = F.broadcast(upd_prev)
                links_all = (
                    links_base.join(upd_prev, "url", "left")
                    .withColumn(
                        "visited",
                        F.col("visited") | F.col("__pv").isNotNull())
                    .drop("__pv")
                )
                if prev_delta.new_links is not None:
                    links_all = links_all.unionByName(
                        prev_delta.new_links.select(*links_base.columns))
        pending = links_all.filter(~F.col("visited"))
        if self.robots is not None:
            # dequeue-time robots gate: URLs inserted BEFORE their host's
            # rules arrived (same-wave discovery precedes the per-wave
            # robots fetch) are blocked here instead — never fetched, left
            # unvisited.  Broadcast below ROBOTS_BROADCAST_MAX covered
            # hosts, shuffled left join above (politeness.py).
            pending = robots_filter(pending, self.robots,
                                    self._robots_host_count())
        if cfg.trap_min_urls is not None:
            # trap guard: URL-template families that exploded past the
            # threshold are excluded from this wave's dequeue (they stay
            # unvisited rows — raising the threshold later re-admits them)
            pending = drop_trap_urls(pending, cfg.trap_min_urls)
        if self.host_exclusions is not None:
            # host blocklist (mirror clones, operator blocks): same
            # stay-unvisited semantics as the trap guard
            pending = pending.join(
                self.host_exclusions, "host", "left_anti")
        pending = host_priority_join(pending, self.host_priority,
                                     self._host_priority_hint)

        if self.host_budgets is not None:
            # adaptive per-host budgets (Crawl-delay / failure backoff);
            # hosts absent from the table fall back to the uniform budget
            batch = politeness_cap_per_host(
                pending, self.host_budgets, cfg.host_budget,
                cfg.salt_shards, self._host_budgets_hint)
        elif cfg.host_budget is not None:
            batch = politeness_cap(pending, cfg.host_budget, cfg.salt_shards)
        else:
            batch = pending
        # wave cap = min(configured wave size, remaining rate-limit budget)
        caps = [c for c in (cfg.global_budget, self.pacer.wave_budget())
                if c is not None]
        batch = global_cap(batch, min(caps) if caps else None).drop("priority")

        if cfg.revalidate:
            # conditional refetch: attach the committed docs' stored cache
            # validators so the HTTP stage can revalidate (one left join
            # against the docs table; the stage reads __etag/__lm when
            # built with revalidate, see http_stage_from_config)
            vals = self.store.read("docs").select(
                "url",
                F.col("metadata")["etag"].alias("__etag"),
                F.col("metadata")["last_modified"].alias("__lm"),
            )
            batch = batch.join(vals, "url", "left")
        fetched = self.fetch_stage(batch)

        eff_status = (
            F.when(F.col("status_code").isNull(), F.lit(None).cast("int"))
            .when(
                F.col("retry_count") < F.coalesce(
                    F.col("transient_failures_remaining"), F.lit(0)
                ),
                F.lit(503),
            )
            .otherwise(F.col("status_code"))
        )
        is_html = F.coalesce(F.col("content_type"), F.lit("")).contains("text/html")
        content_size = F.size(
            F.filter(F.col("spans"), lambda s: s["kind"] != F.lit("link"))
        )
        # conditional-refetch outcome (sources/fetch.py O16): an HTTP
        # stage revalidating with stored ETag/Last-Modified validators
        # reports 304 as not_modified — success, committed doc row KEPT
        # (it never enters docs_batch, so the upsert leaves it untouched),
        # URL marked visited with retry reset.  The corpus-sim stage has
        # no such column.
        not_mod = (
            F.coalesce(F.col("not_modified"), F.lit(False))
            if "not_modified" in fetched.columns else F.lit(False)
        )
        outcome = (
            F.when(eff_status.isNull(), F.lit("conn_error"))
            .when(eff_status.isin(*RETRIABLE_STATUSES), F.lit("http_retriable"))
            .when(not_mod & (eff_status == 304), F.lit("not_modified"))
            .when(eff_status != 200, F.lit("http_skip"))      # 404/403: no retry
            .when(~is_html, F.lit("nonhtml_skip"))
            .when(content_size <= 0, F.lit("empty"))          # NoContentError
            .otherwise(F.lit("ok"))
        )
        retriable = outcome.isin("conn_error", "http_retriable", "empty")
        fetched = fetched.withColumns(
            {
                "eff_status": eff_status,
                "outcome": outcome,
                "parsed": (eff_status == 200) & is_html,      # ok + empty
                "new_retry": F.when(
                    outcome.isin("ok", "not_modified"), F.lit(0))
                .when(retriable, F.col("retry_count") + 1)
                .otherwise(F.col("retry_count")),
            }
        )

        # wave stats (A3/O10) + dirty-bucket probe in ONE aggregate list,
        # riding the batch materialization as observed metrics — no
        # separate aggregate job over the batch
        wave_aggs = [
            F.count(F.lit(1)).alias("dequeued"),
            F.sum(F.col("outcome").isin("ok", "not_modified").cast("long"))
            .alias("fetched_ok"),
            F.sum(
                F.col("outcome").isin("conn_error", "http_retriable", "empty")
                .cast("long")
            ).alias("failed_retriable"),
            F.sum(
                F.col("outcome").isin("http_skip", "nonhtml_skip").cast("long")
            ).alias("skipped"),
            F.collect_set(bucket_of).alias("dirty_buckets"),
            # docs-row outcomes only: not_modified keeps its committed doc
            # untouched, so a pure-304 revalidation wave must not read
            # back + rewrite docs buckets whose content cannot change
            F.sum((F.col("outcome") == "ok").cast("long"))
            .alias("fetched_ok_strict"),
            F.collect_set(
                F.when(
                    F.col("outcome").isin(
                        "ok", "conn_error", "http_retriable", "empty"),
                    bucket_of,
                )
            ).alias("docs_dirty_buckets"),
        ]
        obs = Observation(f"wave-{wave_id}")
        # localCheckpoint TRUNCATES the logical plan at the wave batch:
        # classic Spark analyzes eagerly on every Dataset creation, so
        # without it each downstream transformation (docs rows, the URL
        # discover chain, the bucket merge) re-resolves the whole
        # frontier-scan + politeness-window + corpus-join subtree — ~4s of
        # driver time per wave, at ANY data scale.  The eager checkpoint
        # is one job that materializes the (wave-capped) batch to executor
        # storage; every later plan analyzes a flat LogicalRDD instead.
        # Recovery trade-off: lost executor blocks cannot recompute
        # (lineage is gone) — the wave fails and resumes from the last
        # snapshot, which is the engine's designed recovery path anyway.
        fetched = fetched.observe(obs, *wave_aggs).localCheckpoint(eager=True)
        stats = _observation_result(obs, state=self._obs_state)
        if stats is None:
            # metrics did not fire for the checkpoint job (defensive: a
            # Spark upgrade routing eager checkpoints outside query
            # execution) — one cheap agg over the checkpointed batch
            stats = fetched.agg(*wave_aggs).collect()[0].asDict()
        pt.mark("docs_plan")

        # ---- docs rows (O5 failure taxonomy) --------------------------
        err_type = (
            F.when(F.col("outcome") == "conn_error", F.lit("RequestException"))
            .when(F.col("outcome") == "http_retriable", F.lit("HTTPError"))
            .otherwise(F.lit("NoContentError"))
        )
        err_msg = (
            F.when(
                F.col("outcome") == "http_retriable",
                F.concat(F.lit("HTTP "), F.col("eff_status").cast("string")),
            )
            .when(F.col("outcome") == "conn_error", F.lit("connection failed"))
            .otherwise(F.lit("no content extracted"))
        )
        docs_batch = fetched.filter(
            (F.col("outcome") == "ok")
            | F.col("outcome").isin("conn_error", "http_retriable", "empty")
        ).select(
            "url",
            F.when(F.col("outcome") == "ok", F.col("spans")).alias("spans"),
            F.when(
                F.col("outcome") == "ok",
                self._ok_metadata(fetched),
            )
            .otherwise(
                F.create_map(
                    F.lit("scrape_status"), F.lit("failed"),
                    F.lit("error_type"), err_type,
                    F.lit("error_message"), err_msg,
                )
            )
            .alias("metadata"),
            F.when(F.col("outcome") == "ok", F.lit("ok"))
            .otherwise(F.lit("failed"))
            .alias("status"),
            F.lit(wave_id).cast("long").alias("batch_id"),
        )
        # ---- link discovery (one-parse: ok + empty pages) -------------
        pt.mark("discover")
        inserted = 0
        discovered = 0
        new_links = None
        fetch_dirty = set(stats["dirty_buckets"] or [])
        dirty_set = set(fetch_dirty)
        if cfg.discover_links:
            # ONE job computes the discovered count (A4), the insert count
            # (A3) and the inserts' dirty buckets AND materializes the
            # flagged candidates: the discover stats ride the flagged
            # frame's eager checkpoint as observed metrics — round 1 ran
            # three separate jobs here (count, seq counts, insert agg);
            # round 2 still ran two (candidate checkpoint + stats collect).
            flagged = self._discover(fetched, links_all, bloom, prev_delta)
            unseen = F.col(schedule.UNSEEN_COL)
            d_aggs = [
                F.count(F.lit(1)).alias("discovered"),
                F.sum(unseen.cast("long")).alias("inserted"),
                F.collect_set(F.when(unseen, bucket_of)).alias("dirty_buckets"),
            ]
            dobs = Observation(f"wave-{wave_id}-discover")
            flagged = flagged.observe(dobs, *d_aggs).localCheckpoint(eager=True)
            dstats = _observation_result(dobs, state=self._obs_state)
            if dstats is None:
                dstats = flagged.agg(*d_aggs).collect()[0].asDict()
            pt.mark("discover_exec")
            discovered = int(dstats["discovered"] or 0)
            inserted = int(dstats["inserted"] or 0)
            dirty_set |= set(dstats["dirty_buckets"] or [])
            if inserted and self._robots_transport_factory is not None:
                # per-wave auto-robots: cover the hosts these inserts
                # introduced before the next wave dequeues them.  Their
                # URLs are already in the frontier; disallowed ones are
                # blocked by the dequeue-time gate above.  The host frame
                # is a distinct+anti-join over the wave's CHECKPOINTED
                # candidates — never a collect_set (a single wave of a
                # domain-unbounded crawl can introduce 10^6 hosts; one
                # aggregation-buffer array would blow result-size limits
                # long before the rules table does).
                self._fetch_robots_for_hosts(
                    flagged.filter(unseen).select("host"))
            pt.mark("seq")
            if inserted:
                new_links = with_ordered_seq(
                    flagged.filter(unseen).select(
                        "url", "url_hash", "host",
                        F.lit(False).alias("visited"),
                        F.lit(0).alias("retry_count"),
                        "depth",
                        F.lit(wave_id).cast("long").alias("batch_id"),
                    ),
                    ["url"],
                    approx_rows=inserted,
                ).select(*LINKS_SCHEMA.fieldNames()).persist()
        pt.mark("links_merge")
        dirty = sorted(dirty_set)

        # ok-only + retriable failures == exactly the docs_batch rows;
        # fetched_ok would also count not_modified outcomes that contribute
        # no rows (the gate would rewrite identical buckets on TTL waves)
        n_docs = (int(stats["fetched_ok_strict"] or 0)
                  + int(stats["failed_retriable"] or 0))
        docs_dirty = sorted(set(stats["docs_dirty_buckets"] or []))

        # driver-written parquet segment — one row per wave does not
        # deserve a 32-task Spark write job (LiteralAppend)
        metrics_row = LiteralAppend(
            [
                (
                    int(wave_id), int(run_id),
                    int(stats["dequeued"] or 0), int(stats["fetched_ok"] or 0),
                    int(stats["failed_retriable"] or 0), int(stats["skipped"] or 0),
                    int(discovered), int(inserted),
                )
            ],
            METRICS_SCHEMA,
        )

        def commit_fn(robots_rules: "DataFrame | None") -> None:
            """The wave's atomic snapshot commit.  Runs on the one-slot
            commit thread AFTER the previous wave's commit landed, so the
            manifest reads below see a settled store; meanwhile the run
            loop is already computing the NEXT wave against the committed
            base + this wave's in-memory delta."""
            pt.mark("commit")
            # ---- frontier state update (O2 + A5, one MERGE analog) ----
            # only the dirty buckets are read back and rewritten — clean
            # buckets carry their files forward in the manifest
            # (Iceberg-style incremental snapshot; reference semantics:
            # one transaction/wave, database_manager.py:319-371)
            upd = fetched.select("url", F.col("new_retry").alias("__retry"))
            links_new = (
                self.store.read_buckets("links", dirty)
                .join(upd, "url", "left")
                .select(
                    "url", "url_hash", "host",
                    (F.col("visited") | F.col("__retry").isNotNull())
                    .alias("visited"),
                    F.coalesce(F.col("__retry"), F.col("retry_count"))
                    .alias("retry_count"),
                    "depth", "batch_id", "seq",
                )
            )
            if new_links is not None:
                links_new = links_new.unionByName(new_links)

            # docs upsert, last-write-wins (database_manager.py:103-123;
            # Iceberg MERGE in production — per-bucket anti-join + union
            # is the parquet equivalent).  The dirty set is the buckets of
            # the docs_batch rows themselves (observed above) —
            # discovery-only buckets and buckets whose only outcomes were
            # skips or 304 revalidations neither read back nor rewrite.  A
            # wave where every outcome was a hard skip (404/non-HTML)
            # produces no doc rows at all and omits the docs table from
            # the commit entirely (the manifest carries it forward
            # untouched).
            docs_new = None
            if n_docs:
                docs_new = (
                    self.store.read_buckets("docs", docs_dirty)
                    .join(docs_batch.select("url"), "url", "left_anti")
                    .unionByName(docs_batch)
                )

            lineage = dict(self.store.lineage)
            counters = dict(lineage.get("counters", {}))
            for k in ("dequeued", "fetched_ok", "failed_retriable",
                      "skipped"):
                counters[k] = counters.get(k, 0) + int(stats[k] or 0)
            counters["links_inserted"] = (
                counters.get("links_inserted", 0) + inserted)
            lineage["counters"] = counters
            lineage["frontier_offset"] = wave_id
            bloom_task = None
            if bloom is not None and new_links is not None and inserted:
                # executor-side shard update: durable on return, no
                # driver-side bitmap merge or re-broadcast (bloom.py).
                # Runs as a commit extra task — its Spark job overlaps the
                # links/docs bucket writes in the commit thread pool, and
                # the manifest (which pins the bloom version) still only
                # advances after it lands.
                bloom_task = functools.partial(bloom.add_dataframe,
                                               new_links)

            def _final_lineage() -> dict:
                if bloom is not None:
                    lineage["bloom_version"] = bloom.version
                return lineage

            updates = {
                "links": BucketedUpdate(links_new, dirty, B),
                "metrics": metrics_row,
            }
            if docs_new is not None:
                # docs rows carry no url_hash column; BucketedUpdate falls
                # back to xxhash64(url) — the same key, same buckets
                updates["docs"] = BucketedUpdate(docs_new, docs_dirty, B)
            if robots_rules is not None:
                # rules fetched since the last commit become one appended
                # segment of the store's robots coverage table —
                # restart-safe; the loop rebases the in-memory rules frame
                # onto the parquet scan after this commit lands
                updates["robots"] = AppendUpdate(robots_rules)
            self.store.commit(
                updates,
                batch_id=wave_id,
                lineage=_final_lineage,
                extra_tasks=[bloom_task] if bloom_task else None,
            )
            pt.mark("end")

        # fetched/flagged are checkpointed, not cached: their blocks are
        # reclaimed by the ContextCleaner once the delta references drop
        # (the loop holds them one extra wave for read-your-writes)
        return (int(stats["dequeued"] or 0), inserted, commit_fn,
                _WaveDelta(fetched=fetched, new_links=new_links,
                           n_fetched=int(stats["dequeued"] or 0),
                           n_new=inserted))

    def _discover(
        self, fetched: DataFrame, links_all: DataFrame,
        bloom: BloomShardStore | None,
        prev_delta: "_WaveDelta | None" = None,
    ) -> DataFrame:
        """Parsed pages -> candidates with an ``UNSEEN_COL`` verdict via the
        shared scheduling operator (operators/schedule.py).

        The returned plan is safe for a single observed checkpoint pass:
        while the seen set is broadcast-small (or bloom is off) the verdict
        is one left join, so the caller's eager checkpoint evaluates the
        whole resolve/canonicalize/dedup pipeline exactly once — no
        intermediate candidate materialization.  Above the broadcast bound
        the bloom two-branch form reads the candidate frame twice, so the
        candidates are eagerly localCheckpoint-ed first (one extra job, only
        on the 10^10-frontier path where it pays for itself).  Either way
        the checkpoint truncates the staged URL-projection chain out of
        every downstream plan, whose eager re-analysis cost ~1-2s of driver
        time per wave."""
        cfg = self.config
        # one-parse discovery: every href the fetch stage's single parse
        # produced (corpus stage derives out_links from link spans; the
        # live stage's extraction UDF collects inline + standalone anchors)
        raw = fetched.filter("parsed").select(
            F.col("url").alias("page_url"),
            F.col("depth").alias("parent_depth"),
            F.explode("out_links").alias("href"),
        )
        resolved = schedule.resolve_candidates(
            raw, assume_no_dot_segments=cfg.assume_no_dot_segments
        )
        valid = schedule.validate_candidates(
            resolved,
            scope_base_url=cfg.scope_base_url,
            scope_domain=cfg.scope_domain,
            include_patterns=cfg.include_patterns,
            exclude_patterns=cfg.exclude_patterns,
            robots=self.robots,
            robots_n_hosts=self._robots_host_count(),
        )
        counters = self.store.lineage.get("counters", {})
        seen_count = (int(counters.get("seeds", 0))
                      + int(counters.get("links_inserted", 0))
                      - int(counters.get("purged", 0)))
        cand = schedule.dedup_candidates(valid)
        if bloom is not None and seen_count > schedule.BROADCAST_SEEN_MAX:
            # two-branch bloom form: materialize candidates once so both
            # branches (sure-new, suspect anti-join) read cached blocks
            cand = schedule.with_bloom_flag(cand, bloom).localCheckpoint(
                eager=True)
            flagged = schedule.flag_unseen(cand, links_all, bloom,
                                           seen_count=seen_count)
            if prev_delta is not None and prev_delta.new_links is not None:
                # pipelined-commit staleness guard: the previous wave's
                # bloom shard update runs as a commit extra task that may
                # still be in flight, so a URL inserted last wave can read
                # bloom-NEGATIVE and skip the exact join ("sure new").
                # The exact-join branch is already covered (links_all
                # includes the delta rows); re-AND the verdict against the
                # wave-sized delta to close the sure-new branch too.
                hit = (prev_delta.new_links.select("url_hash", "url")
                       .withColumn("__dhit", F.lit(True)))
                if prev_delta.n_new <= schedule.BROADCAST_SEEN_MAX:
                    hit = F.broadcast(hit)
                flagged = (
                    flagged.join(hit, ["url_hash", "url"], "left")
                    .withColumn(
                        schedule.UNSEEN_COL,
                        F.col(schedule.UNSEEN_COL)
                        & F.col("__dhit").isNull())
                    .drop("__dhit")
                )
            return flagged
        return schedule.flag_unseen(cand, links_all, None,
                                    seen_count=seen_count)

    # ------------------------------------------------------------------
    # runs
    # ------------------------------------------------------------------

    def _requeue(self, run_id: int) -> int:
        """O6: failed pages with retry budget left become unvisited again.
        Partial commit: only buckets containing requeued URLs rewrite."""
        retriable = self.retriable_failed().select("url").persist()
        n = retriable.count()
        if n:
            B = self.config.store_buckets
            entry = self.store.bucket_entry("links")
            if entry is not None:
                B = int(entry["n_buckets"])
            dirty = sorted({
                r["b"]
                for r in retriable.select(
                    F.pmod(F.xxhash64(F.col("url")), F.lit(B))
                    .cast("int").alias("b")
                ).distinct().collect()
            })
            links_new = (
                self.store.read_buckets("links", dirty)
                .join(retriable.withColumn("__rq", F.lit(True)), "url", "left")
                .withColumn(
                    "visited", F.col("visited") & F.col("__rq").isNull()
                )
                .drop("__rq")
            )
            lineage = dict(self.store.lineage)
            lineage["runs"] = run_id
            self.store.commit(
                {"links": BucketedUpdate(links_new, dirty, B)},
                batch_id=self.store.batch_id + 1,
                lineage=lineage,
            )
        retriable.unpersist()
        return n

    def run(self, resume: bool = False) -> dict:
        """One crawl run: optional requeue, then waves until the frontier
        drains (or max_waves).  Returns run summary counters.

        The URL-pipeline optimizer knobs (per-operator codegen, no filter
        pushdown through the staged projections) are scoped to this loop —
        operators outside the crawl path keep whole-stage codegen."""
        from crawler_to_md_spark.session import url_pipeline_confs

        with url_pipeline_confs(self.spark):
            return self._run_inner(resume)

    def _run_inner(self, resume: bool) -> dict:
        run_id = int(self.store.lineage.get("runs", 0)) + 1
        aqe_before = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
        if not self.config.aqe_in_waves:
            self.spark.conf.set("spark.sql.adaptive.enabled", "false")
        requeued = self._requeue(run_id) if resume else 0
        bloom = self._load_bloom()
        waves = 0
        dequeued_total = 0
        # pending is tracked arithmetically across waves (pending' =
        # pending - dequeued + inserted) — exact even under politeness /
        # global caps, and saves one Spark job per wave
        pending_df = self.store.read("links").filter(~F.col("visited"))
        if self._robots_transport_factory is not None:
            self._load_committed_robots()
            # run-start auto-robots: cover seed hosts (fresh run) and any
            # host discovered after the last rules fetch (resume).  The
            # host frame goes through distinct+anti-join, never a
            # collect_set (frontier host cardinality is unbounded).
            self._fetch_robots_for_hosts(pending_df.select("host"))
        # count pending THROUGH the rules gate: robots-blocked unvisited
        # rows never dequeue, so an ungated count would over-report and the
        # arithmetic counter below would pay one extra empty wave before
        # the n==0 break
        gated = robots_filter(pending_df, self.robots,
                              self._robots_host_count())
        if self.config.trap_min_urls is not None:
            # the trap guard excludes whole URL families from dequeue the
            # same way — count through it for the same reason
            gated = drop_trap_urls(gated, self.config.trap_min_urls)
        if self.host_exclusions is not None:
            gated = gated.join(self.host_exclusions, "host", "left_anti")
        pending = gated.count()
        from crawler_to_md_spark.progress import get_logger, wave_progress

        log = get_logger()
        counters0 = self.store.lineage.get("counters", {})
        total = (int(counters0.get("seeds", 0))
                 + int(counters0.get("links_inserted", 0)))

        # ---- pipelined wave loop --------------------------------------
        # wave k's snapshot commit runs on a one-slot background thread
        # while wave k+1 computes (dequeue/fetch/discover).  Commits stay
        # STRICTLY SERIALIZED: the previous commit is joined before the
        # next is submitted, so every commit's read-modify-write sees a
        # settled manifest and batch ids advance in order.  Wave k+1's
        # frontier view is the last-committed snapshot (links_base,
        # captured BEFORE wave k's commit was submitted — pinned files,
        # identical whether or not that commit has landed) composed with
        # wave k's in-memory delta (_WaveDelta), which is exactly the
        # table the sequential loop would have read (read-your-writes).
        # The politeness sleep (O3/O4) also overlaps the commit.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=1)
        inflight = None           # previous wave's commit future
        inflight_had_rules = False
        delta = None              # _WaveDelta of the in-flight wave
        links_base = None         # committed scan the delta composes onto
        next_wave_id = self.store.batch_id + 1
        try:
            while pending > 0 and waves < self.config.max_waves:
                n, inserted, commit_fn, delta_new = self._wave(
                    next_wave_id, run_id, bloom,
                    links_base=links_base, prev_delta=delta)
                if inflight is not None:
                    inflight.result()
                    if inflight_had_rules:
                        self._rebase_robots()
                if delta is not None and delta.new_links is not None:
                    # consumed by both the landed commit and the compute
                    # that just returned — safe to release now
                    delta.new_links.unpersist()
                # pin the base the NEXT wave composes delta_new onto
                links_base = self.store.read("links")
                rules = self._robots_pending
                self._robots_pending = None
                inflight = pool.submit(commit_fn, rules)
                inflight_had_rules = rules is not None
                delta = delta_new
                next_wave_id += 1
                pending = pending - n + inserted
                dequeued_total += n
                waves += 1
                total += inserted
                log.info(wave_progress(next_wave_id - 1, n, inserted,
                                       total - pending, total))
                # time-based politeness: delay + rate-limit window sleeps
                # (O3/O4) run while the commit writes in the background;
                # failed fetches count as requests (scraper.py:493,535)
                self.pacer.after_wave(n)
                if n == 0:
                    break
        finally:
            if inflight is not None:
                inflight.result()
                if inflight_had_rules:
                    self._rebase_robots()
            if delta is not None and delta.new_links is not None:
                delta.new_links.unpersist()
            pool.shutdown(wait=True)
        lineage = dict(self.store.lineage)
        lineage["runs"] = run_id
        final_updates = {}
        if self._robots_pending is not None:
            # a zero-wave run (drained frontier) still persists any rules
            # the run-start auto-robots fetch produced; bump the snapshot
            # id so the appended segment never collides with a path an
            # earlier commit already registered
            final_updates["robots"] = AppendUpdate(self._robots_pending)
        self.store.commit(
            final_updates,
            batch_id=self.store.batch_id + (1 if final_updates else 0),
            lineage=lineage)
        if self._robots_pending is not None:
            self._robots_pending = None
            from crawler_to_md_spark.sources.robots import ensure_rules_cols

            self.robots = ensure_rules_cols(self.store.read("robots"))
        self.spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        return {"run_id": run_id, "waves": waves,
                "dequeued": dequeued_total, "requeued": requeued}

    def run_to_completion(self) -> list[dict]:
        """Initial run + resume runs until no retriable failures remain —
        the reference's 'invoke again to retry' loop, bounded by
        max_retries."""
        out = [self.run(resume=False)]
        for _ in range(self.config.max_retries):
            if self.retriable_failed().limit(1).count() == 0:
                break
            out.append(self.run(resume=True))
        return out

    # ------------------------------------------------------------------
    # robots refresh (production: covers DISCOVERED hosts, not just seeds)
    # ------------------------------------------------------------------

    def _rebase_robots(self) -> None:
        """After a commit that persisted robots rules: swap the in-memory
        union-chain for the committed parquet scan (plan hygiene — the
        gate joins this frame every wave, and a 10^3-wave run would
        otherwise accumulate 10^3 unions of mapInPandas lineage), plus
        any rules fetched SINCE that commit was captured (the overlapped
        compute may have produced new pending rules — they stay in the
        in-memory frame until their own commit lands)."""
        from crawler_to_md_spark.sources.robots import ensure_rules_cols

        stored = ensure_rules_cols(self.store.read("robots"))
        if self._robots_pending is not None:
            stored = stored.unionByName(self._robots_pending)
        self.robots = stored

    def _robots_host_count(self) -> int | None:
        """Covered-host count — the gate's broadcast-vs-shuffle hint.
        Derived once per installed table (one count job over the one-row-
        per-host rules frame) and maintained incrementally by the fetch
        path; never a host SET (see __init__)."""
        if self.robots is None:
            return None
        if self._n_robots_hosts is None:
            self._n_robots_hosts = self.robots.count()
        return self._n_robots_hosts

    def _load_committed_robots(self) -> None:
        """Install the store's committed robots coverage table (restart
        path: a resumed crawl never re-fetches a covered host).  Manually
        supplied rules win per host; manual rows for hosts the store has
        never seen are queued for commit so they persist too."""
        from crawler_to_md_spark.sources.robots import ensure_rules_cols

        if not self.store.has_table("robots"):
            if self.robots is not None and self._robots_pending is None:
                self._robots_pending = self.robots
            return
        stored = ensure_rules_cols(self.store.read("robots"))
        if self.robots is None:
            self.robots = stored
        else:
            manual = self.robots
            manual_new = manual.join(
                stored.select("host"), "host", "left_anti")
            if not manual_new.isEmpty():
                self._robots_pending = manual_new
            self.robots = manual.unionByName(
                stored.join(manual.select("host"), "host", "left_anti"))
        self._n_robots_hosts = None

    def _fetch_robots_for_hosts(self, hosts) -> int:
        """Per-wave auto-robots: fetch + install rules for the hosts in
        ``hosts`` not yet covered.  ``hosts`` is a DataFrame with a ``host``
        column (the scale path — distinct + anti-join against the rules
        table, nothing driver-side) or a small driver iterable.

        Hosts with no reachable robots.txt get a ``disallow IS NULL``
        coverage row (= fully allowed, robots_allowed NULL semantics) so
        membership in the rules table IS the covered-set — they are fetched
        at most once per warehouse, across restarts.  The fetched frame is
        localCheckpoint-ed (a recomputed union-of-mapInPandas lineage would
        re-issue the HTTP fetches) and queued for the next snapshot commit.
        Returns the number of NEW hosts attempted."""
        if self._robots_transport_factory is None:
            return 0
        from crawler_to_md_spark.sources.fetch import FetchPolicy
        from crawler_to_md_spark.sources.robots import fetch_robots

        if isinstance(hosts, DataFrame):
            cand = hosts.select("host")
        else:
            hs = sorted({h for h in hosts if h})
            if not hs:
                return 0
            cand = self.spark.createDataFrame([(h,) for h in hs],
                                              "host string")
        cand = cand.filter(
            F.col("host").isNotNull() & (F.col("host") != "")
        ).distinct()
        if self.robots is not None:
            cand = cand.join(self.robots.select("host"), "host", "left_anti")
        fetched = fetch_robots(
            cand,
            FetchPolicy(timeout=self.config.timeout, proxy=self.config.proxy),
            self._robots_transport_factory,
            agent=self._robots_agent,
            emit_all=True,
        ).localCheckpoint(eager=True)
        n_new = fetched.count()
        if not n_new:
            return 0
        base = self._robots_host_count() or 0
        self._robots_pending = (
            fetched if self._robots_pending is None
            else self._robots_pending.unionByName(fetched)
        )
        self.robots = (
            fetched if self.robots is None
            else self.robots.unionByName(fetched)
        )
        self._n_robots_hosts = base + n_new
        return n_new

    def refresh_robots(self, transport_factory=None,
                       agent: str = "crawler-to-md-spark") -> int:
        """Fetch robots.txt for every distinct FRONTIER host and install
        the rules as the engine's robots gate (sources/robots.py).

        A long domain-scoped crawl keeps discovering new hosts; the CLI's
        ``--respect-robots`` covers seed hosts only — a deployment calls
        this between runs (or before a resume) so newly-discovered hosts
        get their rules too.  Freshly-fetched rules take precedence per
        host; hosts only present in a manually-supplied table keep their
        manual rules.  Returns the number of rules rows installed.  The
        rules frame is persisted — the gate joins it every wave."""
        from crawler_to_md_spark.sources.fetch import FetchPolicy
        from crawler_to_md_spark.sources.robots import (
            fetch_robots,
            requests_text_transport,
        )

        hosts = self.links().select("host").distinct()
        fetched = fetch_robots(
            hosts,
            FetchPolicy(timeout=self.config.timeout, proxy=self.config.proxy),
            transport_factory or requests_text_transport,
            agent=agent,
        )
        if self.robots is not None:
            keep_old = self.robots.join(fetched.select("host"),
                                        "host", "left_anti")
            fetched = fetched.unionByName(keep_old)
        old = self.robots
        self.robots = fetched.persist()
        n = self.robots.count()
        self._n_robots_hosts = n
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
        return n

    # ------------------------------------------------------------------
    # frontier lifecycle beyond the reference: TTL recrawl + removal
    # ------------------------------------------------------------------

    def _urls_df(self, urls: "list[str] | DataFrame") -> DataFrame:
        if isinstance(urls, DataFrame):
            return urls.select("url")
        return self.spark.createDataFrame([(u,) for u in urls], "url string")

    def _bucket_count(self) -> int:
        entry = self.store.bucket_entry("links")
        if entry is not None:
            return int(entry["n_buckets"])
        return self.config.store_buckets

    def _dirty_buckets(self, tgt: DataFrame, B: int) -> list[int]:
        return sorted({
            r["b"] for r in tgt.select(
                F.pmod(F.xxhash64(F.col("url")), F.lit(B))
                .cast("int").alias("b")).distinct().collect()
        })

    def crawl_report(self) -> DataFrame:
        """Per-host coverage/health rollup: ``(host, n_urls, max_depth,
        n_ok, n_failed)`` — the operational dashboard row a crawl
        operator watches (which domains are draining, which are all
        errors).  Two partial-aggregated shuffles on ``host`` (frontier
        and docs sides) + one host-keyed join; hot-host fan-in is
        absorbed map-side, nothing driver-side."""
        links = self.links().groupBy("host").agg(
            F.count("*").cast("long").alias("n_urls"),
            F.max("depth").cast("long").alias("max_depth"),
        )
        docs = (
            self.docs()
            .select(urlkit.url_host(F.col("url")).alias("host"), "status")
            .groupBy("host")
            .agg(
                F.sum((F.col("status") == "ok").cast("long")).alias("n_ok"),
                F.sum((F.col("status") == "failed").cast("long"))
                .alias("n_failed"),
            )
        )
        return (
            links.join(docs, "host", "left")
            .fillna(0, subset=["n_ok", "n_failed"])
        )

    def recrawl_due(self, ttl_batches: int) -> DataFrame:
        """TTL revisit policy: URLs whose last successful fetch is at
        least ``ttl_batches`` store commits old (``docs.batch_id <=
        current - ttl``).  Batch ids are the engine's monotonic logical
        clock — deterministic and resume-stable, unlike wall time.  Feed
        the result to ``reopen`` (or call ``reopen_due``) and run to
        refresh stale pages; refetches upsert last-write-wins."""
        cutoff = self.store.batch_id - int(ttl_batches)
        return (
            self.docs()
            .filter((F.col("status") == "ok")
                    & (F.col("batch_id") <= cutoff))
            .select("url")
        )

    def reopen_due(self, ttl_batches: int) -> int:
        """``reopen(recrawl_due(ttl))`` — one-call TTL refresh pass."""
        return self.reopen(self.recrawl_due(ttl_batches))

    def reopen(self, urls: "list[str] | DataFrame") -> int:
        """TTL recrawl: mark the given (canonical) URLs unvisited with a
        fresh retry budget, so the next run re-fetches them and upserts
        their doc rows last-write-wins.  Partial commit — only buckets
        containing reopened URLs rewrite.  Returns #matched rows."""
        tgt = self._urls_df(urls).persist()
        n = tgt.count()
        if n:
            B = self._bucket_count()
            dirty = self._dirty_buckets(tgt, B)
            flagged = tgt.withColumn("__ro", F.lit(True))
            links_new = (
                self.store.read_buckets("links", dirty)
                .join(flagged, "url", "left")
                .withColumn("visited",
                            F.col("visited") & F.col("__ro").isNull())
                .withColumn(
                    "retry_count",
                    F.when(F.col("__ro").isNotNull(), F.lit(0))
                    .otherwise(F.col("retry_count")))
                .drop("__ro")
            )
            self.store.commit(
                {"links": BucketedUpdate(links_new, dirty, B)},
                batch_id=self.store.batch_id + 1,
                lineage=dict(self.store.lineage),
            )
        tgt.unpersist()
        return n

    def purge(self, urls: "list[str] | DataFrame") -> int:
        """Remove URLs from the frontier AND the docs store (takedown /
        retention deletion).  With the cuckoo seen filter the hashes are
        also DELETED from the filter, so a future re-discovery takes the
        sure-new fast path again; with bloom the filter keeps a stale
        positive — harmless for correctness (the candidate takes the
        suspect branch, the exact anti-join finds no frontier row, and the
        URL re-inserts) but permanently pays the exact-join cost, which is
        exactly the trade the cuckoo backend exists to remove."""
        tgt = self._urls_df(urls).persist()
        n = tgt.count()
        if n:
            B = self._bucket_count()
            dirty = self._dirty_buckets(tgt, B)
            links_new = (
                self.store.read_buckets("links", dirty)
                .join(tgt, "url", "left_anti"))
            docs_new = (
                self.store.read_buckets("docs", dirty)
                .join(tgt, "url", "left_anti"))
            lineage = dict(self.store.lineage)
            counters = dict(lineage.get("counters", {}))
            # the broadcast-size hint (seeds + inserted - purged) stays in
            # step with the true seen-set size
            counters["purged"] = counters.get("purged", 0) + n
            lineage["counters"] = counters
            bloom = self._load_bloom()
            extra = None
            if bloom is not None and hasattr(bloom, "remove_dataframe"):
                hashes = tgt.select(
                    urlkit.url_hash(F.col("url")).alias("url_hash"))
                extra = [functools.partial(bloom.remove_dataframe, hashes)]

            def _final() -> dict:
                if bloom is not None:
                    lineage["bloom_version"] = bloom.version
                return lineage

            self.store.commit(
                {"links": BucketedUpdate(links_new, dirty, B),
                 "docs": BucketedUpdate(docs_new, dirty, B)},
                batch_id=self.store.batch_id + 1,
                lineage=_final,
                extra_tasks=extra,
            )
        tgt.unpersist()
        return n
