"""Crawl-equivalence suite: the Spark engine's end state must match the
reference's BFS-with-dedup semantics on the deterministic synthetic graph.

Checks (SURVEY.md §2.6 "ordering semantics" + §5 "our strategy"):
  * URL-seen set equality vs the independent Python golden model
  * wave-partition (BFS depth) equality per URL
  * retry_count end state per failure class (O5 taxonomy)
  * docs status: ok pages have spans+title, failures have NULL spans and
    failure metadata, 404/403/non-HTML have no row at all
  * resume/requeue across runs (O6) including transient-success
  * politeness budgets, static-frontier mode (O9), metrics (O10)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
from crawler_to_md_spark.sources import corpus

SF_DIR = "/root/testdata/sf0.001"
M = 1  # 500 pages: BFS depth ~6, every failure class populated


@pytest.fixture(scope="module")
def corpus_df(spark):
    return corpus.synth_corpus(spark, SF_DIR, replicas=M)


@pytest.fixture(scope="module")
def golden():
    return corpus.python_golden_crawl(500 * M)


@pytest.fixture(scope="module")
def engine(spark, corpus_df, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("crawl") / "wh")
    eng = CrawlEngine(
        spark, wh, corpus=corpus_df,
        config=CrawlConfig(scope_domain="example.com", max_retries=3),
    )
    assert eng.seed([corpus.seed_url()]) == 1
    eng.run_to_completion()
    return eng


def _gid(url: str) -> int:
    return int(url.rsplit("/docs/p", 1)[1])


def test_seen_set_equality(engine, golden):
    links = engine.links().collect()
    got = {_gid(r["url"]) for r in links}
    assert got == set(golden)


def test_wave_partition_equality(engine, golden):
    """First-discovery depth per URL == golden min BFS depth (the part of
    reference visit order that IS deterministic, SURVEY.md §2.6)."""
    got = {_gid(r["url"]): r["depth"] for r in engine.links().collect()}
    assert got == {g: v["depth"] for g, v in golden.items()}


def test_all_visited_and_retry_state(engine, golden):
    links = {_gid(r["url"]): r for r in engine.links().collect()}
    assert all(r["visited"] for r in links.values())
    for g, want in golden.items():
        assert links[g]["retry_count"] == want["retry_count"], (
            g, want["cls"], links[g]["retry_count"])


def test_docs_status_taxonomy(engine, golden):
    docs = {_gid(r["url"]): r for r in engine.docs().collect()}
    for g, want in golden.items():
        if want["doc_status"] is None:
            # 404/403/pdf: visited, no page row (scraper.py:496-528)
            assert g not in docs, (g, want["cls"])
        elif want["doc_status"] == "ok":
            row = docs[g]
            assert row["status"] == "ok"
            assert row["spans"] is not None and len(row["spans"]) > 0
            assert row["metadata"]["title"].startswith(f"Doc {g}:")
        else:  # failed after retries exhausted
            row = docs[g]
            assert row["status"] == "failed"
            assert row["spans"] is None
            assert row["metadata"]["scrape_status"] == "failed"
            assert row["metadata"]["error_type"] in (
                "HTTPError", "RequestException", "NoContentError")


def test_transient_pages_succeed_on_retry(engine, golden):
    transients = [g for g, v in golden.items() if v["cls"] == "transient"]
    assert transients, "fixture must exercise the transient path"
    docs = {_gid(r["url"]): r for r in engine.docs().collect()}
    links = {_gid(r["url"]): r for r in engine.links().collect()}
    for g in transients:
        assert docs[g]["status"] == "ok"
        assert links[g]["retry_count"] == 0  # success resets (db:355-371)


def test_empty_pages_still_contribute_links(engine, golden):
    """One-parse architecture: an empty page fails (NULL spans) but its
    out-links are discovered (scraper.py:551-558)."""
    empties = [g for g, v in golden.items() if v["cls"] == "empty"]
    assert empties
    children = {c for g in empties for c in corpus.python_edges(g, 500 * M)}
    got = {_gid(r["url"]) for r in engine.links().collect()}
    assert children <= got


def test_metrics_accounting(engine):
    m = engine.metrics().orderBy("batch_id").collect()
    assert len(m) >= 4  # >=4 BFS waves (FIXTURES.md)
    total_dequeued = sum(r["dequeued"] for r in m)
    # every link is dequeued once per attempt; at minimum once each
    assert total_dequeued >= engine.total_link_count()
    assert engine.visited_count() == engine.total_link_count()
    # seeds + inserted covers the whole seen set exactly (A3 dedup count)
    inserted = sum(r["links_inserted"] for r in m)
    assert inserted + 1 == engine.total_link_count()


def test_lineage_manifest(engine):
    lin = engine.store.lineage
    assert lin["bloom_version"] >= 1
    assert lin["frontier_offset"] == engine.store.batch_id
    assert lin["counters"]["links_inserted"] + 1 == engine.total_link_count()
    assert lin["runs"] >= 2  # initial + at least one resume


def test_resume_is_idempotent_when_complete(spark, engine):
    """Running again on a drained frontier changes nothing."""
    before = engine.links().count(), engine.docs().count()
    engine.run(resume=True)
    after = engine.links().count(), engine.docs().count()
    assert before == after


def test_bloom_consistency_vs_exact(spark, corpus_df, golden, tmp_path):
    """Bloom prefilter must not change the crawl result (FP-safe design)."""
    cfg = CrawlConfig(scope_domain="example.com", max_retries=3, use_bloom=False)
    eng = CrawlEngine(spark, str(tmp_path / "wh2"), corpus=corpus_df, config=cfg)
    eng.seed([corpus.seed_url()])
    eng.run_to_completion()
    assert {_gid(r["url"]) for r in eng.links().collect()} == set(golden)


def test_politeness_budget_respected(spark, corpus_df, tmp_path):
    cfg = CrawlConfig(scope_domain="example.com", host_budget=20, max_waves=3)
    eng = CrawlEngine(spark, str(tmp_path / "wh3"), corpus=corpus_df, config=cfg)
    eng.seed([corpus.seed_url()])
    eng.run()
    # no wave may process more than budget URLs per host (docs.batch_id is
    # the wave a page was dequeued+fetched in)
    per_wave_host = (
        eng.docs().select("url", F.col("batch_id").alias("wave"))
        .join(eng.links().select("url", "host"), "url")
        .groupBy("host", "wave").agg(F.count("*").alias("n"))
    )
    assert per_wave_host.filter(F.col("n") > 20).count() == 0


def test_static_frontier_mode(spark, corpus_df, tmp_path):
    """O9: seeds-only crawl never expands the frontier."""
    cfg = CrawlConfig(scope_domain="example.com", discover_links=False)
    eng = CrawlEngine(spark, str(tmp_path / "wh4"), corpus=corpus_df, config=cfg)
    seeds = [corpus.python_url(g) for g in (0, 1, 2)]
    eng.seed(seeds)
    eng.run()
    assert eng.total_link_count() == 3
    assert eng.visited_count() == 3


def test_seed_validation_and_order_dedup(spark, corpus_df, tmp_path):
    """Invalid seeds skipped, duplicates keep first occurrence, fragments
    and case fold into the canonical form (scraper.py:375-402,
    utils.py:94-106)."""
    cfg = CrawlConfig(scope_domain="example.com", discover_links=False)
    eng = CrawlEngine(spark, str(tmp_path / "wh5"), corpus=corpus_df, config=cfg)
    u0 = corpus.python_url(0)
    n = eng.seed([
        "not a url",                       # invalid -> skipped
        u0.upper().replace("/DOCS/P0", "/docs/p0"),  # case-folded host dup
        u0 + "#frag",                      # fragment dup
        u0,
        "mailto:x@example.com",            # unsupported scheme
        corpus.python_url(4),
    ])
    assert n == 2
    rows = sorted(eng.links().collect(), key=lambda r: r["seq"])
    assert [r["url"] for r in rows] == [u0, corpus.python_url(4)]


def test_robots_gating(spark, corpus_df, tmp_path):
    """Hosts with a disallow-all rule never enter the frontier."""
    robots = spark.createDataFrame(
        [("h1.example.com", ["/"])], "host string, disallow array<string>"
    )
    cfg = CrawlConfig(scope_domain="example.com", max_waves=30)
    eng = CrawlEngine(spark, str(tmp_path / "wh6"), corpus=corpus_df,
                      config=cfg, robots=robots)
    eng.seed([corpus.seed_url()])
    eng.run()
    assert eng.links().filter(F.col("host") == "h1.example.com").count() == 0
    assert eng.links().count() > 0


# ---------------------------------------------------------------------------
# time-based politeness (O3/O4 — reference scraper.py:428-475 sleep math,
# tests/test_scraper.py:1219-1280)
# ---------------------------------------------------------------------------


class _FakeClock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


def _pacer(rate_limit=0, delay=0.0):
    from crawler_to_md_spark.operators.politeness import Pacer

    clk = _FakeClock()
    clk.sleeps = []
    p = Pacer(rate_limit=rate_limit, delay=delay, clock=clk, sleeper=clk.sleep)
    return p, clk


def test_pacer_delay_math():
    # delay=0.5 over a 7-request wave sleeps 3.5s (amortized per-request
    # delay: reference sleeps 0.5 before each of 7 requests)
    p, clk = _pacer(delay=0.5)
    p.after_wave(7)
    assert clk.sleeps == [3.5]
    assert p.wave_budget() is None       # no rate limit -> uncapped


def test_pacer_rate_limit_window_math():
    # rate_limit=10/min; two waves of 5 exhaust the window instantly ->
    # sleep the full remaining 60s (reference: sleep(60 - elapsed))
    p, clk = _pacer(rate_limit=10)
    assert p.wave_budget() == 10
    p.after_wave(5)
    assert p.wave_budget() == 5          # window half-used
    assert clk.sleeps == []
    clk.t += 12.0                        # 12s of crawl work elapses
    p.after_wave(5)
    assert clk.sleeps == [48.0]          # 60 - 12
    assert p.wave_budget() == 10         # fresh window


def test_pacer_no_sleep_when_window_already_elapsed():
    p, clk = _pacer(rate_limit=4)
    p.after_wave(2)
    clk.t += 75.0                        # window naturally over
    p.after_wave(2)
    assert clk.sleeps == []              # elapsed >= 60 -> no sleep


def test_pacer_caps_wave_size_in_engine(spark, corpus_df, tmp_path):
    """rate_limit bounds every wave's dequeue (requests/min contract)."""
    from crawler_to_md_spark.operators.politeness import Pacer

    clk = _FakeClock()
    clk.sleeps = []
    cfg = CrawlConfig(scope_domain="example.com", max_retries=1, max_waves=8)
    eng = CrawlEngine(
        spark, str(tmp_path / "wh_rl"), corpus=corpus_df, config=cfg,
        pacer=Pacer(rate_limit=25, clock=clk, sleeper=clk.sleep),
    )
    eng.seed([corpus.seed_url()])
    eng.run()
    waves = eng.metrics().select("dequeued").collect()
    assert all(r["dequeued"] <= 25 for r in waves)
    # every full window triggered a sleep of <= 60s
    assert clk.sleeps and all(0 < s <= 60.0 for s in clk.sleeps)


def test_flag_unseen_matches_filter_unseen(spark):
    """flag_unseen's UNSEEN verdict must be exactly filter_unseen's row set,
    on both the no-bloom path and the bloom-prefiltered two-branch path."""
    from crawler_to_md_spark.functions.bloom import BloomShards
    from crawler_to_md_spark.operators import schedule
    from crawler_to_md_spark.functions import urlkit

    urls = [f"https://h{i % 7}.example.com/docs/p{i}" for i in range(200)]
    cand = spark.createDataFrame(
        [(u, f"h{i % 7}.example.com", (i % 5) + 1) for i, u in enumerate(urls)],
        "url string, host string, depth int",
    ).withColumn("url_hash", urlkit.url_hash(F.col("url")))
    seen = cand.filter("depth <= 2").select("url", "url_hash")

    blooms = [None]
    bloom = BloomShards.empty(num_shards=4, m_bits=1 << 14, num_hashes=4)
    bloom.add_dataframe(seen)
    blooms.append(bloom)

    for b in blooms:
        c = schedule.with_bloom_flag(cand, b)
        want = {
            r["url"]
            for r in schedule.filter_unseen(c, seen, b, seen_count=80).collect()
        }
        flagged = schedule.flag_unseen(c, seen, b, seen_count=80).collect()
        assert len(flagged) == 200  # every candidate kept, none duplicated
        got = {r["url"] for r in flagged if r[schedule.UNSEEN_COL]}
        assert got == want
        assert want == set(urls) - {r["url"] for r in seen.collect()}


def test_observation_miss_is_engine_scoped(spark, corpus_df, tmp_path):
    """One engine's missed Observation downgrades only THAT engine to the
    agg fallback (VERDICT r03 'What's wrong #4': the flag used to be a
    process global, so one miss poisoned every engine in the process)."""
    from pyspark.sql import Observation

    from crawler_to_md_spark.operators.crawl import _observation_result

    # forced miss: an Observation never attached to any plan times out
    poisoned: dict = {}
    assert _observation_result(Observation("never-attached"),
                               timeout=0.2, state=poisoned) is None
    assert poisoned.get("obs_unavailable")
    # the miss is remembered in ITS state dict only
    fresh: dict = {}
    assert not fresh.get("obs_unavailable")

    # engine-level: a poisoned engine still crawls correctly (agg
    # fallback), and a SECOND engine in the same process keeps the
    # observed-metrics fast path
    eng1 = CrawlEngine(
        spark, str(tmp_path / "wh1"), corpus=corpus_df,
        config=CrawlConfig(scope_domain="example.com", max_retries=3,
                           max_waves=2),
    )
    eng1._obs_state["obs_unavailable"] = True
    eng1.seed([corpus.seed_url()])
    out1 = eng1.run()
    assert out1["dequeued"] > 0
    assert eng1._obs_state["obs_unavailable"]          # stays downgraded

    eng2 = CrawlEngine(
        spark, str(tmp_path / "wh2"), corpus=corpus_df,
        config=CrawlConfig(scope_domain="example.com", max_retries=3,
                           max_waves=2),
    )
    eng2.seed([corpus.seed_url()])
    out2 = eng2.run()
    assert out2["dequeued"] == out1["dequeued"]
    # observed metrics worked for the fresh engine — no fallback flag
    assert not eng2._obs_state.get("obs_unavailable")


def test_pipelined_commit_failure_leaves_resumable_store(
        spark, corpus_df, tmp_path):
    """Crash consistency under the pipelined wave loop: if a wave's
    background commit fails, run() must propagate the error, the store
    must stay at the last LANDED snapshot (no torn manifest), and a
    fresh engine on the same warehouse must resume to the same end state
    a clean crawl reaches."""
    eng = CrawlEngine(
        spark, str(tmp_path / "wh"), corpus=corpus_df,
        config=CrawlConfig(scope_domain="example.com", max_retries=3),
    )
    eng.seed([corpus.seed_url()])

    real_commit = eng.store.commit
    calls = {"n": 0}

    def failing_commit(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:          # fail the third wave's commit
            raise RuntimeError("injected commit failure")
        return real_commit(*a, **kw)

    eng.store.commit = failing_commit
    with pytest.raises(RuntimeError, match="injected commit failure"):
        eng.run()
    eng.store.commit = real_commit

    # manifest is the last landed snapshot; lineage is consistent with it
    landed = eng.store.batch_id
    assert landed >= 1
    assert eng.store.lineage["frontier_offset"] == landed

    # a FRESH engine resumes from the snapshot and completes the crawl
    eng2 = CrawlEngine(
        spark, str(tmp_path / "wh"), corpus=corpus_df,
        config=CrawlConfig(scope_domain="example.com", max_retries=3),
    )
    eng2.run_to_completion()
    golden = corpus.python_golden_crawl(500 * M)
    got = {_gid(r["url"]) for r in eng2.links().collect()}
    assert got == set(golden)
    assert eng2.links().filter("NOT visited").count() == 0


def test_bloom_two_branch_path_with_pipelined_commits(
        spark, corpus_df, golden, tmp_path, monkeypatch):
    """Force the >2M-frontier bloom form (sure-new branch + suspect
    anti-join) on every wave by dropping the broadcast bound to 0, with
    bloom on.  Under the pipelined loop the previous wave's bloom shard
    update may still be in flight when the next wave discovers, so a
    just-inserted URL can read bloom-NEGATIVE ("sure new"); the delta
    re-AND guard must close that branch — the end state must equal the
    golden model with ZERO duplicate frontier rows."""
    from crawler_to_md_spark.operators import schedule

    monkeypatch.setattr(schedule, "BROADCAST_SEEN_MAX", 0)
    cfg = CrawlConfig(scope_domain="example.com", max_retries=3,
                      use_bloom=True)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), corpus=corpus_df,
                      config=cfg)
    eng.seed([corpus.seed_url()])
    eng.run_to_completion()
    links = eng.links()
    assert {_gid(r["url"]) for r in links.collect()} == set(golden)
    dupes = (links.groupBy("url").count().filter("count > 1").count())
    assert dupes == 0
