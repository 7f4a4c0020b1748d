"""Per-host adaptive politeness: Crawl-delay parsing, budget derivation,
the per-host-budget two-phase cap (== textbook window across saltings),
and the engine integration (hosts dequeue at their own rate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.politeness import (
    HOST_BUDGET_UNCAPPED,
    ROBOTS_BROADCAST_MAX,
    adaptive_host_budgets,
    crawl_delay_budgets,
    politeness_cap_per_host,
)
from crawler_to_md_spark.sources.robots import parse_crawl_delay, parse_robots


class TestParseCrawlDelay:
    TEXT = (
        "User-agent: *\n"
        "Crawl-delay: 2\n"
        "Disallow: /tmp\n"
        "\n"
        "User-agent: gptbot\n"
        "Crawl-delay: 30\n"
        "Disallow: /\n"
    )

    def test_star_group(self):
        assert parse_crawl_delay(self.TEXT, "mybot") == 2.0

    def test_specific_group_wins(self):
        assert parse_crawl_delay(self.TEXT, "GPTBot/1.0") == 30.0

    def test_absent_delay(self):
        assert parse_crawl_delay("User-agent: *\nDisallow: /x\n") is None

    def test_malformed_delay_ignored(self):
        assert parse_crawl_delay(
            "User-agent: *\nCrawl-delay: soon\nDisallow: /x\n") is None

    def test_tied_groups_take_max(self):
        text = ("User-agent: *\nCrawl-delay: 1\n\n"
                "User-agent: *\nCrawl-delay: 9\n")
        assert parse_crawl_delay(text, "anybot") == 9.0

    def test_disallow_parse_unchanged(self):
        # the group-extraction refactor must not move parse_robots
        assert parse_robots(self.TEXT, "mybot") == ["/tmp"]
        assert parse_robots(self.TEXT, "GPTBot/1.0") == ["/"]


class TestBudgetDerivation:
    def test_crawl_delay_budgets(self, spark):
        delays = spark.createDataFrame(
            [("slow.com", 30.0), ("fast.com", 0.5), ("none.com", None),
             ("zero.com", 0.0), ("crawlme.com", 120.0)],
            "host string, crawl_delay double")
        got = {r["host"]: r["budget"] for r in
               crawl_delay_budgets(delays, window_seconds=60.0).collect()}
        # floor(60/30)=2, floor(60/0.5)=120, 60/120 -> floor 0 -> min 1;
        # NULL / 0 delays are dropped (default budget applies downstream)
        assert got == {"slow.com": 2, "fast.com": 120, "crawlme.com": 1}

    def test_crawl_delay_budget_clamp(self, spark):
        delays = spark.createDataFrame(
            [("fast.com", 0.5)], "host string, crawl_delay double")
        got = crawl_delay_budgets(delays, 60.0, max_budget=16).collect()
        assert got[0]["budget"] == 16

    def test_adaptive_host_budgets(self, spark):
        failed = spark.createDataFrame(
            [(f"https://h{h}.com/{i}",) for h, n in
             [(1, 1), (2, 3), (3, 40)] for i in range(n)],
            "url string")
        got = {r["host"]: r["budget"] for r in
               adaptive_host_budgets(failed, base_budget=16).collect()}
        # 16>>1=8, 16>>3=2, 16>>min(40,5)=0 -> floor 1
        assert got == {"h1.com": 8, "h2.com": 2, "h3.com": 1}


def _frontier(spark, n=300, hosts=5):
    # skewed: host 0 owns half the rows, like the corpus
    return spark.range(n).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'h0' ELSE 'h' || CAST(1 + id % "
        f"{hosts - 1} AS STRING) END AS host",
        "'https://x/' || CAST(id AS STRING) AS url",
        "xxhash64(CAST(id AS STRING)) AS url_hash",
        "CAST(id % 3 AS LONG) AS priority",
        "CAST(id % 7 AS LONG) AS depth",
    )


def _textbook(rows, budgets, default):
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    keep = set()
    for h, hr in by_host.items():
        hr.sort(key=lambda r: (r["priority"], r["depth"], r["url"]))
        b = budgets.get(h, default)
        keep.update(r["url"] for r in hr[:b])
    return keep


class TestPerHostCap:
    BUDGETS = {"h0": 2, "h1": 7, "h2": 1}

    @pytest.mark.parametrize("salt", [1, 4, 16])
    def test_equals_textbook_across_saltings(self, spark, salt):
        frontier = _frontier(spark)
        budgets = spark.createDataFrame(
            list(self.BUDGETS.items()), "host string, budget int")
        got = {r["url"] for r in politeness_cap_per_host(
            frontier, budgets, default_budget=4, salt_shards=salt).collect()}
        want = _textbook(frontier.collect(), self.BUDGETS, 4)
        assert got == want

    def test_absent_host_uncapped_without_default(self, spark):
        frontier = _frontier(spark)
        budgets = spark.createDataFrame(
            [("h0", 3)], "host string, budget int")
        got = politeness_cap_per_host(frontier, budgets).groupBy("host") \
            .count().collect()
        counts = {r["host"]: r["count"] for r in got}
        assert counts["h0"] == 3
        total = _frontier(spark).groupBy("host").count().collect()
        for r in total:
            if r["host"] != "h0":
                assert counts[r["host"]] == r["count"]  # uncapped

    def test_uncapped_constant_is_huge(self):
        assert HOST_BUDGET_UNCAPPED > 10**9

    def test_join_strategy_thresholds(self, spark):
        frontier = _frontier(spark, n=20)
        budgets = spark.createDataFrame(
            [("h0", 1)], "host string, budget int")
        below = politeness_cap_per_host(
            frontier, budgets, n_hosts_hint=5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in below
        above = politeness_cap_per_host(
            frontier, budgets, n_hosts_hint=ROBOTS_BROADCAST_MAX + 1) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in above


class TestEngineAdaptiveBudgets:
    def test_hosts_dequeue_at_their_own_rate(self, spark, tmp_path_factory):
        from crawler_to_md_spark.operators.crawl import (
            CrawlConfig, CrawlEngine)
        from crawler_to_md_spark.sources import corpus as corpus_mod

        corpus_df = corpus_mod.synth_corpus(
            spark, "/root/testdata/sf0.001", replicas=1)
        wh = str(tmp_path_factory.mktemp("budg") / "wh")
        eng = CrawlEngine(
            spark, wh, corpus=corpus_df,
            config=CrawlConfig(scope_domain="example.com",
                               discover_links=False, host_budget=2))
        h0 = [1, 4, 8, 9]          # h0.example.com, all class ok
        h3 = [2, 78, 154]          # h3.example.com, all class ok
        seeds = [corpus_mod.python_url(g) for g in h0 + h3]
        assert eng.seed(seeds) == len(seeds)
        eng.set_host_budgets(spark.createDataFrame(
            [("h0.example.com", 1)], "host string, budget int"))
        eng.run_to_completion()
        rows = eng.docs().select(
            "url", "batch_id",
            F.expr("parse_url(url, 'HOST')").alias("host")).collect()
        waves = {}
        for r in rows:
            waves.setdefault((r["host"], r["batch_id"]), 0)
            waves[(r["host"], r["batch_id"])] += 1
        h0_waves = sorted(b for (h, b) in waves if h == "h0.example.com")
        h3_waves = sorted(b for (h, b) in waves if h == "h3.example.com")
        # h0 throttled to 1/wave -> 4 distinct waves; h3 default 2/wave -> 2
        assert len(h0_waves) == 4
        assert len(h3_waves) == 2
        for (h, b), n in waves.items():
            assert n <= (1 if h == "h0.example.com" else 2)
