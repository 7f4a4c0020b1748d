"""Crawl-health operators (soft-404 + trap detection) and the
split/shuffle + semantic-decontamination curation additions: value-level
checks against hand-built fixtures plus the plan-shape properties that
keep each operator corpus-size-proof."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators import crawlhealth, curation, sampling


# ---------------------------------------------------------------------------
# Soft-404 detection
# ---------------------------------------------------------------------------

class TestSoft404:
    def _pages(self, spark):
        # hostA: 4/6 pages share the placeholder body, 2 unique
        # hostB: all 3 pages unique -> nothing to flag
        rows = [("hostA", f"https://hostA/p{i}", "not found") for i in range(4)]
        rows += [("hostA", "https://hostA/u1", "real content one"),
                 ("hostA", "https://hostA/u2", "real content two")]
        rows += [("hostB", f"https://hostB/p{i}", f"unique {i}")
                 for i in range(3)]
        return spark.createDataFrame(rows, "host string, url string, text string")

    def test_flags_dominant_digest_only(self, spark):
        out = crawlhealth.soft404_report(
            self._pages(spark), min_pages=3, share_num=1, share_den=2
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r["host"] == "hostA" and r["n_pages"] == 4 and r["host_pages"] == 6

    def test_absolute_floor(self, spark):
        # share test passes (2/3 >= 1/2) but the 3-page floor fails
        rows = [("h", "u1", "dup"), ("h", "u2", "dup"), ("h", "u3", "x")]
        df = spark.createDataFrame(rows, "host string, url string, text string")
        assert crawlhealth.soft404_report(
            df, min_pages=3, share_num=1, share_den=2).count() == 0

    def test_share_test_is_integer_exact(self, spark):
        # exactly at the boundary: 3 of 6 with share 1/2 -> flagged
        rows = [("h", f"u{i}", "dup") for i in range(3)]
        rows += [("h", f"v{i}", f"uniq {i}") for i in range(3)]
        df = spark.createDataFrame(rows, "host string, url string, text string")
        assert crawlhealth.soft404_report(
            df, min_pages=3, share_num=1, share_den=2).count() == 1

    def test_soft404_urls_covers_exactly_the_flagged_family(self, spark):
        urls = {r["url"] for r in crawlhealth.soft404_urls(
            self._pages(spark), min_pages=3, share_num=1, share_den=2
        ).collect()}
        assert urls == {f"https://hostA/p{i}" for i in range(4)}


# ---------------------------------------------------------------------------
# Crawl-trap detection
# ---------------------------------------------------------------------------

class TestTrapReport:
    def test_template_masks_digits_and_query_values(self, spark):
        df = spark.createDataFrame(
            [("https://h12.example.com/cal/2026/01?d=5&s=abc#x4",)], "url string")
        t = df.select(crawlhealth.url_template(F.col("url")).alias("t")) \
            .collect()[0]["t"]
        assert t == "https://hN.example.com/cal/N/N?d=*&s=*#xN"

    def _urls(self, spark):
        trap = [("h1", f"https://h1/cal?date=2026-{i}") for i in range(60)]
        organic = [("h1", f"https://h1/article/the-title-{c}")
                   for c in "abcde"]
        other = [("h2", f"https://h2/cal?date=2026-{i}") for i in range(10)]
        return spark.createDataFrame(
            trap + organic + other, "host string, url string")

    def test_flags_only_exploding_family(self, spark):
        out = crawlhealth.trap_report(self._urls(spark), min_urls=50).collect()
        assert len(out) == 1
        assert out[0]["host"] == "h1" and out[0]["n_urls"] == 60
        assert out[0]["template"] == "https://hN/cal?date=*"

    def test_distinct_first(self, spark):
        # the same 10 URLs presented 10x must not clear a threshold of 50
        dup = spark.createDataFrame(
            [("h", f"https://h/p?id={i % 10}") for i in range(100)],
            "host string, url string")
        assert crawlhealth.trap_report(dup, min_urls=50).count() == 0

    def test_drop_trap_urls(self, spark):
        kept = crawlhealth.drop_trap_urls(self._urls(spark), min_urls=50)
        urls = {r["url"] for r in kept.collect()}
        assert len(urls) == 15  # 5 organic h1 + 10 h2
        assert all("/article/" in u or u.startswith("https://h2/") for u in urls)

    def test_no_python_in_plan(self, spark):
        plan = (crawlhealth.trap_report(self._urls(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Split assignment + global shuffle order
# ---------------------------------------------------------------------------

class TestSplitShuffle:
    def _docs(self, spark, n=200):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def test_split_is_stable_under_growth(self, spark):
        small = sampling.split_assign(self._docs(spark, 100), ["doc_id"],
                                      [("train", 80), ("val", 10), ("test", 10)])
        big = sampling.split_assign(self._docs(spark, 200), ["doc_id"],
                                    [("train", 80), ("val", 10), ("test", 10)])
        s = {r["doc_id"]: r["split"] for r in small.collect()}
        b = {r["doc_id"]: r["split"] for r in big.collect()}
        assert all(b[k] == v for k, v in s.items())

    def test_split_shares_roughly_match_weights(self, spark):
        rows = sampling.split_assign(
            self._docs(spark, 1000), ["doc_id"],
            [("train", 80), ("val", 10), ("test", 10)]).collect()
        counts = {}
        for r in rows:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > 700

    def test_seed_changes_assignment(self, spark):
        a = sampling.split_assign(self._docs(spark), ["doc_id"],
                                  [("a", 1), ("b", 1)], seed="s1")
        b = sampling.split_assign(self._docs(spark), ["doc_id"],
                                  [("a", 1), ("b", 1)], seed="s2")
        da = {r["doc_id"]: r["split"] for r in a.collect()}
        db = {r["doc_id"]: r["split"] for r in b.collect()}
        assert any(da[k] != db[k] for k in da)

    def test_shuffle_pos_is_a_permutation_matching_window_form(self, spark):
        df = self._docs(spark, 300)
        out = sampling.global_shuffle_pos(df, ["doc_id"]).collect()
        poss = sorted(r["shuffle_pos"] for r in out)
        assert poss == list(range(300))
        # equals the textbook single-window rank (small-path gate)
        small = sampling.global_shuffle_pos(
            df, ["doc_id"], approx_rows=300).collect()
        assert ({(r["doc_id"], r["shuffle_pos"]) for r in out}
                == {(r["doc_id"], r["shuffle_pos"]) for r in small})

    def test_no_single_task_window_on_scale_path(self, spark):
        plan = (sampling.global_shuffle_pos(self._docs(spark), ["doc_id"])
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange SinglePartition" not in plan


# ---------------------------------------------------------------------------
# Semantic decontamination
# ---------------------------------------------------------------------------

class TestSemanticDecontam:
    def _sets(self, spark):
        train = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]),      # exact copy of eval 10
             (2, [0.9, 0.1, 0.0]),      # close to eval 10
             (3, [0.0, 1.0, 0.0]),      # orthogonal
             (4, [0.0, 0.0, 1.0])],     # exact copy of eval 11
            "vec_id long, emb array<double>")
        ev = spark.createDataFrame(
            [(10, [1.0, 0.0, 0.0]), (11, [0.0, 0.0, 1.0])],
            "eval_id long, emb array<double>")
        return train, ev

    def test_flags_copies_and_near_copies(self, spark):
        train, ev = self._sets(spark)
        out = {r["vec_id"]: (r["n_eval_hits"], r["max_cos"])
               for r in curation.semantic_decontaminate(
                   train, ev, threshold=0.95).collect()}
        assert set(out) == {1, 2, 4}
        assert out[1] == (1, 1.0) and out[4] == (1, 1.0)
        assert out[2][0] == 1 and 0.95 <= out[2][1] < 1.0

    def test_threshold_excludes_orthogonal(self, spark):
        train, ev = self._sets(spark)
        out = curation.semantic_decontaminate(train, ev, threshold=1.0)
        assert {r["vec_id"] for r in out.collect()} == {1, 4}

    def test_eval_side_is_broadcast(self, spark):
        train, ev = self._sets(spark)
        plan = (curation.semantic_decontaminate(train, ev)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# Engine trap guard (CrawlConfig.trap_min_urls)
# ---------------------------------------------------------------------------

class TestEngineTrapGuard:
    def test_trap_family_never_dequeues(self, spark, tmp_path):
        """Static frontier seeded with a 60-URL calendar family plus 5
        organic pages: with trap_min_urls=50 the family is excluded from
        every wave's dequeue (stays unvisited), the organic pages are
        fetched, and the run terminates without paying for the trap."""
        from crawler_to_md_spark.operators.crawl import (
            CrawlConfig, CrawlEngine,
        )
        from crawler_to_md_spark.sources import corpus

        eng = CrawlEngine(
            spark, str(tmp_path / "wh"),
            corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001",
                                       replicas=1),
            config=CrawlConfig(scope_domain="example.com", max_retries=0,
                               discover_links=False, trap_min_urls=50),
        )
        trap = [f"https://h1.example.com/cal?date=2026-{i}"
                for i in range(60)]
        organic = [corpus.python_url(g) for g in (0, 3, 5, 8, 10)]
        assert eng.seed(trap + organic) == 65
        eng.run_to_completion()
        rows = eng.links().collect()
        trap_rows = [r for r in rows if "/cal?" in r["url"]]
        organic_rows = [r for r in rows if "/docs/" in r["url"]]
        assert len(trap_rows) == 60
        assert all(not r["visited"] for r in trap_rows)
        assert len(organic_rows) == 5
        assert all(r["visited"] for r in organic_rows)


# ---------------------------------------------------------------------------
# Curriculum bucketing
# ---------------------------------------------------------------------------

class TestCurriculumBuckets:
    def _scored(self, spark, n=100):
        return spark.range(n).selectExpr(
            "id AS doc_id", "CAST((id * 37) % 100 AS DOUBLE) AS score")

    def test_exact_quantile_membership(self, spark):
        out = sampling.curriculum_buckets(
            self._scored(spark), "score", ["doc_id"], n_buckets=4)
        sizes = {r["bucket"]: 0 for r in out.collect()}
        by_bucket = {}
        for r in out.collect():
            by_bucket.setdefault(r["bucket"], []).append(r["score"])
        assert sorted(by_bucket) == [0, 1, 2, 3]
        assert all(len(v) == 25 for v in by_bucket.values())
        # buckets are ordered: every score in bucket b <= min of bucket b+1
        for b in range(3):
            assert max(by_bucket[b]) <= min(by_bucket[b + 1])

    def test_partitioning_invariance(self, spark):
        df = self._scored(spark, 97)            # non-divisible count
        a = {(r["doc_id"], r["bucket"]) for r in sampling.curriculum_buckets(
            df.repartition(7), "score", ["doc_id"], n_buckets=5).collect()}
        b = {(r["doc_id"], r["bucket"]) for r in sampling.curriculum_buckets(
            df.coalesce(1), "score", ["doc_id"], n_buckets=5).collect()}
        assert a == b

    def test_tie_break_is_total(self, spark):
        # all-equal scores: bucket assignment is decided by doc_id alone
        df = spark.range(40).selectExpr("id AS doc_id", "1.0 AS score")
        out = {r["doc_id"]: r["bucket"] for r in sampling.curriculum_buckets(
            df, "score", ["doc_id"], n_buckets=4).collect()}
        assert all(out[i] == i // 10 for i in range(40))


# ---------------------------------------------------------------------------
# Mirror-host detection
# ---------------------------------------------------------------------------

class TestMirrorHosts:
    def _pages(self, spark, rows):
        return spark.createDataFrame(rows, "host string, text string")

    def test_full_mirror_pair(self, spark):
        rows = [("a.com", f"doc {i}") for i in range(5)]
        rows += [("b.com", f"doc {i}") for i in range(5)]       # full mirror
        rows += [("c.com", f"other {i}") for i in range(5)]     # unrelated
        out = crawlhealth.host_mirror_pairs(self._pages(spark, rows)).collect()
        assert [(r["host_a"], r["host_b"], r["n_shared"]) for r in out] \
            == [("a.com", "b.com", 5)]

    def test_partial_mirror_uses_min_host_size(self, spark):
        # small mirror carries 3 of big origin's 10 pages: 3 >= 1/2 * 3
        rows = [("big.com", f"doc {i}") for i in range(10)]
        rows += [("small.com", f"doc {i}") for i in range(3)]
        out = crawlhealth.host_mirror_pairs(self._pages(spark, rows)).collect()
        assert len(out) == 1 and out[0]["n_shared"] == 3

    def test_boilerplate_digest_cut_by_cap(self, spark):
        # one licence page shared by 30 hosts must create NO pairs
        rows = [(f"h{i}.com", "identical licence text") for i in range(30)]
        rows += [(f"h{i}.com", f"own page {i}") for i in range(30)]
        out = crawlhealth.host_mirror_pairs(
            self._pages(spark, rows), min_shared=1, share_num=1,
            share_den=2, max_hosts_per_digest=20).collect()
        assert out == []

    def test_transitive_collapse_one_cluster(self, spark):
        # a~b and b~c but a shares nothing with c: one cluster, min label
        rows = [("a.com", f"ab {i}") for i in range(4)]
        rows += [("b.com", f"ab {i}") for i in range(4)]
        rows += [("b.com", f"bc {i}") for i in range(4)]
        rows += [("c.com", f"bc {i}") for i in range(4)]
        out = {r["host"]: r["mirror_group"]
               for r in crawlhealth.mirror_clusters(
                   self._pages(spark, rows)).collect()}
        assert out == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com"}


class TestHostExclusions:
    def test_excluded_host_never_dequeues(self, spark, tmp_path):
        """set_host_exclusions (the mirror_clusters consumer): pending
        URLs on a listed host stay unvisited while other hosts crawl."""
        from crawler_to_md_spark.operators.crawl import (
            CrawlConfig, CrawlEngine,
        )
        from crawler_to_md_spark.sources import corpus

        eng = CrawlEngine(
            spark, str(tmp_path / "wh"),
            corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001",
                                       replicas=1),
            config=CrawlConfig(scope_domain="example.com", max_retries=0,
                               discover_links=False),
        )
        blocked = [f"https://h1.example.com/docs/p{i}" for i in range(5)]
        kept = [corpus.python_url(g) for g in (0, 3, 5)]
        assert eng.seed(blocked + kept) == 8
        eng.set_host_exclusions(
            spark.createDataFrame([("h1.example.com",)], "host string"))
        eng.run_to_completion()
        rows = eng.links().collect()
        assert all(not r["visited"] for r in rows
                   if r["host"] == "h1.example.com")
        assert all(r["visited"] for r in rows
                   if r["host"] != "h1.example.com")
