"""Host-level PageRank (operators/linkgraph.py): the distributed integer
power iteration must equal the driver-side reference recurrence EXACTLY
(integer arithmetic ⇒ bit-stable), across partitionings, with dangling
and source-only nodes handled."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators import linkgraph
from crawler_to_md_spark.operators.linkgraph import (
    host_edges,
    pagerank,
    pagerank_base,
    python_pagerank,
)

EDGES = [
    # a small authority structure: 'hub' points everywhere, 'auth' is
    # pointed at by everyone, 'dangle' has no out-links (sink), 'src'
    # has no in-links (teleport-only)
    ("hub", "auth"),
    ("hub", "b"),
    ("hub", "dangle"),
    ("b", "auth"),
    ("src", "auth"),
    ("src", "hub"),
    ("auth", "hub"),
]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_matches_python_reference_exactly(self, spark):
        got = _spark_ranks(spark, EDGES, iterations=4)
        assert got == python_pagerank(EDGES, iterations=4)

    def test_zero_iterations_is_uniform_unit(self, spark):
        got = _spark_ranks(spark, EDGES, iterations=0, unit=1000)
        assert set(got.values()) == {1000}

    def test_ranking_signal(self, spark):
        # 'hub' receives auth's entire mass, 'auth' has 3 in-links, 'b'
        # shares hub's mass, 'src' gets teleport only
        got = _spark_ranks(spark, EDGES, iterations=6)
        assert got["hub"] > got["auth"] > got["b"] > got["src"]

    def test_partitioning_invariance(self, spark):
        # integer arithmetic: identical ranks no matter how the edge list
        # is partitioned (float PageRank fails this — low bits drift with
        # summation order)
        df = spark.createDataFrame(EDGES, "src string, dst string")
        a = {r["node"]: r["rank"]
             for r in pagerank(df.repartition(1), iterations=5).collect()}
        b = {r["node"]: r["rank"]
             for r in pagerank(df.repartition(7, "dst"), iterations=5).collect()}
        assert a == b

    def test_mass_conservation_bound(self, spark):
        # the update is a convex combination: total mass never exceeds
        # n_nodes * unit (the overflow contract in the module docstring)
        unit = 10**12
        got = _spark_ranks(spark, EDGES, iterations=8, unit=unit)
        assert sum(got.values()) <= len(got) * unit

    def test_checkpoint_cadence_does_not_change_result(self, spark):
        df = spark.createDataFrame(EDGES, "src string, dst string")
        a = {r["node"]: r["rank"]
             for r in pagerank(df, iterations=5, checkpoint_every=1).collect()}
        b = {r["node"]: r["rank"]
             for r in pagerank(df, iterations=5, checkpoint_every=100).collect()}
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame(EDGES, "src string, dst string")
        with pytest.raises(ValueError):
            pagerank(df, iterations=-1)
        with pytest.raises(ValueError):
            pagerank(df, damp_num=5, damp_den=5)

    def test_base_term(self):
        assert pagerank_base(10**12, 4, 5) == 2 * 10**11


class TestHostEdges:
    def test_collapse_and_self_loop_drop(self, spark):
        rows = [
            ("https://a.com/x", "https://b.com/y"),
            ("https://a.com/z", "https://b.com/w"),   # same host pair -> 1 edge
            ("https://a.com/p", "https://a.com/q"),   # self loop -> dropped
            ("https://A.com:443/r", "https://c.com/s"),  # host is lowercased
        ]
        df = spark.createDataFrame(rows, "src_url string, dst_url string")
        got = {(r["src"], r["dst"]) for r in host_edges(df).collect()}
        assert got == {("a.com", "b.com"), ("a.com", "c.com")}

    def test_end_to_end_rank_over_urls(self, spark):
        rows = [
            ("https://x.com/1", "https://y.com/1"),
            ("https://z.com/1", "https://y.com/1"),
            ("https://y.com/1", "https://x.com/1"),
        ]
        df = spark.createDataFrame(rows, "src_url string, dst_url string")
        ranks = {r["node"]: r["rank"]
                 for r in pagerank(host_edges(df), iterations=4).collect()}
        expected = python_pagerank(
            [("x.com", "y.com"), ("z.com", "y.com"), ("y.com", "x.com")],
            iterations=4)
        assert ranks == expected
        assert ranks["y.com"] > ranks["z.com"]


class TestHostPriorityJoin:
    @pytest.fixture(scope="class")
    def pending(self, spark):
        rows = [("https://a.com/1", "a.com", 2),
                ("https://b.com/1", "b.com", 0),
                ("https://c.com/1", "c.com", 1)]
        return spark.createDataFrame(rows, "url string, host string, depth int")

    def test_none_is_bfs_depth(self, spark, pending):
        from crawler_to_md_spark.operators.politeness import host_priority_join
        got = {r["url"]: r["priority"]
               for r in host_priority_join(pending, None).collect()}
        assert got == {"https://a.com/1": 2, "https://b.com/1": 0,
                       "https://c.com/1": 1}

    def test_join_and_unranked_last(self, spark, pending):
        from crawler_to_md_spark.operators.politeness import (
            HOST_PRIORITY_UNRANKED, host_priority_join)
        prio = spark.createDataFrame(
            [("a.com", -500), ("c.com", -900)], "host string, priority long")
        got = {r["host"]: r["priority"]
               for r in host_priority_join(pending, prio).collect()}
        assert got == {"a.com": -500, "c.com": -900,
                       "b.com": HOST_PRIORITY_UNRANKED}

    def test_broadcast_below_threshold_shuffle_above(self, spark, pending):
        from crawler_to_md_spark.operators.politeness import (
            ROBOTS_BROADCAST_MAX, host_priority_join)
        prio = spark.createDataFrame(
            [("a.com", -1)], "host string, priority long")
        below = host_priority_join(pending, prio, n_hosts_hint=10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in below
        above = host_priority_join(
            pending, prio, n_hosts_hint=ROBOTS_BROADCAST_MAX + 1) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in above
        assert "ShuffledHashJoin" in above


class TestEnginePriorityDiscipline:
    def test_pagerank_priority_changes_dequeue_order(
            self, spark, tmp_path_factory):
        from crawler_to_md_spark.operators.crawl import (
            CrawlConfig, CrawlEngine)
        from crawler_to_md_spark.sources import corpus as corpus_mod

        corpus_df = corpus_mod.synth_corpus(
            spark, "/root/testdata/sf0.001", replicas=1)
        wh = str(tmp_path_factory.mktemp("prio") / "wh")
        eng = CrawlEngine(
            spark, wh, corpus=corpus_df,
            config=CrawlConfig(scope_domain="example.com",
                               discover_links=False, global_budget=1))
        # g=1 -> h0, g=2 -> h3, g=3 -> h4; all class ok
        seeds = [corpus_mod.python_url(g) for g in (1, 2, 3)]
        assert eng.seed(seeds) == 3
        # authority order reverses the default (depth, url) order:
        # h4 first, then h3; h0 is unranked -> last
        prio = spark.createDataFrame(
            [("h4.example.com", -900), ("h3.example.com", -500)],
            "host string, priority long")
        eng.set_host_priority(prio)
        eng.run_to_completion()
        batch = {r["url"]: r["batch_id"] for r in eng.docs().collect()}
        u1, u2, u3 = seeds
        assert batch[u3] < batch[u2] < batch[u1]


class TestAnchorTextIndex:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        from pyspark.sql import Row
        from crawler_to_md_spark.store.schemas import SPANS_TYPE
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType([StructField("url", StringType(), False),
                             StructField("spans", SPANS_TYPE)])

        def link(text, ref, off):
            return Row(kind="link", text=text, media_ref=ref, offset=off)

        rows = [
            # two pages call /t "guide"; one calls it "docs"; p1 repeats
            # the same link twice (counts once); p3 links elsewhere
            ("https://a.com/p1", [link("guide", "https://a.com/t", 0),
                                  link("guide", "https://a.com/t", 1),
                                  link("other", "https://a.com/x", 2)]),
            ("https://a.com/p2", [link("guide", "/t", 0),     # relative
                                  link("docs", "https://a.com/t", 1)]),
            ("https://a.com/p3", [link("guide", "mailto:x@y", 0)]),  # junk
        ]
        return spark.createDataFrame(rows, schema)

    def test_counts_and_dedup(self, spark, docs):
        got = {(r["url"], r["anchor"]): r["n_refs"]
               for r in linkgraph.anchor_text_index(docs).collect()}
        assert got == {
            ("https://a.com/t", "guide"): 2,   # p1 repeat counted once
            ("https://a.com/t", "docs"): 1,
            ("https://a.com/x", "other"): 1,
        }

    @pytest.mark.parametrize("salt", [1, 4])
    def test_topk_equals_textbook(self, spark, docs, salt):
        # k=1 keeps the most-cited anchor, ties broken by anchor text
        got = {r["url"]: (r["anchor"], r["n_refs"])
               for r in linkgraph.anchor_text_index(
                   docs, k=1, salt_shards=salt).collect()}
        assert got["https://a.com/t"] == ("guide", 2)

    def test_scope_filter(self, spark, docs):
        from pyspark.sql import Row
        from crawler_to_md_spark.store.schemas import SPANS_TYPE
        from pyspark.sql.types import StringType, StructField, StructType
        schema = StructType([StructField("url", StringType(), False),
                             StructField("spans", SPANS_TYPE)])
        rows = [("https://a.com/p", [
            Row(kind="link", text="in", media_ref="https://a.com/q", offset=0),
            Row(kind="link", text="out", media_ref="https://b.org/r", offset=1),
        ])]
        df = spark.createDataFrame(rows, schema)
        got = {r["url"] for r in linkgraph.anchor_text_index(
            df, scope_domain="a.com").collect()}
        assert got == {"https://a.com/q"}
