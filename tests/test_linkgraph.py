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
