"""SnapshotStore commit/rollback/resume + bloom shard semantics + helpers.

Mirrors the reference storage contract exercised by
tests/test_database_manager.py (atomic batch commit, dedup-insert counting,
resume) and the north rule's bloom-shard / lineage requirements.
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.functions.bloom import BloomShards
from crawler_to_md_spark.operators.politeness import (
    global_cap,
    politeness_cap,
    robots_filter,
)
from crawler_to_md_spark.operators.seq import with_ordered_seq
from crawler_to_md_spark.store.warehouse import SnapshotStore


# ---------------------------------------------------------------------------
# SnapshotStore
# ---------------------------------------------------------------------------


def test_commit_read_roundtrip(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    df = spark.range(10).withColumnRenamed("id", "x")
    store.commit({"t": df}, batch_id=0, lineage={"bloom_version": 1})
    assert store.batch_id == 0
    assert store.lineage["bloom_version"] == 1
    assert store.read("t").count() == 10


def test_commit_carries_forward_unwritten_tables(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    store.commit({"a": spark.range(5), "b": spark.range(3)}, batch_id=0)
    store.commit({"a": spark.range(7)}, batch_id=1)
    assert store.read("a").count() == 7
    assert store.read("b").count() == 3  # untouched snapshot carried forward


def test_rollback_restores_previous_snapshot(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    store.commit({"t": spark.range(5)}, batch_id=0)
    store.commit({"t": spark.range(9)}, batch_id=1)
    store.rollback()
    assert store.batch_id == 0
    assert store.read("t").count() == 5


def test_gc_prunes_old_snapshots(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"), retain=1)
    for b in range(4):
        store.commit({"t": spark.range(b + 1)}, batch_id=b)
    snaps = sorted(os.listdir(tmp_path / "wh" / "t"))
    assert len(snaps) <= 2  # live + retained history only
    assert store.read("t").count() == 4


def test_atomic_manifest_no_tmp_left(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path / "wh"))
    store.commit({"t": spark.range(2)}, batch_id=0)
    assert not os.path.exists(str(tmp_path / "wh" / "manifest.json.tmp"))


# ---------------------------------------------------------------------------
# BloomShards
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def hashed(spark):
    return spark.range(2000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    ).cache()


def test_bloom_no_false_negatives(spark, hashed):
    bloom = BloomShards.empty(num_shards=8, m_bits=1 << 16, num_hashes=5)
    bloom.add_dataframe(hashed)
    got = hashed.withColumn("m", bloom.might_contain_udf(spark)(F.col("url_hash")))
    assert got.filter(~F.col("m")).count() == 0


def test_bloom_filters_most_unseen(spark, hashed):
    bloom = BloomShards.empty(num_shards=8, m_bits=1 << 16, num_hashes=5)
    bloom.add_dataframe(hashed)
    unseen = spark.range(2000, 12000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
    )
    fp = unseen.withColumn(
        "m", bloom.might_contain_udf(spark)(F.col("url_hash"))
    ).filter("m").count()
    assert fp / 10000 < 0.02  # 2k keys in 64kbit/shard x 8 -> tiny FP rate


def test_bloom_save_load_roundtrip(spark, hashed, tmp_path):
    bloom = BloomShards.empty(num_shards=4, m_bits=1 << 14, num_hashes=4)
    bloom.add_dataframe(hashed)
    bloom.save(str(tmp_path / "bloom"))
    loaded = BloomShards.load(str(tmp_path / "bloom"), bloom.version)
    assert loaded.version == bloom.version
    for s in range(4):
        assert np.array_equal(loaded.bitmaps[s], bloom.bitmaps[s])


def test_bloom_incremental_update_versions(spark, hashed, tmp_path):
    bloom = BloomShards.empty(num_shards=4, m_bits=1 << 14, num_hashes=4)
    bloom.add_dataframe(hashed.limit(100))
    v1 = bloom.version
    bloom.add_dataframe(hashed)
    assert bloom.version == v1 + 1
    got = hashed.withColumn("m", bloom.might_contain_udf(spark)(F.col("url_hash")))
    assert got.filter(~F.col("m")).count() == 0


# ---------------------------------------------------------------------------
# ordered seq
# ---------------------------------------------------------------------------


def test_with_ordered_seq_dense_rank(spark):
    df = spark.range(500).select(
        F.concat(F.lit("k"), F.lpad(F.col("id") * 7919 % 500, 4, "0")).alias("k")
    )
    out = with_ordered_seq(df, ["k"], num_partitions=7).collect()
    by_seq = sorted(out, key=lambda r: r["seq"])
    assert [r["seq"] for r in by_seq] == list(range(500))
    assert [r["k"] for r in by_seq] == sorted(r["k"] for r in out)


# ---------------------------------------------------------------------------
# politeness / robots
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def frontier(spark):
    # hot host h0 with 900 urls, cold hosts with 40 each — skewed like the corpus
    rows = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("h0")).otherwise(
            F.concat(F.lit("h"), (F.col("id") % 5 + 1).cast("string"))
        ).alias("host"),
        F.concat(F.lit("https://x/"), F.lpad("id", 5, "0")).alias("url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.lit(0).alias("priority"),
        (F.col("id") % 3).cast("int").alias("depth"),
    )
    return rows.cache()


def test_politeness_exact_per_host_budget(frontier):
    capped = politeness_cap(frontier, host_budget=50, salt_shards=4)
    counts = {r["host"]: r["n"] for r in
              capped.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts["h0"] == 50
    for h, n in counts.items():
        if h != "h0":
            assert n <= 50


def test_politeness_selects_true_top_by_priority(frontier):
    """Two-phase salted capping must select exactly the global per-host
    top-k by (priority, depth, url) — same result as a plain window."""
    from pyspark.sql import Window

    capped = politeness_cap(frontier, host_budget=13, salt_shards=4)
    w = Window.partitionBy("host").orderBy("priority", "depth", "url")
    exact = frontier.withColumn("rn", F.row_number().over(w)).filter("rn <= 13")
    got = {(r["host"], r["url"]) for r in capped.collect()}
    want = {(r["host"], r["url"]) for r in exact.collect()}
    assert got == want


def test_global_cap_priority_limit(frontier):
    got = global_cap(frontier, 10)
    assert got.count() == 10


def test_robots_filter_blocks_prefixes(spark):
    batch = spark.createDataFrame(
        [("h0", "https://h0/docs/a"), ("h0", "https://h0/private/x"),
         ("h1", "https://h1/private/y")],
        "host string, url string",
    )
    robots = spark.createDataFrame(
        [("h0", ["/private"])], "host string, disallow array<string>"
    )
    kept = {r["url"] for r in robots_filter(batch, robots).collect()}
    # h1 has no robots row -> allowed; h0 /private blocked
    assert kept == {"https://h0/docs/a", "https://h1/private/y"}


# ---------------------------------------------------------------------------
# executor-side shard files (BloomShardStore — the scale path)
# ---------------------------------------------------------------------------


def test_shardstore_no_false_negatives_and_fp_rate(spark, hashed, tmp_path):
    from crawler_to_md_spark.functions.bloom import BloomShardStore

    st = BloomShardStore.create(str(tmp_path / "bloom"), num_shards=8,
                                m_bits=1 << 16, num_hashes=5)
    st.add_dataframe(hashed)
    got = hashed.withColumn("m", st.might_contain_udf(spark)(F.col("url_hash")))
    assert got.filter(~F.col("m")).count() == 0
    unseen = spark.range(2000, 12000).select(
        F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash"))
    fp = unseen.withColumn(
        "m", st.might_contain_udf(spark)(F.col("url_hash"))).filter("m").count()
    assert fp / 10000 < 0.02


def test_shardstore_incremental_versions_and_reopen(spark, hashed, tmp_path):
    """Per-wave updates bump only touched shards; reopening an OLD version
    must not see newer URLs (snapshot lineage pins bloom_version)."""
    from crawler_to_md_spark.functions.bloom import BloomShardStore

    d = str(tmp_path / "bloom")
    st = BloomShardStore.create(d, num_shards=8, m_bits=1 << 16, num_hashes=5)
    first = hashed.limit(500)
    st.add_dataframe(first)
    v1 = st.version
    assert v1 == 1
    more = spark.range(50000, 50200).select(
        F.xxhash64(F.concat(F.lit("x"), F.col("id"))).alias("url_hash"))
    st.add_dataframe(more)
    assert st.version == 2
    # new version sees both sets
    st2 = BloomShardStore.open(d, 2)
    assert more.withColumn(
        "m", st2.might_contain_udf(spark)(F.col("url_hash"))
    ).filter(~F.col("m")).count() == 0
    # old version: none of `more` was ever added -> mostly negative
    st1 = BloomShardStore.open(d, v1)
    pos = more.withColumn(
        "m", st1.might_contain_udf(spark)(F.col("url_hash"))
    ).filter("m").count()
    assert pos < 20
    # shard files are versioned, not overwritten in place
    files = sorted(os.listdir(d))
    assert any("-v00000001" in f for f in files)
    assert any("-v00000002" in f for f in files)


def test_shardstore_update_touches_only_dirty_shards(spark, tmp_path):
    from crawler_to_md_spark.functions.bloom import BloomShardStore

    d = str(tmp_path / "bloom")
    st = BloomShardStore.create(d, num_shards=8, m_bits=1 << 16, num_hashes=5)
    # hashes all congruent to one shard
    one = spark.range(200).select((F.col("id") * 8 + 3).alias("url_hash"))
    st.add_dataframe(one)
    assert st.shard_versions[3] == 1
    assert all(v == 0 for s, v in st.shard_versions.items() if s != 3)


def test_with_ordered_seq_scale_path_exact(spark):
    """Regression: RangePartitioner samples boundaries with a seed that
    includes the (per-execution) shuffle RDD id, so the counts job and the
    rank job could land rows in DIFFERENT partitions — ~78% wrong ranks
    over 1M rows before the eager-checkpoint fix.  Small inputs sample
    every row and never trip it; 200k rows do."""
    n = 200_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("k"))
    for kwargs in ({}, {"num_partitions": 16}):
        out = with_ordered_seq(df, ["k"], **kwargs).collect()
        assert len(out) == n
        by_seq = sorted(out, key=lambda r: r["seq"])
        assert [r["seq"] for r in by_seq] == list(range(n))
        ks = [r["k"] for r in by_seq]
        assert ks == sorted(ks)
