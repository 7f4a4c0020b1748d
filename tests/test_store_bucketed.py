"""Bucketed snapshot-store tests: wave commits must rewrite only buckets
containing touched rows (VERDICT round-1 '#1 scale-killer': every wave
rewrote the whole links/docs table)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.store.schemas import LINKS_SCHEMA, METRICS_SCHEMA
from crawler_to_md_spark.store.warehouse import (
    AppendUpdate,
    BucketedUpdate,
    SnapshotStore,
)

B = 8


def _links_df(spark, urls, visited=False):
    base = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, seq long")
    return base.select(
        "url", F.xxhash64("url").alias("url_hash"), F.lit("h").alias("host"),
        F.lit(visited).alias("visited"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("depth"),
        F.lit(0).cast("long").alias("batch_id"), "seq",
    )


@pytest.fixture()
def store(spark, tmp_path):
    return SnapshotStore(spark, str(tmp_path / "wh"),
                         schemas={"links": LINKS_SCHEMA,
                                  "metrics": METRICS_SCHEMA})


def test_partial_commit_rewrites_only_dirty_buckets(spark, store):
    base = _links_df(spark, [f"https://h/p{i}" for i in range(200)])
    store.commit({"links": BucketedUpdate(base, list(range(B)), B)}, batch_id=0)
    entry0 = store.bucket_entry("links")
    assert entry0 and entry0["n_buckets"] == B
    assert store.read("links").count() == 200

    # touch exactly the rows of one bucket
    target = 3
    touched = store.read_buckets("links", [target]).withColumn(
        "visited", F.lit(True))
    n_touched = touched.count()
    assert 0 < n_touched < 200
    store.commit({"links": BucketedUpdate(touched, [target], B)}, batch_id=1)

    entry1 = store.bucket_entry("links")
    # only the dirty bucket points at the new snapshot
    moved = [b for b in map(str, range(B))
             if entry1["buckets"][b] != entry0["buckets"][b]]
    assert moved == [str(target)]
    assert entry1["buckets"][str(target)].startswith("links/snap-00000001")
    # the new snap dir contains ONLY that bucket
    snap1 = os.path.join(store.dir, "links", "snap-00000001")
    assert [d for d in sorted(os.listdir(snap1)) if d.startswith("__b=")] == [
        f"__b={target}"]
    # logical content correct: total rows unchanged, visited only in bucket
    assert store.read("links").count() == 200
    assert store.read("links").filter("visited").count() == n_touched


def test_rows_outside_dirty_set_are_dropped_not_split_brained(spark, store):
    base = _links_df(spark, [f"https://h/p{i}" for i in range(50)])
    store.commit({"links": BucketedUpdate(base, list(range(B)), B)}, batch_id=0)
    # declare only bucket 0 dirty but hand the full table as replacement:
    # rows landing in other buckets must be ignored (guard filter), so
    # every non-dirty bucket keeps exactly its previous content
    upd = store.read("links").withColumn("visited", F.lit(True))
    store.commit({"links": BucketedUpdate(upd, [0], B)}, batch_id=1)
    got = store.read("links")
    assert got.count() == 50
    b0 = got.filter(F.pmod(F.col("url_hash"), F.lit(B)) == 0).count()
    assert got.filter("visited").count() == b0


def test_append_only_metrics_segments(spark, store):
    for i in range(3):
        row = spark.createDataFrame([(i, 1, 1, 1, 0, 0, 0, 0)], METRICS_SCHEMA)
        store.commit({"metrics": AppendUpdate(row)}, batch_id=i)
    entry = store.manifest["tables"]["metrics"]
    assert entry["kind"] == "append" and len(entry["segments"]) == 3
    assert store.read("metrics").count() == 3


def test_empty_bucketed_table_reads_with_schema(spark, store):
    empty = spark.createDataFrame([], LINKS_SCHEMA)
    store.commit({"links": BucketedUpdate(empty, list(range(B)), B)}, batch_id=0)
    df = store.read("links")
    assert df.count() == 0 and df.schema == LINKS_SCHEMA


def test_gc_keeps_carried_forward_buckets(spark, store):
    base = _links_df(spark, [f"https://h/p{i}" for i in range(100)])
    store.commit({"links": BucketedUpdate(base, list(range(B)), B)}, batch_id=0)
    # many partial commits; retain=2 history — snap-0 bucket dirs must
    # survive as long as the live manifest references them
    for k in range(1, 5):
        touched = store.read_buckets("links", [k % B]).withColumn(
            "visited", F.lit(True))
        store.commit({"links": BucketedUpdate(touched, [k % B], B)}, batch_id=k)
    assert store.read("links").count() == 100
    # snapshot-0 dir still exists (most buckets never rewritten)
    assert os.path.isdir(os.path.join(store.dir, "links", "snap-00000000"))


def test_engine_wave_commits_are_incremental(spark, tmp_path):
    """After a multi-wave crawl, the live links entry must reference
    bucket dirs from SEVERAL snapshots — proof that waves carried clean
    buckets forward instead of rewriting the table."""
    from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
    from crawler_to_md_spark.sources import corpus

    eng = CrawlEngine(
        spark, str(tmp_path / "wh"),
        corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001", replicas=1),
        config=CrawlConfig(scope_domain="example.com", max_retries=1,
                           store_buckets=512, global_budget=40),
    )
    eng.seed([corpus.seed_url()])
    eng.run()
    entry = eng.store.bucket_entry("links")
    snaps = {rel.split("/")[1] for rel in entry["buckets"].values() if rel}
    assert len(snaps) > 2, snaps
    # and the crawl state is intact
    assert eng.links().count() == eng.links().select("url").distinct().count()


class TestAppendCompaction:
    def test_metrics_segments_compact_and_preserve_rows(self, spark, tmp_path):
        """Append tables hold one tiny file per wave; at the compaction
        threshold they collapse into ONE segment with identical rows, and
        history-retired segment files are GC'd."""
        from crawler_to_md_spark.store.warehouse import LiteralAppend

        st = SnapshotStore(spark, str(tmp_path / "wh"),
                           schemas={"metrics": METRICS_SCHEMA},
                           compact_segments=10)
        n_waves = 25
        for w in range(1, n_waves + 1):
            st.commit({"metrics": LiteralAppend(
                [(w, 1, w * 10, w, 0, 0, 0, 0)], METRICS_SCHEMA)},
                batch_id=w)
        entry = st.manifest["tables"]["metrics"]
        assert entry["kind"] == "append"
        assert len(entry["segments"]) <= 10           # bounded, not 25
        rows = sorted((r["batch_id"], r["dequeued"])
                      for r in st.read("metrics").collect())
        assert rows == [(w, w * 10) for w in range(1, n_waves + 1)]
        # segment files on disk are bounded too (history retention only)
        segs = [d for d in os.listdir(os.path.join(st.dir, "metrics"))]
        assert len(segs) <= 10 + st.retain

    def test_compaction_keeps_rollback_consistent(self, spark, tmp_path):
        from crawler_to_md_spark.store.warehouse import LiteralAppend

        st = SnapshotStore(spark, str(tmp_path / "wh"),
                           schemas={"metrics": METRICS_SCHEMA},
                           compact_segments=3)
        for w in range(1, 6):
            st.commit({"metrics": LiteralAppend(
                [(w, 1, w, 0, 0, 0, 0, 0)], METRICS_SCHEMA)}, batch_id=w)
        before = st.read("metrics").count()
        st.rollback()
        after = st.read("metrics").count()
        assert (before, after) == (5, 4)

    def test_spark_append_segments_compact_and_preserve_rows(self, spark,
                                                             tmp_path):
        """Spark-written AppendUpdate tables (the robots coverage table)
        compact at the same threshold as LiteralAppend: old segments + the
        new append rewrite as ONE segment with identical rows."""
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)

        from crawler_to_md_spark.store.warehouse import AppendUpdate

        schema = StructType([StructField("host", StringType()),
                             StructField("w", LongType())])
        st = SnapshotStore(spark, str(tmp_path / "wh"),
                           schemas={"robots": schema},
                           compact_segments=4)
        n = 9
        for w in range(1, n + 1):
            df = spark.createDataFrame([(f"h{w}.example.com", w)], schema)
            st.commit({"robots": AppendUpdate(df)}, batch_id=w)
        entry = st.manifest["tables"]["robots"]
        assert entry["kind"] == "append"
        assert len(entry["segments"]) <= 4            # bounded, not 9
        rows = sorted((r["host"], r["w"])
                      for r in st.read("robots").collect())
        assert rows == [(f"h{w}.example.com", w) for w in range(1, n + 1)]


class TestTimeTravel:
    def test_read_at_retained_snapshots(self, spark, tmp_path):
        st = SnapshotStore(spark, str(tmp_path / "tt"), retain=3,
                           schemas={"links": LINKS_SCHEMA})
        for wave in range(4):
            df = _links_df(spark, [f"https://h/w{wave}p{i}"
                                   for i in range((wave + 1) * 10)])
            st.commit({"links": BucketedUpdate(df, list(range(B)), B)},
                      batch_id=wave,
                      lineage={"frontier_offset": wave,
                               "counters": {"seeds": (wave + 1) * 10}})
        assert st.snapshots() == [0, 1, 2, 3]
        # every retained snapshot reads its own committed contents
        for wave in range(4):
            got = st.read_at("links", wave)
            assert got.count() == (wave + 1) * 10
            assert got.filter(
                F.col("url").startswith(f"https://h/w{wave}")
            ).count() == (wave + 1) * 10
        # historized per-partition lineage travels with the snapshot
        assert st.lineage_at(1)["frontier_offset"] == 1
        assert st.lineage_at(3)["counters"]["seeds"] == 40

    def test_expired_snapshot_errors_with_retention_hint(self, spark,
                                                        tmp_path):
        st = SnapshotStore(spark, str(tmp_path / "tt2"), retain=1,
                           schemas={"links": LINKS_SCHEMA})
        for wave in range(3):
            df = _links_df(spark, [f"https://h/w{wave}"])
            st.commit({"links": BucketedUpdate(df, list(range(B)), B)},
                      batch_id=wave)
        assert st.snapshots() == [1, 2]
        with pytest.raises(ValueError, match="retain"):
            st.read_at("links", 0)
        with pytest.raises(ValueError, match="not retained"):
            st.lineage_at(0)

    def test_rollback_restores_historized_lineage(self, spark, tmp_path):
        st = SnapshotStore(spark, str(tmp_path / "tt3"), retain=2,
                           schemas={"links": LINKS_SCHEMA})
        for wave in range(2):
            df = _links_df(spark, [f"https://h/w{wave}"])
            st.commit({"links": BucketedUpdate(df, list(range(B)), B)},
                      batch_id=wave, lineage={"frontier_offset": wave})
        st.rollback()
        assert st.batch_id == 0
        assert st.lineage["frontier_offset"] == 0   # not the undone wave's


class TestSnapshotDiff:
    def test_added_removed_changed_and_null_safety(self, spark, tmp_path):
        from crawler_to_md_spark.store.warehouse import (
            SnapshotStore, snapshot_diff,
        )

        store = SnapshotStore(spark, str(tmp_path / "wh"))
        v1 = spark.createDataFrame(
            [(1, "a", None), (2, "b", "x"), (3, None, "c"), (4, "keep", "k")],
            "id long, c1 string, c2 string")
        store.commit({"t": v1}, batch_id=1)
        v2 = spark.createDataFrame(
            # 1 unchanged; 2 dropped; 3 null-SHIFTED (None,'c')->('c',None)
            # — must read as changed, not unchanged; 4 changed; 5 added
            [(1, "a", None), (3, "c", None), (4, "keep", "K"), (5, "n", "w")],
            "id long, c1 string, c2 string")
        store.commit({"t": v2}, batch_id=2)
        out = {r["id"]: r["change"]
               for r in snapshot_diff(store, "t", 1, 2, ["id"]).collect()}
        assert out == {2: "removed", 3: "changed", 4: "changed", 5: "added"}

    def test_empty_diff_between_identical_snapshots(self, spark, tmp_path):
        from crawler_to_md_spark.store.warehouse import (
            SnapshotStore, snapshot_diff,
        )

        store = SnapshotStore(spark, str(tmp_path / "wh2"))
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        store.commit({"t": df}, batch_id=1)
        store.commit({"t": df}, batch_id=2)
        assert snapshot_diff(store, "t", 1, 2, ["id"]).count() == 0
