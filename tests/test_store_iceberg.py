"""Store strategy selection (store/iceberg.py): parquet snapshot store in
the sandbox (no Iceberg jars), Iceberg required/selected when a catalog is
configured — plus the MERGE/CREATE SQL builders the Iceberg path runs."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from crawler_to_md_spark.store.iceberg import (
    IcebergStore,
    SnapshotStore,
    create_table_sql,
    iceberg_available,
    make_store,
    merge_upsert_sql,
)

SCHEMAS = {
    "links": StructType([
        StructField("url", StringType()),
        StructField("visited", BooleanType()),
        StructField("retry_count", IntegerType()),
    ])
}


def test_no_catalog_in_sandbox(spark):
    assert iceberg_available(spark) is None


def test_auto_selects_parquet_without_catalog(spark, tmp_path):
    store = make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS)
    assert isinstance(store, SnapshotStore)


def test_forced_parquet(spark, tmp_path):
    store = make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS,
                       backend="parquet")
    assert isinstance(store, SnapshotStore)


def test_forced_iceberg_without_catalog_fails_fast(spark, tmp_path):
    with pytest.raises(RuntimeError, match="Iceberg catalog"):
        make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS,
                   backend="iceberg")


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown store backend"):
        make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS,
                   backend="delta")


def test_env_var_selects_backend(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("CMS_STORE_BACKEND", "parquet")
    assert isinstance(
        make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS),
        SnapshotStore)
    monkeypatch.setenv("CMS_STORE_BACKEND", "iceberg")
    with pytest.raises(RuntimeError):
        make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS)


def test_iceberg_store_has_snapshot_store_contract():
    """The engine swaps stores by strategy: every public method/property of
    the parquet store must exist on the Iceberg store."""
    surface = {
        n for n in dir(SnapshotStore)
        if not n.startswith("_")
    }
    missing = {n for n in surface if not hasattr(IcebergStore, n)}
    assert not missing, f"IcebergStore lacks: {sorted(missing)}"


def test_merge_upsert_sql_shape():
    sql = merge_upsert_sql("cat.crawl.links", "src", ["url_hash", "url"],
                           ["url_hash", "url", "visited", "retry_count"])
    assert sql == (
        "MERGE INTO cat.crawl.links t USING src s "
        "ON t.url_hash = s.url_hash AND t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET "
        "t.visited = s.visited, t.retry_count = s.retry_count "
        "WHEN NOT MATCHED THEN INSERT "
        "(url_hash, url, visited, retry_count) "
        "VALUES (s.url_hash, s.url, s.visited, s.retry_count)"
    )


def test_create_table_sql_buckets_on_key():
    sql = create_table_sql("cat.crawl.links", SCHEMAS["links"], "url", 1024)
    assert "PARTITIONED BY (bucket(1024, url))" in sql
    assert "url string" in sql and "retry_count int" in sql
    assert sql.startswith("CREATE TABLE IF NOT EXISTS cat.crawl.links")


def test_misconfigured_catalog_class_not_loadable_is_unavailable(spark,
                                                                 tmp_path):
    """A catalog conf pointing at a class that is NOT on the classpath must
    not count as available (no silent half-configured Iceberg): the class
    probe rejects it in this jar-less sandbox."""
    spark.conf.set("spark.sql.catalog.probe",
                   "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert iceberg_available(spark) is None
        with pytest.raises(RuntimeError):
            make_store(spark, str(tmp_path / "wh"), schemas=SCHEMAS,
                       backend="iceberg")
    finally:
        spark.conf.unset("spark.sql.catalog.probe")


# ---------------------------------------------------------------------------
# commit/rollback CONTRACT tests: a recording fake session pins the exact
# statements a BucketedUpdate wave commit and a rollback would issue, so the
# (jar-less, never-executed-here) Iceberg path cannot rot silently.
# ---------------------------------------------------------------------------


class _FakeWriter:
    def __init__(self, log, q):
        self._log, self._q = log, q

    def using(self, fmt):
        self._log.append(f"WRITETO {self._q} USING {fmt}")
        return self

    def create(self):
        self._log.append(f"WRITETO {self._q} CREATE")

    def append(self):
        self._log.append(f"WRITETO {self._q} APPEND")

    def overwritePartitions(self):
        self._log.append(f"WRITETO {self._q} OVERWRITE_PARTITIONS")


class _FakeDF:
    def __init__(self, log, columns):
        self._log = log
        self.columns = list(columns)
        self.schema = None

    def createOrReplaceTempView(self, name):
        self._log.append(f"TEMPVIEW {name}")

    def writeTo(self, q):
        return _FakeWriter(self._log, q)

    def limit(self, n):
        return self


class _FakeCatalog:
    def __init__(self, log, existing):
        self._log, self._existing = log, existing

    def tableExists(self, q):
        return q in self._existing

    def dropTempView(self, name):
        self._log.append(f"DROPVIEW {name}")


class _FakeSpark:
    def __init__(self, existing=()):
        self.log: list[str] = []
        self.catalog = _FakeCatalog(self.log, set(existing))

    def sql(self, q):
        self.log.append(" ".join(q.split()))

    def createDataFrame(self, rows, schema):
        cols = (schema.fieldNames() if hasattr(schema, "fieldNames")
                else [c.split()[0] for c in schema.split(",")])
        return _FakeDF(self.log, cols)


def _store(existing=()):
    fake = _FakeSpark(existing)
    store = IcebergStore(fake, "cat", namespace="crawl", retain=2,
                         schemas=SCHEMAS, n_buckets=64, bucket_key="url")
    return fake, store


def test_commit_statement_sequence_for_bucketed_update():
    from pyspark.sql.types import LongType
    from crawler_to_md_spark.store.warehouse import BucketedUpdate, LiteralAppend

    fake, store = _store()
    links_df = _FakeDF(fake.log, ["url", "url_hash", "visited", "retry_count"])
    metrics_schema = StructType([StructField("batch_id", LongType()),
                                 StructField("dequeued", LongType())])
    store.commit(
        {"links": BucketedUpdate(links_df, dirty=[3, 7], n_buckets=64),
         "metrics": LiteralAppend([(5, 10)], metrics_schema)},
        batch_id=5,
        lineage={"frontier_offset": 5},
    )
    log = fake.log

    # namespace bootstrap ran at construction
    assert log[0] == "CREATE NAMESPACE IF NOT EXISTS cat.crawl"
    # links table created with the bucket partition transform that makes
    # MERGE rewrite only the dirty buckets' files (O(touched) wave cost)
    create = next(s for s in log if s.startswith("CREATE TABLE"))
    assert create == (
        "CREATE TABLE IF NOT EXISTS cat.crawl.links "
        "(url string, visited boolean, retry_count int) USING iceberg "
        "PARTITIONED BY (bucket(64, url))")
    # the MERGE is the last-write-wins upsert on (url_hash, url)
    merge = next(s for s in log if s.startswith("MERGE INTO"))
    assert merge == (
        "MERGE INTO cat.crawl.links t USING __merge_src_links_5 s "
        "ON t.url_hash = s.url_hash AND t.url = s.url "
        "WHEN MATCHED THEN UPDATE SET t.visited = s.visited, "
        "t.retry_count = s.retry_count "
        "WHEN NOT MATCHED THEN INSERT (url, url_hash, visited, retry_count) "
        "VALUES (s.url, s.url_hash, s.visited, s.retry_count)")
    # source view registered before the MERGE, dropped after
    assert log.index("TEMPVIEW __merge_src_links_5") < log.index(merge)
    assert log.index("DROPVIEW __merge_src_links_5") > log.index(merge)
    # LiteralAppend becomes create-if-missing + append
    assert "WRITETO cat.crawl.metrics USING iceberg" in log
    assert "WRITETO cat.crawl.metrics APPEND" in log
    # lineage row written LAST among table writes — the crash-semantics
    # contract: a crash before it leaves the previous lineage authoritative
    lineage_writes = [i for i, s in enumerate(log)
                     if s.startswith("WRITETO cat.crawl.lineage")]
    table_writes = [i for i, s in enumerate(log)
                    if s.startswith(("MERGE", "WRITETO cat.crawl.metrics"))]
    assert lineage_writes and max(table_writes) < min(lineage_writes)
    # retention: batch 5 - retain 2 = keep_after 3
    assert ("DELETE FROM cat.crawl.lineage WHERE batch_id < 3") in log


def test_commit_skips_create_when_tables_exist():
    from crawler_to_md_spark.store.warehouse import BucketedUpdate

    fake, store = _store(existing={"cat.crawl.links", "cat.crawl.lineage"})
    links_df = _FakeDF(fake.log, ["url", "visited", "retry_count"])
    store.commit({"links": BucketedUpdate(links_df, dirty=[0], n_buckets=64)},
                 batch_id=1, lineage={})
    assert not any(s.startswith("CREATE TABLE") for s in fake.log)
    # no url_hash column -> MERGE keys on url alone
    merge = next(s for s in fake.log if s.startswith("MERGE INTO"))
    assert " ON t.url = s.url " in merge
    # existing lineage table -> append, never create
    assert "WRITETO cat.crawl.lineage APPEND" in fake.log
    assert "WRITETO cat.crawl.lineage CREATE" not in fake.log


def test_rollback_statements(monkeypatch):
    fake, store = _store(existing={"cat.crawl.links"})
    monkeypatch.setattr(
        IcebergStore, "manifest",
        property(lambda self: {"batch_id": 9, "lineage": {}}))
    store.rollback()
    assert "DELETE FROM cat.crawl.lineage WHERE batch_id = 9" in fake.log
    call = next(s for s in fake.log if s.startswith("CALL"))
    # previous snapshot = second-newest history row of the TABLE itself
    assert call == (
        "CALL cat.system.rollback_to_snapshot('crawl.links', "
        "(SELECT snapshot_id FROM cat.crawl.links.history "
        "ORDER BY made_current_at DESC LIMIT 1 OFFSET 1))")


def test_commit_runs_extra_tasks_before_table_writes():
    from crawler_to_md_spark.store.warehouse import BucketedUpdate

    fake, store = _store(existing={"cat.crawl.links", "cat.crawl.lineage"})
    links_df = _FakeDF(fake.log, ["url", "visited", "retry_count"])
    order = []
    store.commit(
        {"links": BucketedUpdate(links_df, dirty=[0], n_buckets=64)},
        batch_id=1, lineage={},
        extra_tasks=[lambda: order.append(len(fake.log))])
    # the bloom-update analog runs before any table statement of this commit
    n_before = order[0]
    assert not any(s.startswith("MERGE") for s in fake.log[:n_before])


def test_read_at_emits_native_time_travel(monkeypatch):
    """Time travel goes through Iceberg's own snapshot log: read_at must
    resolve the wave's commit time and emit `TIMESTAMP AS OF`."""
    fake, store = _store(existing={"cat.crawl.links"})
    monkeypatch.setattr(IcebergStore, "snapshots", lambda self: [3, 4])
    monkeypatch.setattr(IcebergStore, "batch_id",
                        property(lambda self: 4))
    monkeypatch.setattr(IcebergStore, "_committed_at",
                        lambda self, b: "2026-08-20 00:00:03")
    store.read_at("links", 3)
    assert fake.log[-1] == ("SELECT * FROM cat.crawl.links "
                            "TIMESTAMP AS OF '2026-08-20 00:00:03'")
    with pytest.raises(ValueError, match="retain"):
        store.read_at("links", 1)


# ---------------------------------------------------------------------------
# Runtime integration (auto-skip without jars — the lxml-leg pattern)
# ---------------------------------------------------------------------------


def _iceberg_runtime_on_classpath(spark) -> bool:
    """True when the Iceberg Spark runtime jar is actually loadable in
    this JVM (the sandbox ships no jars; any future environment with them
    exercises the real store below automatically)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TestIcebergRuntimeIntegration:
    """REAL commit/read_at/rollback cycle against a hadoop catalog.

    Skipped (not failed) in the sandbox: no Iceberg jars exist here, so
    only the string-level contract tests above can run.  On a cluster
    image with ``iceberg-spark-runtime`` on the classpath these validate
    the 375 LoC of store/iceberg.py at runtime — catalog confs are
    runtime-settable, so the shared session is reused with a throwaway
    catalog name + warehouse dir."""

    @pytest.fixture(scope="class")
    def cat(self, spark, tmp_path_factory):
        if not _iceberg_runtime_on_classpath(spark):
            pytest.skip("Iceberg runtime jars not on the classpath "
                        "(sandbox default)")
        wh = str(tmp_path_factory.mktemp("iceberg_wh"))
        spark.conf.set("spark.sql.catalog.cms_it",
                       "org.apache.iceberg.spark.SparkCatalog")
        spark.conf.set("spark.sql.catalog.cms_it.type", "hadoop")
        spark.conf.set("spark.sql.catalog.cms_it.warehouse", wh)
        return "cms_it"

    def test_commit_read_at_rollback_cycle(self, spark, cat, tmp_path):
        from crawler_to_md_spark.store.warehouse import (
            AppendUpdate,
            BucketedUpdate,
            LiteralAppend,
        )
        from pyspark.sql.types import LongType

        schemas = dict(SCHEMAS)
        store = IcebergStore(
            spark, cat, namespace="it_cycle", schemas=schemas,
            n_buckets=8, bucket_key="url", aux_dir=str(tmp_path))
        assert not store.exists()

        rows1 = spark.createDataFrame(
            [("https://a/1", False, 0), ("https://a/2", False, 0)],
            SCHEMAS["links"])
        store.commit({"links": BucketedUpdate(rows1, dirty=[0], n_buckets=8)},
                     batch_id=1, lineage={"frontier_offset": 1})
        assert store.exists() and store.batch_id == 1
        assert store.read("links").count() == 2

        # wave 2: upsert one row (visited flip) + metrics append
        rows2 = spark.createDataFrame(
            [("https://a/1", True, 0)], SCHEMAS["links"])
        metrics = StructType([StructField("batch_id", LongType()),
                              StructField("n", LongType())])
        store.commit(
            {"links": BucketedUpdate(rows2, dirty=[0], n_buckets=8),
             "metrics": LiteralAppend([(2, 7)], metrics)},
            batch_id=2, lineage={"frontier_offset": 2})
        assert store.batch_id == 2
        got = {r["url"]: r["visited"] for r in store.read("links").collect()}
        assert got == {"https://a/1": True, "https://a/2": False}
        assert store.lineage_at(2)["frontier_offset"] == 2

        # time travel back to wave 1 through Iceberg's native snapshot log
        at1 = {r["url"]: r["visited"]
               for r in store.read_at("links", 1).collect()}
        assert at1 == {"https://a/1": False, "https://a/2": False}

        # append table + rollback
        extra = spark.createDataFrame([("h", 1)], "host string, n int")
        store.commit({"robots": AppendUpdate(extra)}, batch_id=3, lineage={})
        assert store.batch_id == 3
        store.rollback()
        assert store.batch_id == 2
