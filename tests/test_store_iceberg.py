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
