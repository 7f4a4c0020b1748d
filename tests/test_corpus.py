"""Corpus generator tests: Spark output vs DuckDB oracle vs Python model."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.sources import corpus

SF_DIR = "/root/testdata/sf0.001"
M = 2  # 1000 pages


@pytest.fixture(scope="module")
def corpus_df(spark):
    df = corpus.synth_corpus(spark, SF_DIR, replicas=M).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


def test_corpus_shape(corpus_df):
    # 1000 pages minus the 'missing' class rows
    n_missing = sum(1 for g in range(1000) if corpus.python_cls(g) == "missing")
    assert corpus_df.count() == 1000 - n_missing
    assert set(corpus_df.columns) >= {
        "page_id", "url", "host", "cls", "status_code", "content_type",
        "transient_failures_remaining", "title", "spans",
    }


def test_corpus_matches_python_model(corpus_df):
    rows = {r["page_id"]: r for r in corpus_df.collect()}
    for g in (0, 1, 7, 11, 64, 95, 121, 500, 999):
        cls = corpus.python_cls(g)
        if cls == "missing":
            assert g not in rows
            continue
        r = rows[g]
        assert r["cls"] == cls, g
        assert r["url"] == corpus.python_url(g), g
        assert r["host"] == corpus.python_host(g), g


def test_spans_shape_and_offsets(corpus_df):
    ok = corpus_df.filter("cls = 'ok'").limit(20).collect()
    for r in ok:
        kinds = [s["kind"] for s in r["spans"]]
        offsets = [s["offset"] for s in r["spans"]]
        assert offsets == list(range(len(offsets))), "offsets must be dense document order"
        assert kinds[0] == "heading1"
        assert "paragraph" in kinds
        # content spans precede link spans
        first_link = kinds.index("link") if "link" in kinds else len(kinds)
        assert all(k != "link" for k in kinds[:first_link])
        assert all(k == "link" for k in kinds[first_link:])

    empty = corpus_df.filter("cls = 'empty'").limit(5).collect()
    for r in empty:
        kinds = {s["kind"] for s in r["spans"]}
        assert kinds <= {"link"}, "empty pages carry only link spans"

    transient = corpus_df.filter("cls = 'transient'").limit(5).collect()
    for r in transient:
        assert all(s["kind"] != "link" for s in r["spans"]), "transient pages carry no links"


def test_edges_match_duckdb(spark, corpus_df, duck):
    """The canonical edge set derived from Spark link spans (resolve ->
    canonicalize -> scope filter -> dedup) must equal the DuckDB CTE edges."""
    from crawler_to_md_spark.functions import urlkit

    links = (
        corpus_df.filter(F.col("cls").isin(*corpus.PARSED_CLASSES))
        .select("page_id", "url", F.explode("spans").alias("s"))
        .filter("s.kind = 'link'")
        .select(
            "page_id",
            urlkit.canonicalize(
                urlkit.resolve_href(F.col("url"), F.col("s.media_ref"))
            ).alias("target"),
        )
        .filter(
            F.col("target").isNotNull()
            & urlkit.is_supported_scheme(F.col("target"))
            & urlkit.in_scope_domain(F.col("target"), "example.com")
        )
        .select("page_id", F.regexp_extract("target", r"/docs/p(\d+)$", 1).cast("long").alias("dst"))
        .distinct()
    )
    spark_edges = {(r["page_id"], r["dst"]) for r in links.collect()}

    duck_edges = set(
        duck.sql(
            f"WITH {corpus.edges_sql_duck(M)} SELECT src, dst FROM corpus_edges"
        ).fetchall()
    )
    assert spark_edges == duck_edges


def test_reach_matches_python(duck):
    golden = corpus.python_golden_crawl(1000)
    duck_reach = dict(
        duck.sql(
            f"WITH RECURSIVE {corpus.reach_sql_duck(M)} SELECT g, depth FROM corpus_reach"
        ).fetchall()
    )
    assert duck_reach == {g: v["depth"] for g, v in golden.items()}
    # the graph must be >= 4 waves deep (FIXTURES.md §1)
    assert max(duck_reach.values()) >= 4


def test_host_skew(corpus_df):
    counts = {r["host"]: r["cnt"] for r in corpus_df.groupBy("host").agg(F.count("*").alias("cnt")).collect()}
    hot = counts["h0.example.com"]
    rest_max = max(v for k, v in counts.items() if k != "h0.example.com")
    assert hot >= 5 * rest_max, "h0 must be a hot host for skew testing"
