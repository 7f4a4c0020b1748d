"""Logging surface + legacy-metadata import (F13) tests — mirror
reference tests/test_log_setup.py:35-53 (handler idempotence) and
tests/test_export_manager.py:137-150 (tolerant metadata)."""

from __future__ import annotations

import io
import logging

from pyspark.sql import functions as F

from crawler_to_md_spark.exports import docs_from_legacy, legacy_metadata_expr
from crawler_to_md_spark.progress import get_logger, setup_logging, wave_progress


def test_setup_logging_idempotent():
    setup_logging()
    n1 = len(get_logger().handlers)
    setup_logging()
    setup_logging(level=logging.DEBUG)
    assert len(get_logger().handlers) == n1 == 1


def test_log_emission_goes_to_stream():
    buf = io.StringIO()
    setup_logging(stream=buf)
    get_logger().info("hello wave")
    assert "hello wave" in buf.getvalue()


def test_wave_progress_line():
    line = wave_progress(3, dequeued=200, inserted=50, visited=400, total=1000)
    assert "wave 3" in line and "400/1000" in line and "40.0%" in line
    assert "100.0%" in wave_progress(1, 0, 0, 0, 0)  # empty crawl: no div0


def test_legacy_metadata_tolerance(spark):
    # reference export_manager.py:148-164: None / "null" / scalar / broken
    # JSON / non-dict all degrade to {}, real objects parse
    cases = [
        (None, {}),
        ("null", {}),
        ("5", {}),
        ("[1,2]", {}),
        ("{broken", {}),
        ('{"title": "T"}', {"title": "T"}),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "m string")
    got = [r[0] for r in df.select(legacy_metadata_expr(F.col("m"))).collect()]
    assert got == [e for _, e in cases]


def test_docs_from_legacy_shapes(spark):
    pages = spark.createDataFrame(
        [
            ("https://h/a", "# Title\n\nbody", '{"title": "A"}'),
            ("https://h/b", None, '{"scrape_status": "failed"}'),
            ("https://h/c", "text", "null"),
        ],
        "url string, content string, metadata string",
    )
    docs = docs_from_legacy(pages).collect()
    by_url = {r["url"]: r for r in docs}
    assert by_url["https://h/a"]["status"] == "ok"
    assert by_url["https://h/a"]["spans"][0]["text"] == "# Title\n\nbody"
    assert by_url["https://h/b"]["status"] == "failed"
    assert by_url["https://h/b"]["spans"] is None
    assert by_url["https://h/c"]["metadata"] == {}
