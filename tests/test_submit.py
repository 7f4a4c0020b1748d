"""Deployment-path test: launch the crawl CLI through a REAL
``spark-submit --py-files`` (fresh JVM, package shipped as a zip), the
north-rule launch shape.  Mirrors the reference's CLI entry point
(cli.py:20-299) run as a distributed Spark app."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

from crawler_to_md_spark import submit
from crawler_to_md_spark.sources import corpus


def test_pyfiles_zip_is_deterministic_and_complete(tmp_path):
    os.makedirs(tmp_path / "a", exist_ok=True)
    os.makedirs(tmp_path / "b", exist_ok=True)
    z1 = submit.make_pyfiles_zip(str(tmp_path / "a"))
    z2 = submit.make_pyfiles_zip(str(tmp_path / "b"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = zipfile.ZipFile(z1).namelist()
    assert "crawler_to_md_spark/cli.py" in names
    assert "crawler_to_md_spark/operators/crawl.py" in names
    assert all(n.endswith(".py") for n in names)


def test_submit_command_shape(tmp_path):
    cmd = submit.submit_command(
        ["--url", "https://x/"], str(tmp_path), master="local[2]",
        conf={"spark.ui.enabled": "false"})
    assert cmd[0].endswith("spark-submit")
    assert cmd[cmd.index("--master") + 1] == "local[2]"
    assert cmd[cmd.index("--py-files") + 1].endswith("crawler_to_md_spark.zip")
    assert "spark.ui.enabled=false" in cmd
    assert cmd[-2].endswith("crawl_job.py") or cmd[-3].endswith("crawl_job.py")


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("submit_corpus") / "corpus.parquet")
    corpus.synth_corpus(spark, "/root/testdata/sf0.001", replicas=1) \
        .write.mode("overwrite").parquet(p)
    return p


def test_spark_submit_end_to_end(tmp_path, corpus_path, spark):
    """Static-frontier crawl + export, submitted to a fresh local[2] JVM
    with the library arriving only via --py-files."""
    seeds_path = tmp_path / "seeds.txt"
    urls = [r["url"] for r in
            spark.read.parquet(corpus_path)
            .filter("cls = 'ok'").select("url")
            .orderBy("url").limit(4).collect()]
    seeds_path.write_text("\n".join(urls) + "\n", encoding="utf-8")

    out, cache = str(tmp_path / "out"), str(tmp_path / "cache")
    cmd = submit.submit_command(
        [
            "--urls-file", str(seeds_path),
            "--corpus-parquet", corpus_path,
            "--output-folder", out, "--cache-folder", cache,
            "--title", "Submitted",
        ],
        str(tmp_path / "pkg"),
        master="local[2]",
        conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
            "spark.driver.memory": "2g",
        },
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]

    sub = os.listdir(out)
    assert len(sub) == 1
    files = os.listdir(os.path.join(out, sub[0]))
    assert "Submitted.md" in files and "Submitted.json" in files
    md = open(os.path.join(out, sub[0], "Submitted.md"), encoding="utf-8").read()
    assert md.startswith("# Submitted\n")
