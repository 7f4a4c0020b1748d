"""Seed-URL sources: file, stdin, single URL (reference S1/S2).

The reference reads the whole seed file (or stdin) into a Python list and
order-dedups it (cli.py:181-190, utils.py:94-106).  Here the file path is
a DISTRIBUTED text source — ``spark.read.text`` — so a 10^8-line seed list
never materializes on the driver; order is preserved with
``monotonically_increasing_id`` (for a single ordered text source the id
is monotone in file order: partition index occupies the high bits and
partitions follow file offsets).  The order-preserving dedup itself lives
in ``CrawlEngine.seed`` (first occurrence wins, L2).

Stdin is inherently driver-local, so ``-`` reads the stream on the driver
and parallelizes it — same contract, different transport (matches the
reference's stdin branch, cli.py:183-185).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def seed_frame(spark: SparkSession, path: str) -> DataFrame:
    """(seed_seq, raw) rows from a seeds file, one URL per line, in file
    order.  ``path`` of ``-`` reads stdin (driver-side)."""
    if path == "-":
        lines = [line.strip() for line in sys.stdin]
        return spark.createDataFrame(
            list(enumerate(lines)), "seed_seq long, raw string"
        )
    return (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("seed_seq"),
            F.trim(F.col("value")).alias("raw"),
        )
    )


def single_seed_frame(spark: SparkSession, url: str) -> DataFrame:
    """S2: one ``--url`` seed (reference cli.py:34)."""
    return spark.createDataFrame([(0, url)], "seed_seq long, raw string")
