"""Scalable dense global ordinals.

The reference's visit/export order is SQLite rowid insertion order
(database_manager.py:217-225, 265-280).  The engine makes order explicit
with a ``seq`` column — but a naive ``row_number() OVER (ORDER BY ...)``
puts the entire table through ONE task (Spark plans an empty-partition
window as a single-partition sort), which dies at 10^10 rows.

``with_ordered_seq`` computes the same dense 0-based rank in two phases:

  1. range-repartition + sort by the order columns (a real distributed sort,
     the same machinery as ``df.orderBy``),
  2. per-partition ``row_number`` (window partitioned by
     ``spark_partition_id`` — many independent groups, no single-task sort)
     plus a broadcast map of partition row-count prefix sums.

The result is deterministic for any total-order key set regardless of how
range sampling places the partition boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# Below this many rows the two-phase machinery costs more than it saves:
# the range sample + per-partition counts are two extra Spark jobs, while a
# single-task window sort of <=100k rows finishes in milliseconds.  Callers
# that KNOW the row count (the crawl wave loop counts inserts first) pass
# ``approx_rows`` to take the zero-extra-job path; the scale path stays the
# default for unknown or large inputs.
SMALL_SEQ_ROWS = 100_000


def with_ordered_seq(
    df: DataFrame,
    order_cols: list[str],
    seq_col: str = "seq",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Add a dense 0-based ``seq`` = global rank by ``order_cols``.

    ``order_cols`` must be a total order (no ties) for the result to be
    deterministic — the frontier uses canonical ``url``, which is unique.
    """
    cols = [F.col(c) for c in order_cols]
    if approx_rows is not None and approx_rows <= SMALL_SEQ_ROWS:
        w = Window.orderBy(*cols)  # single task — safe only under the gate
        return df.withColumn(
            seq_col, (F.row_number().over(w) - 1).cast("long")
        )
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    part = part.withColumn("__pid", F.spark_partition_id())

    counts = part.groupBy("__pid").count().collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["count"]

    offset_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid, off in sorted(offsets.items()) for x in (pid, off)]
        ),
        F.col("__pid"),
    ) if offsets else F.lit(0)

    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        part.withColumn(
            seq_col, (F.row_number().over(w) - 1 + offset_expr).cast("long")
        )
        .drop("__pid")
    )
