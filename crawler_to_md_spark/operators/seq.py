"""Scalable dense global ordinals.

The reference's visit/export order is SQLite rowid insertion order
(database_manager.py:217-225, 265-280).  The engine makes order explicit
with a ``seq`` column — but a naive ``row_number() OVER (ORDER BY ...)``
puts the entire table through ONE task (Spark plans an empty-partition
window as a single-partition sort), which dies at 10^10 rows.

``with_ordered_seq`` computes the same dense 0-based rank in two phases:

  1. range-repartition + in-partition sort by the order columns (a real
     distributed sort, the same machinery as ``df.orderBy``), partition id
     and in-partition row index stamped, then an EAGER localCheckpoint —
     the checkpoint is load-bearing for correctness, see below;
  2. a broadcast map of partition row-count prefix sums added to the
     stamped in-partition index.  No window, no second shuffle: the old
     form's ``row_number() OVER (PARTITION BY __pid)`` forced an Exchange
     hashpartitioning(__pid) over the whole table even though rows were
     already physically partitioned by __pid.

Why the checkpoint is required (not an optimization): RangePartitioner's
boundary sampling is seeded with the shuffle RDD's id, which is NEW on
every query execution — so two actions over the same
``repartitionByRange`` plan can land rows in DIFFERENT partitions.  The
original two-job form (one job counting rows per partition, a second
computing ranks) silently mixed offsets from one layout with ranks from
another: measured ~78% wrong ranks over 1M rows.  Freezing the
materialized layout makes both reads see identical blocks, and the final
seq is a pure function of the key set (dense global rank) no matter where
the sampled boundaries fell.

The in-partition row index comes from ``monotonically_increasing_id``,
whose documented layout is (partition id << 33) + row-index-in-partition;
subtracting ``spark_partition_id() << 33`` recovers the index.  Both are
stamped in the checkpointed projection, so their values are frozen with
the layout.
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
    part = (
        part.sortWithinPartitions(*cols)
        .withColumns(
            {
                "__pid": F.spark_partition_id(),
                "__mid": F.monotonically_increasing_id(),
            }
        )
        # freeze the sampled range boundaries: every later read (the counts
        # job AND the rank projection) sees the SAME materialized blocks
        .localCheckpoint(eager=True)
    )

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

    in_part = F.col("__mid") - F.col("__pid").cast("long") * F.lit(1 << 33)
    return part.withColumn(
        seq_col, (in_part + offset_expr).cast("long")
    ).drop("__pid", "__mid")
