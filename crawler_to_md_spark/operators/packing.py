"""Token-budget sequence packing for training shards.

A pretraining pipeline concatenates documents into one continuous token
stream and cuts it at fixed ``budget``-token boundaries; a document is
assigned to the shard its FIRST token lands in (it may straddle the cut —
exactly how GPT-style packed examples are built).  That makes the packing
a pure function of the exclusive prefix sum of token counts in a total
document order, so it is deterministic, embarrassingly re-derivable in SQL
(one window cumsum — the DuckDB twin below), and needs no stateful
first-fit loop.

The prefix sum itself must NOT be a naive ``sum() OVER (ORDER BY ...)``:
Spark plans an empty-partition-spec window as a SINGLE-task sort, which
dies at 10^10 documents (same failure mode as seq.py's dense ordinals).
``with_running_total`` reuses seq.py's two-phase shape:

  1. range-repartition + in-partition sort by the order columns, frozen
     by an eager checkpoint,
  2. a shuffle-free per-physical-partition cumulative sum (one narrow
     Arrow ``mapInPandas`` pass — a ``PARTITION BY spark_partition_id``
     window would re-Exchange the whole table) seeded with a broadcast
     map of per-partition weight totals' prefix offsets.

At 100 TB the only driver-side state is one number per shuffle partition.
No reference analog (the reference stores pages, never trains on them);
this is a mission add-on like operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.seq import SMALL_SEQ_ROWS
from crawler_to_md_spark.operators.textstats import token_count

__all__ = ["with_running_total", "pack_shards", "duck_pack_shards_sql"]


def with_running_total(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    total_col: str = "running_total",
    num_partitions: int | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Add ``total_col`` = INCLUSIVE prefix sum of ``weight_col`` over the
    total order given by ``order_cols`` (which must be tie-free for a
    deterministic result).  Two-phase distributed cumsum; the single-task
    window is only taken under the same small-input gate as seq.py."""
    cols = [F.col(c) for c in order_cols]
    running = F.sum(weight_col)
    if approx_rows is not None and approx_rows <= SMALL_SEQ_ROWS:
        w = (
            Window.orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(total_col, running.over(w).cast("long"))
    if num_partitions:
        part = df.repartitionByRange(num_partitions, *cols)
    else:
        part = df.repartitionByRange(*cols)
    # sort IN the range shuffle's partitions, then eager-checkpoint BEFORE
    # the totals job: RangePartitioner's boundary sampling is seeded with
    # the shuffle RDD id (new per execution), so without freezing the
    # layout the per-partition totals would describe a DIFFERENT
    # partitioning than the one the cumsum pass runs on — the same latent
    # bug fixed in seq.py (see its module docstring)
    part = (
        part.sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    totals = part.groupBy("__pid").agg(
        F.sum(weight_col).alias("__w")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += int(row["__w"] or 0)

    # phase 2 is SHUFFLE-FREE: the checkpointed rows are already
    # physically partitioned AND sorted, but a
    # ``sum() OVER (PARTITION BY __pid ORDER BY ...)`` window would
    # re-Exchange the whole table on __pid (Spark cannot prove rows are
    # clustered by physical partition — the exact overhead seq.py's
    # rewrite removed).  One narrow Arrow pass accumulates the running
    # sum per physical partition instead, seeded with that partition's
    # broadcast prefix offset.
    from pyspark.sql.types import LongType, StructField, StructType

    base_fields = [f for f in part.schema.fields if f.name != "__pid"]
    out_schema = StructType(base_fields + [StructField(total_col, LongType())])
    out_cols = [f.name for f in base_fields]

    def cumsum_partition(batches):
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if acc is None:
                acc = int(offsets.get(int(pdf["__pid"].iloc[0]), 0))
            run = pdf[weight_col].fillna(0).astype("int64").cumsum() + acc
            acc = int(run.iloc[-1])
            out = pdf[out_cols].copy()
            out[total_col] = run
            yield out

    return part.mapInPandas(cumsum_partition, schema=out_schema)


def pack_shards(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    order_cols: list[str] | None = None,
    approx_rows: int | None = None,
) -> DataFrame:
    """Assign every document to a fixed-``budget``-token training shard.

    Returns (order_cols..., n_tokens, shard_id, shard_offset): the
    document's whitespace-token count (textstats.token_count), the 0-based
    shard whose token range [shard_id*budget, (shard_id+1)*budget) contains
    the document's first token, and that first token's offset within the
    shard.  Deterministic for any tie-free ``order_cols`` (default
    ``[doc_id]``)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order_cols = order_cols or ["doc_id"]
    weighted = docs.select(
        *order_cols, token_count(F.col(text_col)).alias("n_tokens")
    )
    summed = with_running_total(
        weighted, "n_tokens", order_cols, approx_rows=approx_rows
    )
    start = F.col("running_total") - F.col("n_tokens")   # exclusive prefix
    return summed.select(
        *order_cols,
        "n_tokens",
        F.floor(start / budget).cast("long").alias("shard_id"),
        (start % budget).cast("long").alias("shard_offset"),
    )


def duck_pack_shards_sql(
    budget: int, docs_rel: str = "documents", order_col: str = "doc_id"
) -> str:
    """Exact DuckDB twin: one window cumsum over the same total order."""
    toks = "CAST(len(string_split(trim(text), ' ')) AS BIGINT)"
    return f"""
        WITH weighted AS (
            SELECT {order_col}, {toks} AS n_tokens FROM {docs_rel}
        ),
        summed AS (
            SELECT *, SUM(n_tokens) OVER (
                ORDER BY {order_col}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) - n_tokens AS start_tok
            FROM weighted
        )
        SELECT {order_col}, n_tokens,
               CAST(floor(start_tok / {budget}) AS BIGINT) AS shard_id,
               CAST(start_tok % {budget} AS BIGINT) AS shard_offset
        FROM summed
    """
