"""Data-mixing operators: stratified sampling and mixture accounting.

A pretraining run never trains on the raw crawl distribution — it fixes a
mixture (so much code, so much encyclopedic text, per-language shares) and
samples each stratum to its budget.  The reference has no analog (it
exports whatever it crawled); these operators close that gap Spark-first.

``stratified_sample`` takes the top-``cap`` documents per stratum under a
DETERMINISTIC pseudo-random order (md5 of the document key — stable across
runs, engines, and partitionings, so the sample is reproducible and
oracle-checkable, unlike ``TABLESAMPLE``/``rand()``).  Exact-k-per-stratum
is the same problem as the frontier's exact top-``budget``-per-host
dequeue, with the same web-scale skew hazard: one stratum (``lang='en'``)
can own 90% of a 10^10-document corpus, and the obvious
``row_number() OVER (PARTITION BY stratum)`` funnels it through one task.
The implementation reuses the certified salted two-phase plan
(operators/politeness.py — green ``priority_schedule`` oracle): phase 1
ranks within (stratum, salt) keeping ``cap`` rows per shard — a true
top-``cap`` row is necessarily in its shard's top-``cap`` — phase 2 ranks
the ≤ ``salt_shards``·``cap`` survivors per stratum.  Worst-case task
size is bounded by the cap, not the stratum.

Per-stratum caps arrive as a small DataFrame (stratum → cap), broadcast
into the rank filter — the mixture spec is dozens-to-thousands of rows
against a 10^10-row corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.textstats import token_count


def sample_key(*cols) -> "F.Column":
    """The deterministic pseudo-random sort key: lowercase-hex md5 of the
    '|'-joined key columns.  Identical bytes in Spark and DuckDB, so the
    selected set is engine-independent."""
    return F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    caps: DataFrame,
    key_cols: list[str],
    salt_shards: int = 8,
) -> DataFrame:
    """Exact deterministic top-``cap``-per-stratum sample.

    ``caps`` has columns ``strata_cols + ["cap"]`` (small: the mixture
    spec).  ``key_cols`` must uniquely identify a row (e.g. ``doc_id``) —
    they seed the md5 order and break ties totally, so the result is a
    set, not a race.  Strata absent from ``caps`` are dropped (a mixture
    that doesn't mention a stratum takes none of it).
    """
    key = sample_key(*key_cols)
    with_key = df.withColumn("__mix_key", key)
    # the salt spreads a hot stratum across tasks; any deterministic
    # function of the row works — it never reaches the result
    salted = with_key.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]),
               F.lit(salt_shards)).cast("int"),
    )
    order = [F.col("__mix_key")]
    capped = salted.join(F.broadcast(caps), on=strata_cols, how="inner")
    w1 = Window.partitionBy(*strata_cols, "__salt").orderBy(*order)
    survivors = (
        capped.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("cap"))
        .drop("__r1")
    )
    w2 = Window.partitionBy(*strata_cols).orderBy(*order)
    return (
        survivors.withColumn("__r2", F.row_number().over(w2))
        .filter(F.col("__r2") <= F.col("cap"))
        .drop("__r2", "__salt", "__mix_key", "cap")
    )


def mixture_report(
    df: DataFrame,
    strata_cols: list[str],
    weight_col: "F.Column | None" = None,
) -> DataFrame:
    """Per-stratum accounting: document count, weight sum (tokens, bytes
    — default: whitespace token count of ``text``), and each stratum's
    share of the corpus weight.  One partial-aggregated shuffle on the
    stratum key plus a scalar total folded back as a literal-free
    window-less division (the total rides a single-row cross join that
    AQE plans as a broadcast)."""
    w = weight_col if weight_col is not None \
        else token_count(F.col("text"))
    per = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(w.cast("long")).alias("weight"),
    )
    total = per.agg(F.sum("weight").alias("__total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            *strata_cols,
            "docs",
            "weight",
            F.round(F.col("weight") / F.col("__total"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic split assignment + global shuffle order
# ---------------------------------------------------------------------------


def split_assign(
    df: DataFrame,
    key_cols: list[str],
    splits: list[tuple[str, int]],
    seed: str = "",
) -> DataFrame:
    """Deterministic train/val/test (or arbitrary) split assignment.

    ``splits`` is an ordered list of (label, weight) pairs; a row's bucket
    is the first 32 bits of md5(seed|key) mod the total weight, mapped to
    labels by cumulative ranges.  Hash-based (not positional), so a row's
    split never changes when the corpus grows — the property an eval
    holdout needs across recrawls.  Pure scan-side projection: no shuffle,
    no Python, reproducible in any engine that has md5 (the oracle uses
    DuckDB's).  Appends a ``split`` column.
    """
    total = sum(w for _, w in splits)
    h = F.conv(
        F.substring(sample_key(*key_cols) if not seed else F.md5(
            F.concat_ws("|", F.lit(seed),
                        *[F.col(c).cast("string") for c in key_cols])),
            1, 8),
        16, 10,
    ).cast("long")
    bucket = h % F.lit(total)
    expr = None
    cum = 0
    for label, w in splits:
        cond = bucket < F.lit(cum + w)
        expr = F.when(cond, F.lit(label)) if expr is None \
            else expr.when(cond, F.lit(label))
        cum += w
    return df.withColumn("split", expr)


def global_shuffle_pos(
    df: DataFrame,
    key_cols: list[str],
    seed: str = "",
    pos_col: str = "shuffle_pos",
    approx_rows: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle order for training: ``pos_col`` is the
    0-based rank of md5(seed|key) — a reproducible pseudo-random
    permutation of the corpus (the "global shuffle" a dataloader wants,
    computed once at corpus build).  The rank comes from the certified
    two-phase distributed prefix machinery (operators/seq.py — range
    repartition + frozen layout + mid-based arithmetic, never a
    single-task global window), ordered by the hash with the key columns
    as total-order tie-break."""
    if seed:
        key = F.md5(F.concat_ws(
            "|", F.lit(seed), *[F.col(c).cast("string") for c in key_cols]))
    else:
        key = sample_key(*key_cols)
    with_key = df.withColumn("__shuf_key", key)
    from crawler_to_md_spark.operators.seq import with_ordered_seq

    out = with_ordered_seq(
        with_key, ["__shuf_key", *key_cols], seq_col=pos_col,
        approx_rows=approx_rows,
    )
    return out.drop("__shuf_key")


def duck_split_shuffle_sql(
    docs_rel: str,
    key_col: str,
    splits: list[tuple[str, int]],
    seed: str = "",
) -> str:
    """Oracle twin: same md5 arithmetic via DuckDB's '0x'-cast, same
    cumulative CASE, ROW_NUMBER for the shuffle rank."""
    total = sum(w for _, w in splits)
    if seed:
        key = f"md5('{seed}' || '|' || CAST({key_col} AS STRING))"
    else:
        key = f"md5(CAST({key_col} AS STRING))"
    bucket = f"(('0x' || substr({key}, 1, 8))::BIGINT % {total})"
    case = "CASE"
    cum = 0
    for label, w in splits:
        case += f" WHEN {bucket} < {cum + w} THEN '{label}'"
        cum += w
    case += " END"
    return f"""
        SELECT CAST({key_col} AS BIGINT) AS {key_col},
               {case} AS split,
               CAST(row_number() OVER (ORDER BY {key}, {key_col}) - 1
                    AS BIGINT) AS shuffle_pos
        FROM {docs_rel}
    """


def curriculum_buckets(
    df: DataFrame,
    score_col: str,
    key_cols: list[str],
    n_buckets: int = 10,
    approx_rows: int | None = None,
) -> DataFrame:
    """Curriculum-learning phase assignment: rank the corpus by
    ``score_col`` (ascending — callers negate for hard-first) with
    ``key_cols`` as the total-order tie-break, then ``bucket =
    (rank · n_buckets) div n`` — exact integer quantile membership, no
    floats, identical across engines and partitionings.  The rank comes
    from the certified two-phase prefix machinery (operators/seq.py);
    the row count is one scalar aggregate.  Appends ``bucket``."""
    n = df.count()
    from crawler_to_md_spark.operators.seq import with_ordered_seq

    ranked = with_ordered_seq(
        df, [score_col, *key_cols], seq_col="__cur_rank",
        approx_rows=approx_rows)
    out = ranked.withColumn(
        "bucket",
        F.expr(f"CAST((__cur_rank * {int(n_buckets)}) DIV {max(int(n), 1)} "
               "AS BIGINT)"))
    return out.drop("__cur_rank")
