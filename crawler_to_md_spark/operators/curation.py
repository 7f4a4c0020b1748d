"""Corpus curation for training-data pipelines: benchmark decontamination
and intra-document repetition signals.

Two operations every published pretraining pipeline runs between crawling
and tokenization, generalizing the reference's raw-markdown corpus (it
stores text and computes nothing over it; cf. reference
export_manager.py's pass-through of page content) to what a 100 TB run
needs before training:

**Decontamination** — flag training documents that share any k-word
shingle with a held-out evaluation benchmark (the GPT-3/Llama 13-gram
overlap rule).  The benchmark side is small by construction (eval suites
are thousands of documents against a 10^10-document corpus), so its
distinct gram set is explicitly broadcast: the train side streams through
a map-side hash join with NO shuffle of exploded grams — the only shuffle
is the partial-aggregated (doc_id, count) rollup.  At web scale the same
gram set can be pushed further down as a bloom filter (functions/bloom.py)
so non-matching grams die in the scan stage; the broadcast join here IS
the exact form of that plan.

**Repetition signals** — the Gopher-family quality rules that catch
boilerplate and degenerate generators: distinct-token ratio, the fraction
of all n-gram occurrences claimed by the single most frequent n-gram, and
the fraction of n-gram occurrences that are duplicated (appear >= 2
times).  Computed entirely WITHIN-ROW: the non-distinct shingle array is
sorted and folded once (``aggregate`` with a struct accumulator — each
element compared to its predecessor exactly once, no free subtrees, so no
interpreted-HOF re-execution), giving a shuffle-free scan-only plan that
survives any corpus size.  The DuckDB oracle recomputes the same numbers
the readable way (unnest + GROUP BY) — the oracle need not be
shuffle-efficient, the engine must.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_to_md_spark.operators.textstats import (
    shingle_windows,
    shingles,
    token_count,
    tokens,
)

# GPT-3's decontamination grain (13-gram overlap); callers tune k down for
# short-document corpora
DECONTAM_K = 13


# ---------------------------------------------------------------------------
# Arrow fast paths
#
# Both operators exist in two semantically identical forms, selected by
# ``impl``: ``"native"`` — pure Catalyst expressions (the form the DuckDB
# oracles mirror sub-expression by sub-expression) — and ``"pandas"`` (the
# default) — an Arrow-vectorized pandas UDF for the array-heavy inner step.
# Interpreted higher-order functions evaluate lambdas element-at-a-time
# with no codegen; profiled at 500k docs x 60 tokens the native forms run
# ~4-5k docs/s on 32 cores while the pandas forms run the same integer
# work in C-backed dict/Counter operations ~10x faster.  The UDFs return
# ONLY exact integers (gram lists / occurrence counts); every division and
# rounding that reaches a result column stays a native Spark expression,
# so the two impls are bit-identical and the oracle gates both (the
# entry queries run the default; tests assert native == pandas).
# ---------------------------------------------------------------------------


def _pandas_shingles(k: int):
    """Arrow-batched twin of textstats.shingles (distinct k-word shingles,
    first-occurrence order, trailing partial window kept for short docs)."""

    @F.pandas_udf(ArrayType(StringType()))
    def grams(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            out = []
            for t in texts:
                toks = t.strip().split(" ")
                m = len(toks)
                out.append(list(dict.fromkeys(
                    " ".join(toks[i:i + k])
                    for i in range(max(m - k + 1, 1))
                )))
            yield pd.Series(out)

    return grams


def _pandas_rep_counts(ns: tuple[int, ...]):
    """Arrow-batched integer repetition counters: one pass per document,
    Counter-based, no floats — ratios are computed natively downstream."""
    fields = [
        StructField("n_tokens", LongType()),
        StructField("n_distinct_tokens", LongType()),
    ]
    for n in ns:
        fields += [
            StructField(f"total{n}", LongType()),
            StructField(f"maxrun{n}", LongType()),
            StructField(f"dupsum{n}", LongType()),
        ]

    @F.pandas_udf(StructType(fields))
    def rep(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for texts in it:
            rows = []
            for t in texts:
                toks = t.strip().split(" ")
                m = len(toks)
                rec = {"n_tokens": m, "n_distinct_tokens": len(set(toks))}
                for n in ns:
                    wins = [
                        " ".join(toks[i:i + n])
                        for i in range(max(m - n + 1, 1))
                    ]
                    c = Counter(wins)
                    rec[f"total{n}"] = len(wins)
                    rec[f"maxrun{n}"] = max(c.values())
                    rec[f"dupsum{n}"] = sum(
                        v for v in c.values() if v >= 2)
                rows.append(rec)
            yield pd.DataFrame(rows)

    return rep


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def _gram_col(text_col: str, k: int, impl: str) -> Column:
    if impl == "native":
        return shingles(F.col(text_col), k)
    if impl == "pandas":
        return _pandas_shingles(k)(F.col(text_col))
    raise ValueError(f"impl must be 'native' or 'pandas', got {impl!r}")


def benchmark_grams(bench: DataFrame, text_col: str = "text",
                    k: int = DECONTAM_K, impl: str = "pandas") -> DataFrame:
    """Distinct k-gram set of the evaluation benchmark — the (small)
    contamination probe set, one column ``gram``."""
    return bench.select(
        F.explode(_gram_col(text_col, k, impl)).alias("gram")
    ).distinct()


def decontaminate(train: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  k: int = DECONTAM_K, impl: str = "pandas",
                  use_bloom: bool = False,
                  bloom_bits: int = 1 << 24) -> DataFrame:
    """Per-training-document contamination report against a benchmark:
    ``(id_col, n_contaminated_grams, contaminated)`` for EVERY train row.

    Plan shape at 10^10 train docs: the benchmark gram set is broadcast
    (eval suites are tiny relative to any training corpus), the exploded
    train grams hash-join map-side — exploded rows never shuffle — and the
    per-doc rollup moves partial-aggregated (doc_id, count) pairs only.
    Filter ``~contaminated`` to drop, or keep the counts for audit."""
    grams = benchmark_grams(bench, text_col, k, impl)
    exploded = train.select(
        F.col(id_col), F.explode(_gram_col(text_col, k, impl)).alias("gram"))
    if use_bloom:
        # the 10^8-gram eval-union case: a broadcast hash relation of gram
        # STRINGS is GBs per executor, but a bloom of their 64-bit hashes
        # is tens of MB.  The bloom is a PREFILTER — survivors still pass
        # the exact broadcast join below, so false positives are removed
        # and the result is bit-identical to the unbloomed path (pytested)
        from crawler_to_md_spark.functions.bloom import BloomShards

        shards = BloomShards.empty(
            num_shards=4, m_bits=bloom_bits, num_hashes=7)
        shards.add_dataframe(
            grams.select(F.xxhash64("gram").alias("url_hash")))
        mc = shards.might_contain_udf(train.sparkSession)
        exploded = exploded.filter(mc(F.xxhash64("gram")))
    hits = (
        exploded
        .join(F.broadcast(grams), "gram")
        # shingles() is distinct per doc, so count(*) == distinct grams hit
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated_grams"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0).cast("long"))
            .alias("n_contaminated_grams"),
        )
        .withColumn("contaminated", F.col("n_contaminated_grams") > 0)
    )


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def _run_fold(sorted_grams: Column) -> Column:
    """One pass over a SORTED non-distinct gram array: returns
    ``struct(maxrun, dupsum)`` where ``maxrun`` is the longest equal run
    (the occurrence count of the most frequent gram) and ``dupsum`` is the
    total length of all runs >= 2 (occurrences of duplicated grams).

    The accumulator carries (prev, run, maxrun, dupsum); each element is
    examined once and the lambdas reference only the accumulator and the
    element — nothing re-executes under the interpreted-HOF model
    (cf. shingle_windows' docstring)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("maxrun"),
        F.lit(0).cast("long").alias("dupsum"),
    )

    def step(acc, x):
        cont = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(cont, acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        closed_dup = F.when(
            ~cont & (acc["run"] >= 2), acc["run"]
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            (acc["dupsum"] + closed_dup).alias("dupsum"),
        )

    def finish(acc):
        return F.struct(
            acc["maxrun"].alias("maxrun"),
            (
                acc["dupsum"]
                + F.when(acc["run"] >= 2, acc["run"])
                .otherwise(F.lit(0).cast("long"))
            ).alias("dupsum"),
        )

    return F.aggregate(sorted_grams, init, step, finish)


def repetition_features(text: Column, ns: tuple[int, ...] = (2, 3)
                        ) -> dict[str, Column]:
    """Gopher-style within-document repetition columns, all within-row
    (the ``native`` impl — see the Arrow-fast-path note above)."""
    toks = tokens(text)
    feats: dict[str, Column] = {
        "distinct_token_ratio": F.round(
            F.size(F.array_distinct(toks)) / token_count(text).cast("double"),
            6,
        ),
    }
    for n in ns:
        w = shingle_windows(text, n)
        total = F.size(w).cast("double")
        fold = _run_fold(F.array_sort(w))
        feats[f"top{n}gram_frac"] = F.round(fold["maxrun"] / total, 6)
        feats[f"dup{n}gram_frac"] = F.round(fold["dupsum"] / total, 6)
    return feats


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     ns: tuple[int, ...] = (2, 3),
                     impl: str = "pandas") -> DataFrame:
    """One row per document with the repetition feature set.  Both impls
    produce bit-identical columns: the pandas path returns only exact
    integer counters and the ratios below are the same native round/
    divide expressions the native path uses."""
    if impl == "native":
        feats = repetition_features(F.col(text_col), ns)
        return docs.select(
            "doc_id", *[c.alias(name) for name, c in feats.items()]
        )
    if impl != "pandas":
        raise ValueError(f"impl must be 'native' or 'pandas', got {impl!r}")
    c = _pandas_rep_counts(ns)(F.col(text_col))
    staged = docs.select("doc_id", c.alias("__rc"))
    cols = [
        F.round(
            F.col("__rc.n_distinct_tokens")
            / F.col("__rc.n_tokens").cast("double"), 6,
        ).alias("distinct_token_ratio"),
    ]
    for n in ns:
        total = F.col(f"__rc.total{n}").cast("double")
        cols.append(F.round(F.col(f"__rc.maxrun{n}") / total, 6)
                    .alias(f"top{n}gram_frac"))
        cols.append(F.round(F.col(f"__rc.dupsum{n}") / total, 6)
                    .alias(f"dup{n}gram_frac"))
    return staged.select("doc_id", *cols)


# ---------------------------------------------------------------------------
# corpus-wide line dedup
# ---------------------------------------------------------------------------

def line_dedup(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", min_line_tokens: int = 0) -> DataFrame:
    """Corpus-wide exact LINE dedup (the CCNet/RefinedWeb boilerplate
    pass): every newline-separated line keeps its FIRST occurrence —
    ordered by (``id_col``, line position) — and later copies are removed
    from their documents; documents whose every line was removed drop out.
    Lines shorter than ``min_line_tokens`` are exempt (kept verbatim):
    dropping every short connective line corpus-wide hurts more than the
    boilerplate it catches.

    Returns ``(id_col, text, n_lines, n_lines_kept)`` with ``text``
    reassembled from the surviving lines in original order.

    Plan shape at 10^10 docs, deliberately SKEW-PROOF: the obvious
    ``row_number() OVER (PARTITION BY line-digest)`` puts every copy of
    the hottest boilerplate line (10^8 copies of a cookie banner) into ONE
    window partition — exactly the rows this operator exists to remove
    become its straggler task.  Instead the keeper per digest is a
    combine-safe ``min(struct(id, pos))`` aggregate (map-side partial
    aggregation collapses each input partition's copies to one row before
    the shuffle), and membership is a LEFT SEMI join on the FULL
    ``(digest, id, pos)`` triple — unique per row on both sides, so the
    join shuffle hashes uniformly no matter how duplicated any line is.
    Line text moves through two uniform shuffles total (the semi join and
    the per-document reassembly groupBy)."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("digest", F.md5("line"))
    exempt = (
        F.size(F.split(F.trim(F.col("line")), " ")) < min_line_tokens
        if min_line_tokens > 0 else F.lit(False)
    )
    keepers = (
        lines.groupBy("digest")
        .agg(F.min(F.struct(F.col(id_col), F.col("pos"))).alias("k"))
        .select("digest", F.col(f"k.{id_col}").alias(id_col),
                F.col("k.pos").alias("pos"))
    )
    kept = lines.filter(~exempt).join(
        keepers, ["digest", id_col, "pos"], "left_semi"
    ).unionByName(lines.filter(exempt)).drop("digest")
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias(text_col),
            F.count("*").cast("long").alias("n_lines_kept"),
        )
        .join(
            docs.select(
                F.col(id_col),
                (F.size(F.split(F.col(text_col), "\n"))
                 .cast("long").alias("n_lines")),
            ),
            id_col,
        )
        .select(id_col, text_col, "n_lines", "n_lines_kept")
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------

def duck_line_dedup_sql(docs_rel: str, id_col: str = "doc_id",
                        t: str = "text", min_line_tokens: int = 0,
                        prelude: str = "") -> str:
    """Oracle for ``line_dedup``: the readable ROW_NUMBER form (the engine
    avoids that window for skew reasons; the oracle need not)."""
    exempt = (
        f"len(string_split(trim(line), ' ')) < {min_line_tokens}"
        if min_line_tokens > 0 else "FALSE"
    )
    return f"""
        WITH {prelude} ld_lines AS (
            SELECT {id_col},
                   unnest(list_transform(
                       range(1, len(string_split({t}, chr(10))) + 1),
                       i -> {{'pos': i - 1,
                             'line': string_split({t}, chr(10))[i]}}),
                       recursive := true)
            FROM {docs_rel}
        ),
        ld_ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY line ORDER BY {id_col}, pos) AS rn
            FROM ld_lines
        ),
        ld_kept AS (
            SELECT {id_col}, pos, line FROM ld_ranked
            WHERE rn = 1 OR {exempt}
        )
        SELECT k.{id_col},
               string_agg(k.line, chr(10) ORDER BY k.pos) AS {t},
               CAST(any_value(len(string_split(d.{t}, chr(10))))
                    AS BIGINT) AS n_lines,
               CAST(count(*) AS BIGINT) AS n_lines_kept
        FROM ld_kept k JOIN {docs_rel} d USING ({id_col})
        GROUP BY k.{id_col}
    """


def duck_decontaminate_sql(train_rel: str, bench_rel: str,
                           k: int = DECONTAM_K, t: str = "text",
                           prelude: str = "") -> str:
    """Oracle for ``decontaminate``: same report via unnest + joins.
    ``prelude`` = extra CTE definitions (comma-terminated) defining
    ``train_rel`` / ``bench_rel``."""
    from crawler_to_md_spark.operators.textstats import duck_shingles

    sh = duck_shingles(t, k)
    return f"""
        WITH {prelude} bench_grams AS (
            SELECT DISTINCT unnest({sh}) AS gram FROM {bench_rel}
        ),
        train_sh AS (
            SELECT doc_id, {sh} AS sh FROM {train_rel}
        ),
        hits AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
            FROM (SELECT doc_id, unnest(sh) AS gram FROM train_sh) x
            JOIN bench_grams USING (gram)
            GROUP BY doc_id
        )
        SELECT t.doc_id,
               coalesce(h.n_contaminated_grams, 0) AS n_contaminated_grams,
               coalesce(h.n_contaminated_grams, 0) > 0 AS contaminated
        FROM train_sh t LEFT JOIN hits h USING (doc_id)
    """


def duck_repetition_sql(docs_rel: str = "documents",
                        ns: tuple[int, ...] = (2, 3),
                        t: str = "text") -> str:
    """Oracle for ``repetition_stats``: unnest + GROUP BY per n."""
    from crawler_to_md_spark.operators.textstats import (
        DUCK_TOKEN_COUNT,
        DUCK_TOKENS,
        duck_shingle_windows,
    )

    toks = DUCK_TOKENS.format(t=t)
    ntok = DUCK_TOKEN_COUNT.format(t=t)
    ctes, joins, cols = [], [], []
    for n in ns:
        w = duck_shingle_windows(t, n)
        ctes.append(f"""
        g{n} AS (
            SELECT doc_id, unnest({w}) AS gram FROM {docs_rel}
        ),
        c{n} AS (
            SELECT doc_id, gram, count(*) AS c FROM g{n} GROUP BY 1, 2
        ),
        s{n} AS (
            SELECT doc_id,
                   round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS topf,
                   round(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                         / CAST(sum(c) AS DOUBLE), 6) AS dupf
            FROM c{n} GROUP BY doc_id
        )""")
        joins.append(f"JOIN s{n} USING (doc_id)")
        cols.append(f"s{n}.topf AS top{n}gram_frac, "
                    f"s{n}.dupf AS dup{n}gram_frac")
    return f"""
        WITH {','.join(ctes)}
        SELECT d.doc_id,
               round(len(list_distinct({toks})) / CAST({ntok} AS DOUBLE), 6)
                   AS distinct_token_ratio,
               {', '.join(cols)}
        FROM {docs_rel} d {' '.join(joins)}
    """


# ---------------------------------------------------------------------------
# host-level quality gating (RefinedWeb/C4-style domain filtering)
# ---------------------------------------------------------------------------


def host_quality_report(
    docs: DataFrame,
    score_col: str = "score",
    host_col: str = "host",
    min_mean: int = 24,
) -> DataFrame:
    """Per-host quality rollup: ``(host, n_docs, total_score, kept)``.

    Published pipelines gate whole domains, not just documents — a host
    whose average page quality is junk (link farms, auto-generated
    catalogs) poisons even its above-threshold pages, so RefinedWeb/C4
    drop it wholesale.  ``kept`` is the integer comparison
    ``total_score >= min_mean * n_docs`` (identical to mean >= min_mean
    but exact: no float division, so the flag is bit-stable across
    engines and partitionings).

    One partial-aggregated shuffle: only (host, count, sum) triples move;
    per-host fan-in skew (one host owning 10^9 pages) is absorbed by the
    map-side combine.
    """
    return (
        docs.groupBy(host_col)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(score_col).cast("long").alias("total_score"),
        )
        .withColumn(
            "kept",
            F.col("total_score") >= F.lit(int(min_mean)) * F.col("n_docs"),
        )
    )


def host_quality_gate(
    docs: DataFrame,
    score_col: str = "score",
    host_col: str = "host",
    min_mean: int = 24,
) -> DataFrame:
    """Drop every document of every below-threshold host.

    Left-semi join against the kept-host set.  The build side is the
    aggregation output of ``host_quality_report`` — AQE sizes it at
    runtime and broadcasts while the distinct-host universe fits (a
    domain-scoped crawl), degrading to a shuffled semi join at the
    10^7-10^8-host web scale, where AQE's skew-join split also bounds the
    hot-host partition.  Returns the input rows (all columns) of kept
    hosts only.
    """
    kept = (
        host_quality_report(docs, score_col, host_col, min_mean)
        .filter(F.col("kept"))
        .select(host_col)
    )
    return docs.join(kept, on=host_col, how="left_semi")


# ---------------------------------------------------------------------------
# corpus-wide duplicated-window fraction (exact-substring dedup signal)
# ---------------------------------------------------------------------------


def window_keys(text: Column, n: int = 10) -> Column:
    """md5-prefix keys of ALL n-token windows of ``text`` in document
    order (stride 1 — the published exact-substring-dedup grain, Lee et
    al.'s 50-token windows scaled by the caller).  One trailing partial
    window survives for T < n (shingle_windows semantics), so every
    non-empty document has >= 1 window.  md5 compares identically in
    Spark and DuckDB; 16 hex chars = 64 bits, collision-negligible at
    10^12 windows."""
    return F.transform(
        shingle_windows(text, n), lambda s: F.substring(F.md5(s), 1, 16)
    )


def dup_window_fraction(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact-substring duplication signal per document:
    ``(id, n_windows, n_dup_windows, dup_fraction)`` where a window is
    duplicated iff the same n-token window occurs at an EARLIER (id, pos)
    anywhere in the corpus (the first occurrence is never counted — a
    document only pays for text some other/earlier document already
    contains).

    This is the document-level form of exact substring deduplication
    (ExactSubstr): instead of surgically cutting the repeated bytes, each
    document reports what fraction of its n-token windows is secondhand;
    ``drop_window_dups`` applies the threshold policy.

    Skew-proof by the line_dedup construction: the keeper per window key
    is a combine-safe ``min(struct(id, pos))`` aggregate (the hottest
    boilerplate window partial-aggregates map-side, never a
    ``row_number`` straggler task), the dup test is a many-to-one hash
    join against the one-row-per-key keeper table, and the per-document
    rollup is a second partial aggregate.  Two shuffles total, both on
    near-uniform keys.  ``docs``'s lineage is evaluated once here (the
    explode feeds both the keeper agg and the join probe) but callers
    composing this with :func:`drop_window_dups` read ``docs`` again for
    the semi join — persist an expensive input lineage first
    (``clean_pipeline`` fences this internally)."""
    ex = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(window_keys(F.col(text_col), n)).alias("__pos", "__w"),
    )
    keepers = ex.groupBy("__w").agg(
        F.min(F.struct("__id", "__pos")).alias("__k")
    )
    joined = ex.join(keepers, "__w")
    is_dup = (F.col("__id") != F.col("__k.__id")) | (
        F.col("__pos") != F.col("__k.__pos")
    )
    return (
        joined.groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum(is_dup.cast("long")).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
    )


def drop_window_dups(
    docs: DataFrame,
    max_fraction: float = 0.5,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove documents whose duplicated-window fraction exceeds
    ``max_fraction`` (mostly-secondhand text: mirrors, quote farms,
    templated spam).  Left-semi join against the kept ids; all input
    columns survive."""
    kept = (
        dup_window_fraction(docs, n, id_col, text_col)
        .filter(F.col("dup_fraction") <= max_fraction)
        .select(id_col)
    )
    return docs.join(kept, on=id_col, how="left_semi")


def exact_substr_cut(
    docs: DataFrame,
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The SURGICAL form of exact-substring deduplication (Lee et al.):
    every duplicated n-token window — same window at an earlier (id, pos)
    anywhere in the corpus — has its tokens CUT from the document; the
    first occurrence keeps its text.  Returns ``(id, text)`` where text
    is rebuilt from the surviving tokens.

    Output is in TOKEN space: documents that lose windows are re-joined
    with single spaces (the token-stream grain real ExactSubstr pipelines
    operate on); untouched documents pass through byte-identical.
    Overlapping dup windows merge naturally — the covered set is the
    union of their [pos, pos+n) index ranges, computed in-row from the
    per-document sorted dup-start list.

    Scale shape = :func:`dup_window_fraction` plus the cut, which is
    FULLY RELATIONAL: keeper per window key is the combine-safe
    ``min(struct(id, pos))``, the dup test a many-to-one join against the
    one-row-per-key keeper table, and the cut itself an exploded
    token-index anti-join against the exploded covered-index set —
    only documents that actually lost a window ever explode their tokens
    (left-semi gate), untouched documents pass through byte-identical
    without touching the token path at all.

    Why not in-row: the earlier form referenced the covered-index
    expression (``array_distinct(flatten(transform(__starts, ...)))``)
    inside the per-token ``F.filter`` lambda; Catalyst inlines the
    referenced subtree into the lambda body and higher-order functions
    evaluate interpreted with no common-subexpression elimination, so the
    flatten/distinct re-executed for EVERY token — O(T × C·n) per row
    (the same measured re-execution family as the round-3 shingle /
    MinHash fixes, BENCH.md).  The exploded form is O(tokens) work with
    near-uniform shuffle keys ((id, idx) pairs) and per-key state bounded
    by one token — boilerplate-heavy documents (ExactSubstr's common
    case) cost linear time instead of quadratic.  Measured on a planted
    1k-token mirror corpus: see BENCH.md (ExactSubstr cut entry)."""
    ex = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(window_keys(F.col(text_col), n)).alias("__pos", "__w"),
    )
    keepers = ex.groupBy("__w").agg(
        F.min(F.struct("__id", "__pos")).alias("__k")
    )
    is_dup = (F.col("__id") != F.col("__k.__id")) | (
        F.col("__pos") != F.col("__k.__pos")
    )
    dup_starts = ex.join(keepers, "__w").filter(is_dup).select("__id", "__pos")
    # covered token indices of dirty docs, as ROWS: overlapping windows
    # merge via relational distinct, never an in-row set union
    cov = dup_starts.select(
        "__id",
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(n - 1))
        ).alias("__idx"),
    ).distinct()
    dirty_ids = cov.select("__id").distinct()
    dirty = docs.join(
        dirty_ids.withColumnRenamed("__id", id_col), id_col, "left_semi"
    )
    toks_ex = dirty.select(
        F.col(id_col).alias("__id"),
        F.posexplode(tokens(F.col(text_col))).alias("__idx", "__tok"),
    )
    rebuilt = (
        toks_ex.join(cov, ["__id", "__idx"], "left_anti")
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__idx", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("__cut")
        )
    )
    clean = docs.join(
        dirty_ids.withColumnRenamed("__id", id_col), id_col, "left_anti"
    ).select(F.col(id_col), F.col(text_col))
    # a fully-covered document loses every token: no surviving rows, so
    # the left join yields NULL and the text coalesces to '' (array_join
    # over an empty array — the previous in-row form's exact output)
    cut_docs = dirty_ids.join(rebuilt, "__id", "left").select(
        F.col("__id").alias(id_col),
        F.coalesce(F.col("__cut"), F.lit("")).alias(text_col),
    )
    return clean.unionByName(cut_docs)


def duck_exact_substr_sql(
    docs_rel: str = "documents",
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin of :func:`exact_substr_cut`: ROW_NUMBER first
    occurrence, per-document dup-start list, covered-index union, 1-based
    ``list_filter`` index rebuild."""
    prelude = f"{prelude_ctes}," if prelude_ctes else ""
    return f"""
        WITH {prelude} toks AS (
            SELECT {id_col} AS id,
                   string_split(trim({text_col}), ' ') AS t,
                   {text_col} AS orig
            FROM {docs_rel}
        ),
        keyed AS (
            SELECT id,
                   CAST(unnest(range(0, greatest(len(t) - {n} + 1, 1)))
                        AS BIGINT) AS pos,
                   t
            FROM toks
        ),
        flagged AS (
            SELECT id, pos,
                   row_number() OVER (
                       PARTITION BY substr(md5(array_to_string(
                           t[CAST(pos + 1 AS BIGINT) :
                             CAST(pos + {n} AS BIGINT)], ' ')), 1, 16)
                       ORDER BY id, pos) AS rn
            FROM keyed
        ),
        dup AS (
            SELECT id,
                   list_distinct(flatten(list_transform(
                       list_sort(list(pos)),
                       s -> range(s, s + {n})))) AS covered
            FROM flagged WHERE rn > 1 GROUP BY id
        )
        SELECT toks.id AS {id_col},
               CASE WHEN dup.covered IS NULL THEN toks.orig
                    -- duckdb's array_to_string of an empty list is NULL;
                    -- spark's array_join is '' (the fully-cut-doc case)
                    ELSE COALESCE(array_to_string(
                        list_filter(toks.t,
                                    (x, i) -> NOT list_contains(
                                        dup.covered, i - 1)), ' '), '')
               END AS {text_col}
        FROM toks LEFT JOIN dup ON toks.id = dup.id
    """


def duck_dup_window_sql(
    docs_rel: str = "documents",
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    prelude_ctes: str = "",
) -> str:
    """DuckDB twin: the readable ROW_NUMBER-first-occurrence form.
    ``prelude_ctes`` lets the caller plant an input CTE (e.g. a mirrored
    train set) that ``docs_rel`` then names."""
    prelude = f"{prelude_ctes}," if prelude_ctes else ""
    return f"""
        WITH {prelude} toks AS (
            SELECT {id_col} AS id,
                   string_split(trim({text_col}), ' ') AS t
            FROM {docs_rel}
        ),
        win AS (
            SELECT id,
                   CAST(unnest(range(0, greatest(len(t) - {n} + 1, 1)))
                        AS BIGINT) AS pos,
                   t
            FROM toks
        ),
        keyed AS (
            SELECT id, pos,
                   substr(md5(array_to_string(
                       t[CAST(pos + 1 AS BIGINT) :
                         CAST(pos + {n} AS BIGINT)], ' ')), 1, 16) AS w
            FROM win
        ),
        flagged AS (
            SELECT id, pos, w,
                   row_number() OVER (PARTITION BY w ORDER BY id, pos) AS rn
            FROM keyed
        )
        SELECT id AS {id_col},
               CAST(count(*) AS BIGINT) AS n_windows,
               CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT)
                   AS n_dup_windows,
               ROUND(count(*) FILTER (WHERE rn > 1) * 1.0 / count(*), 6)
                   AS dup_fraction
        FROM flagged GROUP BY id
    """


# ---------------------------------------------------------------------------
# Semantic (embedding-space) decontamination
# ---------------------------------------------------------------------------


def semantic_decontaminate(
    train: DataFrame,
    eval_: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Embedding-space benchmark decontamination: flag training documents
    whose embedding is cosine-``threshold``-close to ANY held-out eval
    embedding — the semantic complement of the k-gram overlap rule
    (:func:`decontaminate`), catching paraphrased benchmark leakage that
    shares no exact shingle.

    ``train`` has (``id_col``, ``emb`` array<double>); ``eval_`` has
    (``eval_id_col``, ``emb``).  The eval side is small by construction
    (thousands of benchmark items vs a 10^10-doc corpus) so it is
    explicitly broadcast with its norms precomputed — the train side
    streams through a BroadcastNestedLoopJoin once, and only flagged
    (train-id, 1) pairs reach the partial-aggregated rollup.  Cosines are
    rounded to 6 places BEFORE the threshold test and the max-aggregate
    (the repo's established cross-engine float discipline —
    similarity.embedding_near_dups).  At web scale the exact BNLJ is the
    certified baseline; the banded pre-filter (similarity.simhash_sketch
    bands, N3) drops non-candidates before the dot product with identical
    survivors.

    Returns (``id_col``, n_eval_hits, max_cos) per contaminated train doc.
    """
    from crawler_to_md_spark.operators.similarity import _dot, _norm

    tn = train.select(
        F.col(id_col), F.col("emb").alias("__tvec")
    ).withColumn("__tnrm", _norm(F.col("__tvec")))
    en = eval_.select(
        F.col(eval_id_col), F.col("emb").alias("__evec")
    ).withColumn("__enrm", _norm(F.col("__evec")))
    cos = F.round(
        _dot(F.col("__tvec"), F.col("__evec"))
        / (F.col("__tnrm") * F.col("__enrm")),
        6,
    )
    pairs = tn.crossJoin(F.broadcast(en)).withColumn("__cos", cos)
    return (
        pairs.filter(F.col("__cos") >= F.lit(threshold))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_hits"),
            F.max("__cos").alias("max_cos"),
        )
    )


def duck_semantic_decontam_sql(
    train_rel: str,
    eval_rel: str,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    prelude_ctes: str = "",
) -> str:
    """All-pairs oracle twin of :func:`semantic_decontaminate` — the
    oracle may brute-force what the engine broadcasts."""
    with_clause = f"WITH {prelude_ctes}" if prelude_ctes else ""
    return f"""
        {with_clause}
        SELECT CAST(t.{id_col} AS BIGINT) AS {id_col},
               CAST(count(*) AS BIGINT) AS n_eval_hits,
               max(round(list_cosine_similarity(t.emb, e.emb), 6))
                   AS max_cos
        FROM {train_rel} t JOIN {eval_rel} e
          ON round(list_cosine_similarity(t.emb, e.emb), 6) >= {threshold}
        GROUP BY 1
    """
