"""Corpus-curation operators: benchmark decontamination and repetition
signals (operators/curation.py) plus the shingle_windows refactor they
build on (operators/textstats.py)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators import curation
from crawler_to_md_spark.operators.textstats import shingle_windows, shingles


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")).first()["v"]


# ---------------------------------------------------------------------------
# shingle_windows (non-distinct ordered form)
# ---------------------------------------------------------------------------

class TestShingleWindows:
    def test_ordered_non_distinct(self, spark):
        got = _one(spark, "a b a b c", shingle_windows(F.col("text"), 2))
        assert got == ["a b", "b a", "a b", "b c"]

    def test_distinct_form_matches_set(self, spark):
        got = _one(spark, "a b a b c", shingles(F.col("text"), 2))
        assert got == ["a b", "b a", "b c"]

    def test_short_doc_keeps_partial_window(self, spark):
        assert _one(spark, "a b", shingle_windows(F.col("text"), 5)) == ["a b"]

    def test_k1_is_tokens(self, spark):
        assert _one(spark, "a b a", shingle_windows(F.col("text"), 1)) == [
            "a", "b", "a"]
        assert _one(spark, "a b a", shingles(F.col("text"), 1)) == ["a", "b"]


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------

def _py_rep(text: str, n: int) -> tuple[float, float]:
    toks = text.split(" ")
    wins = [" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1))]
    c = Counter(wins)
    total = len(wins)
    top = max(c.values()) / total
    dup = sum(v for v in c.values() if v >= 2) / total
    return round(top, 6), round(dup, 6)


class TestRepetitionStats:
    TEXTS = [
        "a b a b a b c",          # heavy 2-gram repetition
        "x y z w v u t s",        # no repetition at all
        "q q q q q q",            # degenerate single-token generator
        "one two",                # shorter than n=3 (partial window)
    ]

    @pytest.mark.parametrize("impl", ["native", "pandas"])
    def test_matches_python_reference(self, spark, impl):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string")
        rows = {r["doc_id"]: r
                for r in curation.repetition_stats(docs, impl=impl)
                .collect()}
        for i, t in enumerate(self.TEXTS):
            toks = t.split(" ")
            assert rows[i]["distinct_token_ratio"] == round(
                len(set(toks)) / len(toks), 6)
            for n in (2, 3):
                top, dup = _py_rep(t, n)
                assert rows[i][f"top{n}gram_frac"] == top, (i, n)
                assert rows[i][f"dup{n}gram_frac"] == dup, (i, n)

    @pytest.mark.parametrize("impl", ["native", "pandas"])
    def test_plan_is_shuffle_free(self, spark, impl):
        """Both impls must stay a pure scan: no Exchange, no aggregate
        operator — the property that makes them corpus-size-proof."""
        docs = spark.createDataFrame([(1, "a b c a b")],
                                     "doc_id long, text string")
        plan = (curation.repetition_stats(docs, impl=impl)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "HashAggregate" not in plan

    def test_impls_are_bit_identical(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string")
        a = sorted(map(tuple, curation.repetition_stats(
            docs, impl="native").collect()))
        b = sorted(map(tuple, curation.repetition_stats(
            docs, impl="pandas").collect()))
        assert a == b


# ---------------------------------------------------------------------------
# corpus-wide line dedup
# ---------------------------------------------------------------------------

class TestLineDedup:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "NAV home\nunique one\nrepeated body\nunique two"),
                (2, "NAV home\nrepeated body\nonly in two"),
                (3, "NAV home\nNAV home\nthird things"),   # intra-doc dup
                (4, "NAV home"),                           # all-dup doc
            ],
            "doc_id long, text string")

    def test_first_occurrence_wins_and_order_holds(self, spark):
        got = {r["doc_id"]: r for r in curation.line_dedup(
            self._docs(spark)).collect()}
        assert got[1]["text"] == (
            "NAV home\nunique one\nrepeated body\nunique two")
        assert got[2]["text"] == "only in two"
        assert got[3]["text"] == "third things"      # both NAV copies gone
        assert 4 not in got                          # nothing survived
        assert (got[1]["n_lines"], got[1]["n_lines_kept"]) == (4, 4)
        assert (got[2]["n_lines"], got[2]["n_lines_kept"]) == (3, 1)
        assert (got[3]["n_lines"], got[3]["n_lines_kept"]) == (3, 1)

    def test_short_line_exemption(self, spark):
        got = {r["doc_id"]: r for r in curation.line_dedup(
            self._docs(spark), min_line_tokens=3).collect()}
        # every 2-token line is exempt (kept even when duplicated);
        # 3-token "only in two" is subject to dedup but unique
        assert got[2]["text"] == "NAV home\nrepeated body\nonly in two"
        assert got[4]["text"] == "NAV home"

    def test_no_window_skew_operator_in_plan(self, spark):
        """The keeper must be a partial-aggregated min + semi join, never
        a row_number window partitioned by the line digest (the hottest
        boilerplate line would become one straggler task)."""
        plan = (curation.line_dedup(self._docs(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert "RunningWindowFunction" not in plan and "Window" not in plan
        assert "LeftSemi" in plan
        assert "partial_min" in plan or "partial min" in plan.lower()


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

class TestDecontaminate:
    @pytest.mark.parametrize("impl", ["native", "pandas"])
    def test_flags_exactly_the_overlapping_docs(self, spark, impl):
        bench = spark.createDataFrame(
            [(100, "b1 b2 b3 b4 b5"), (101, "c1 c2 c3 c4 c5 c6")],
            "doc_id long, text string")
        train = spark.createDataFrame(
            [
                (1, "x b1 b2 b3 y"),            # shares 3-gram "b1 b2 b3"
                (2, "c4 c5 c6"),                # shares "c4 c5 c6"
                (3, "b1 b3 b2 c1 c3"),          # same words, no shared 3-gram
                (4, "b2 b3 b4 b5 q c1 c2 c3"),  # two bench docs hit
            ],
            "doc_id long, text string")
        got = {r["doc_id"]: r for r in curation.decontaminate(
            train, bench, k=3, impl=impl).collect()}
        assert {i: g["contaminated"] for i, g in got.items()} == {
            1: True, 2: True, 3: False, 4: True}
        assert got[1]["n_contaminated_grams"] == 1
        assert got[2]["n_contaminated_grams"] == 1
        assert got[3]["n_contaminated_grams"] == 0
        # doc 4: "b2 b3 b4", "b3 b4 b5" from bench 100; "c1 c2 c3" from 101
        assert got[4]["n_contaminated_grams"] == 3

    def test_bloom_prefilter_is_bit_identical(self, spark):
        """use_bloom=True (hash-bloom gram prefilter + exact join on
        survivors) must equal the unbloomed path exactly — the bloom only
        removes sure-misses, the join removes its false positives."""
        bench = spark.createDataFrame(
            [(100, "b1 b2 b3 b4 b5"), (101, "c1 c2 c3 c4 c5 c6")],
            "doc_id long, text string")
        train = spark.createDataFrame(
            [(1, "x b1 b2 b3 y"), (2, "c4 c5 c6"), (3, "b1 b3 b2 c1 c3"),
             (4, "b2 b3 b4 b5 q c1 c2 c3"), (5, "clean doc entirely")],
            "doc_id long, text string")
        plain = {tuple(r) for r in curation.decontaminate(
            train, bench, k=3).collect()}
        bloomed = {tuple(r) for r in curation.decontaminate(
            train, bench, k=3, use_bloom=True,
            bloom_bits=1 << 16).collect()}
        assert plain == bloomed

    def test_report_covers_every_train_doc(self, spark):
        bench = spark.createDataFrame([(9, "z z z")],
                                      "doc_id long, text string")
        train = spark.createDataFrame(
            [(i, f"w{i} a b") for i in range(20)],
            "doc_id long, text string")
        out = curation.decontaminate(train, bench, k=3)
        assert out.count() == 20
        assert out.filter("contaminated").count() == 0

    def test_clean_pipeline_decontam_stage(self, spark):
        """clean_pipeline(bench=...) drops contaminated docs after the
        gate and before dedup — the keeper of a dup group can change when
        the old keeper was contaminated."""
        from crawler_to_md_spark.operators.dedup import clean_pipeline

        bench = spark.createDataFrame([(100, "s1 s2 s3 s4 s5")],
                                      "doc_id long, text string")
        docs = spark.createDataFrame(
            [
                (1, "s1 s2 s3 plus other words"),   # contaminated keeper
                (2, "clean doc one two three"),
                (3, "clean doc one two three"),     # exact dup of 2
                (4, "short"),                       # fails gate
            ],
            "doc_id long, text string")
        got = sorted(r["doc_id"] for r in clean_pipeline(
            docs, min_tokens=2, bench=bench, decontam_k=3).collect())
        assert got == [2]  # 1 decontaminated, 3 deduped, 4 gated
        # without bench, doc 1 survives
        got2 = sorted(r["doc_id"] for r in clean_pipeline(
            docs, min_tokens=2).collect())
        assert got2 == [1, 2]

    def test_bench_side_is_broadcast(self, spark):
        bench = spark.createDataFrame([(9, "a b c d")],
                                      "doc_id long, text string")
        train = spark.createDataFrame([(1, "a b c d e")],
                                      "doc_id long, text string")
        plan = (curation.decontaminate(train, bench, k=3)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan


class TestHostQualityGate:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        # goodhost mean 30 (>= 24), junkhost mean 10 (< 24),
        # edgehost total == 24 * n exactly (kept: >= is inclusive)
        rows = [
            ("https://good/a", "good", 40),
            ("https://good/b", "good", 20),
            ("https://junk/a", "junk", 10),
            ("https://junk/b", "junk", 10),
            ("https://edge/a", "edge", 24),
        ]
        return spark.createDataFrame(rows, "url string, host string, score long")

    def test_report(self, spark, scored):
        rep = {r["host"]: r for r in
               curation.host_quality_report(scored, min_mean=24).collect()}
        assert (rep["good"]["n_docs"], rep["good"]["total_score"],
                rep["good"]["kept"]) == (2, 60, True)
        assert rep["junk"]["kept"] is False
        assert rep["edge"]["kept"] is True   # inclusive boundary

    def test_gate_drops_whole_host(self, spark, scored):
        kept = curation.host_quality_gate(scored, min_mean=24)
        urls = sorted(r["url"] for r in kept.collect())
        assert urls == ["https://edge/a", "https://good/a", "https://good/b"]
        # all original columns survive the semi join
        assert set(kept.columns) == {"url", "host", "score"}

    def test_single_shuffle_report_plan(self, spark, scored):
        plan = curation.host_quality_report(scored)._jdf.queryExecution(
        ).executedPlan().toString()
        # partial agg -> one exchange -> final agg: only (host, count, sum)
        # triples move
        assert plan.count("Exchange hashpartitioning") == 1


class TestDupWindowFraction:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (1, "a b c d e f"),          # original
            (2, "a b c d e f"),          # full mirror of 1
            (3, "z z a b c d q r"),      # contains 1's "a b c d" window
            (4, "unique words only here"),
            (5, "tiny"),                 # T < n: one partial window
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_fractions(self, spark, docs):
        got = {r["doc_id"]: r for r in
               curation.dup_window_fraction(docs, n=4).collect()}
        # doc1: 3 windows, all first occurrences
        assert (got[1]["n_windows"], got[1]["n_dup_windows"]) == (3, 0)
        # doc2 mirrors doc1 entirely
        assert (got[2]["n_windows"], got[2]["n_dup_windows"]) == (3, 3)
        assert got[2]["dup_fraction"] == 1.0
        # doc3: 5 windows, exactly "a b c d" is secondhand
        assert (got[3]["n_windows"], got[3]["n_dup_windows"]) == (5, 1)
        assert got[4]["n_dup_windows"] == 0
        # partial-window doc still reports
        assert got[5]["n_windows"] == 1

    def test_intra_doc_repeat_counts_after_first(self, spark):
        df = spark.createDataFrame(
            [(1, "x y x y x y")], "doc_id long, text string")
        got = curation.dup_window_fraction(df, n=2).collect()[0]
        # windows: "x y","y x","x y","y x","x y" -> 3 dups of the first two
        assert (got["n_windows"], got["n_dup_windows"]) == (5, 3)

    def test_drop_policy(self, spark, docs):
        kept = {r["doc_id"] for r in
                curation.drop_window_dups(docs, max_fraction=0.5, n=4)
                .collect()}
        assert kept == {1, 3, 4, 5}   # doc2 (1.0 dup) dropped

    def test_no_window_in_plan(self, spark, docs):
        # skew discipline: keeper is min(struct), never a row_number window
        plan = (curation.dup_window_fraction(docs, n=4)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan


class TestCleanPipelineDupWindowStage:
    def test_exact_substr_stage_drops_mirrors_only(self, spark):
        from crawler_to_md_spark.operators.dedup import clean_pipeline

        base = "alpha beta gamma delta epsilon zeta eta theta"
        rows = [
            (1, base + " one two three four five"),
            # near-mirror of 1 but not byte-identical: survives exact
            # dedup, dies in the dup-window stage (mostly secondhand)
            (2, base + " one two three four five extra"),
            (3, "completely different words in this document body here"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        kept = sorted(r["doc_id"] for r in clean_pipeline(
            docs, min_tokens=3, threshold=0.99, k=3,
            max_dup_window=0.5, dup_window_n=4).collect())
        assert kept == [1, 3]
        # stage off: doc 2 survives (threshold .99 keeps near-dup stage out)
        kept_off = sorted(r["doc_id"] for r in clean_pipeline(
            docs, min_tokens=3, threshold=0.99, k=3).collect())
        assert kept_off == [1, 2, 3]


class TestExactSubstrCut:
    ROWS = [
        (1, "a b c d e f g h i j unique tail one two three"),
        (2, "a b c d e f g h i j different ending here now ok"),
        (3, "totally fresh words with no overlap at all here yes"),
        (4, "a b c d e f g h i j"),        # fully covered later copy
        (5, "x x x"),                      # short doc (partial window)
        (6, "x x x"),                      # exact dup of the short doc
    ]

    def _run(self, spark, n=10):
        docs = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        return {r["doc_id"]: r["text"]
                for r in curation.exact_substr_cut(docs, n=n).collect()}

    def test_first_occurrence_keeps_text(self, spark):
        got = self._run(spark)
        assert got[1] == self.ROWS[0][1]       # byte-identical pass-through
        assert got[3] == self.ROWS[2][1]
        assert got[5] == "x x x"

    def test_later_copies_are_cut(self, spark):
        got = self._run(spark)
        assert got[2] == "different ending here now ok"  # shared prefix cut
        assert got[4] == ""                              # fully covered
        assert got[6] == ""                              # short-doc dup

    def test_matches_duckdb_oracle(self, spark):
        import duckdb
        import pandas as pd

        got = self._run(spark)
        con = duckdb.connect()
        con.register("t_in", pd.DataFrame(self.ROWS,
                                          columns=["doc_id", "text"]))
        want = {r[0]: r[1] for r in con.sql(
            curation.duck_exact_substr_sql("t_in", n=10)).fetchall()}
        assert got == want

    def test_overlapping_windows_merge(self, spark):
        # doc 2 repeats doc 1's tokens 0..11 -> windows at pos 0,1,2 all
        # dup; covered union = [0, 12): one contiguous cut, no stutter
        rows = [
            (1, " ".join(f"w{i}" for i in range(12)) + " tail_one"),
            (2, " ".join(f"w{i}" for i in range(12)) + " tail_two"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["text"]
               for r in curation.exact_substr_cut(docs, n=10).collect()}
        assert got[1] == rows[0][1]
        assert got[2] == "tail_two"

    def test_idempotent(self, spark):
        # cut twice == cut once: after one pass no n-window occurs at two
        # (id, pos) grains anymore, so the second pass is the identity
        docs = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        once = curation.exact_substr_cut(docs, n=10)
        twice = curation.exact_substr_cut(once, n=10)
        a = {r["doc_id"]: r["text"] for r in once.collect()}
        b = {r["doc_id"]: r["text"] for r in twice.collect()}
        assert a == b

    def test_clean_docs_never_explode_tokens(self, spark):
        # untouched documents pass through on the left-anti branch: the
        # token-explode path is gated behind the dirty-id semi join, so a
        # no-dup corpus does zero token-grain work beyond the window scan
        docs = spark.createDataFrame(
            [(1, "only one doc so nothing can be secondhand here at all")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["text"]
               for r in curation.exact_substr_cut(docs, n=10).collect()}
        assert got == {1: docs.collect()[0]["text"]}
