"""PII redaction, stratified mixture sampling, and the unigram-LM quality
score: value-level checks against hand-computed / textbook-window
references plus the plan-shape properties that make each operator
corpus-size-proof."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_to_md_spark.operators import privacy, sampling
from crawler_to_md_spark.operators.textstats import unigram_logprob


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

class TestRedactPii:
    def _df(self, spark, text):
        return spark.createDataFrame([(1, text)], "doc_id long, text string")

    def test_all_four_types(self, spark):
        row = privacy.redact_pii(self._df(
            spark,
            "mail bob.smith+x@foo-bar.co.uk ssn 123-45-6789 "
            "tel 555-867-5309 host 10.0.0.1 done",
        )).collect()[0]
        assert row["text"] == "mail <EMAIL> ssn <SSN> tel <PHONE> host <IP> done"
        assert (row["n_email"], row["n_ssn"], row["n_phone"], row["n_ipv4"],
                row["pii_total"]) == (1, 1, 1, 1, 4)

    def test_sequential_passes_do_not_double_count(self, spark):
        # the phone-shaped local part is consumed by the EMAIL pass first;
        # the later PHONE pass must see only the placeholder
        row = privacy.redact_pii(
            self._df(spark, "x 555-867-5309@example.com y")).collect()[0]
        assert row["text"] == "x <EMAIL> y"
        assert row["n_email"] == 1 and row["n_phone"] == 0

    def test_clean_text_untouched(self, spark):
        row = privacy.redact_pii(
            self._df(spark, "no pii here at all")).collect()[0]
        assert row["text"] == "no pii here at all"
        assert row["pii_total"] == 0

    def test_drop_pii_dense(self, spark):
        df = spark.createDataFrame(
            [(1, "a@b.co c@d.co e@f.co"), (2, "clean")],
            "doc_id long, text string")
        kept = privacy.drop_pii_dense(df, max_hits=2)
        assert [r["doc_id"] for r in kept.collect()] == [2]

    def test_plan_is_scan_only(self, spark):
        """One pass over the scan: no Exchange, no aggregate, no Python."""
        df = self._df(spark, "x")
        plan = (privacy.redact_pii(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "HashAggregate" not in plan
        assert "Python" not in plan

    def test_oracle_sql_matches_operator(self, spark):
        import duckdb
        rows = [(1, "a bob@x.io b 10.1.2.3"), (2, "ssn 987-65-4321 clean"),
                (3, "call 555 123 4567 or 555-123-4567"), (4, "none")]
        sdf = privacy.redact_pii(
            spark.createDataFrame(rows, "doc_id long, text string"))
        got = {r["doc_id"]: tuple(r)[1:] for r in sdf.collect()}
        con = duckdb.connect()
        con.sql("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        sql = privacy.pii_oracle_sql("t", other_cols=["doc_id"])
        cols = [c[0] for c in con.sql(sql).description]
        for rec in con.sql(sql).fetchall():
            d = dict(zip(cols, rec))
            assert got[d["doc_id"]] == tuple(
                d[c] for c in sdf.columns if c != "doc_id")


# ---------------------------------------------------------------------------
# stratified mixture sampling
# ---------------------------------------------------------------------------

class TestStratifiedSample:
    def _docs(self, spark, n=400):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.element_at(
                F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"),
                        F.lit("fr")),
                (F.col("id") % 5 + 1).cast("int")).alias("lang"),
        )

    def _caps(self, spark, caps):
        return spark.createDataFrame(sorted(caps.items()),
                                     "lang string, cap int")

    def _reference(self, df, caps):
        """Textbook unsalted top-cap-per-stratum under the same md5 key."""
        w = Window.partitionBy("lang").orderBy(
            sampling.sample_key("doc_id"))
        cap_expr = F.create_map(
            *[F.lit(x) for kv in sorted(caps.items()) for x in kv])
        return (df.withColumn("rn", F.row_number().over(w))
                  .withColumn("cap", cap_expr[F.col("lang")])
                  .filter(F.col("rn") <= F.col("cap")).drop("rn", "cap"))

    @pytest.mark.parametrize("shards", [1, 4, 16])
    def test_matches_textbook_window(self, spark, shards):
        caps = {"en": 30, "de": 10, "fr": 7}
        df = self._docs(spark)
        got = sampling.stratified_sample(
            df, ["lang"], self._caps(spark, caps), ["doc_id"],
            salt_shards=shards).select("doc_id", "lang")
        want = self._reference(df, caps).select("doc_id", "lang")
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, want.collect()))

    def test_unlisted_stratum_dropped_and_small_stratum_whole(self, spark):
        caps = {"de": 10**6, "fr": 3}   # no 'en' in the mixture
        got = sampling.stratified_sample(
            self._docs(spark), ["lang"], self._caps(spark, caps),
            ["doc_id"]).groupBy("lang").count().collect()
        by = {r["lang"]: r["count"] for r in got}
        assert "en" not in by
        assert by["de"] == 80      # whole stratum, cap exceeds size
        assert by["fr"] == 3

    def test_partitioning_invariant(self, spark):
        caps = {"en": 12, "de": 5, "fr": 5}
        df = self._docs(spark)
        a = sampling.stratified_sample(
            df, ["lang"], self._caps(spark, caps), ["doc_id"])
        b = sampling.stratified_sample(
            df.repartition(7), ["lang"], self._caps(spark, caps),
            ["doc_id"])
        assert sorted(map(tuple, a.collect())) == \
            sorted(map(tuple, b.collect()))

    def test_caps_side_is_broadcast(self, spark):
        plan = (sampling.stratified_sample(
            self._docs(spark), ["lang"],
            self._caps(spark, {"en": 5}), ["doc_id"])
            ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan


class TestMixtureReport:
    def test_counts_weights_shares(self, spark):
        df = spark.createDataFrame(
            [("en", "s0", "a b c"), ("en", "s0", "d e"),
             ("de", "s1", "f g h i j")],
            "lang string, source string, text string")
        rows = {(r["lang"], r["source"]): r
                for r in sampling.mixture_report(
                    df, ["lang", "source"]).collect()}
        en = rows[("en", "s0")]
        de = rows[("de", "s1")]
        assert (en["docs"], en["weight"]) == (2, 5)
        assert (de["docs"], de["weight"]) == (1, 5)
        assert en["share"] == de["share"] == 0.5


# ---------------------------------------------------------------------------
# unigram LM score
# ---------------------------------------------------------------------------

class TestUnigramLogprob:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string")
        got = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}

        def lpu(cnt, total=5):
            return round((math.log(cnt) - math.log(total)) * 1e6)

        d1 = round((2 * lpu(2) + 1 * lpu(2)) / (3 * 1e6), 6)
        d2 = round((1 * lpu(2) + 1 * lpu(1)) / (2 * 1e6), 6)
        assert got[1]["n_tokens"] == 3 and got[1]["lm_logprob"] == d1
        assert got[2]["n_tokens"] == 2 and got[2]["lm_logprob"] == d2

    def test_repeated_tokens_score_higher(self, spark):
        # a doc made of the corpus's most common token outscores a doc of
        # hapaxes — the signal the quality gate consumes
        docs = spark.createDataFrame(
            [(1, "x x x x"), (2, "q w e r")], "doc_id long, text string")
        got = {r["doc_id"]: r["lm_logprob"]
               for r in unigram_logprob(docs).collect()}
        assert got[1] > got[2]

    def test_partitioning_invariant(self, spark):
        docs = spark.range(200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok"), (F.col("id") % 17).cast("string"),
                     F.lit(" common word"),
                     F.lit(" tok"), (F.col("id") % 5).cast("string"))
            .alias("text"))
        a = unigram_logprob(docs).collect()
        b = unigram_logprob(docs.repartition(13)).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
