"""Interleaved-span operators (operators/interleaved.py): the media-fetch
manifest, per-document span statistics, and multimodal token-budget
packing over the engine's native document shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

from crawler_to_md_spark.operators import interleaved
from crawler_to_md_spark.store.schemas import SPANS_TYPE

DOC_SCHEMA = StructType(
    [StructField("url", StringType(), False), StructField("spans", SPANS_TYPE)]
)


def _span(kind, text=None, ref=None, offset=0):
    return Row(kind=kind, text=text, media_ref=ref, offset=offset)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(url=u, spans=s) for u, s in rows], DOC_SCHEMA
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # page A: heading + 2 paras + shared logo + own photo + 2 links
    # page B: heading + 1 para + shared logo + a video + 1 link
    # page C: text only, no media, empty-text para must not add tokens
    return _docs(
        spark,
        [
            (
                "https://h0/a",
                [
                    _span("heading1", "Doc A"),
                    _span("paragraph", "alpha beta gamma"),
                    _span("paragraph", "delta"),
                    _span("image", None, "https://h0/logo.png"),
                    _span("image", None, "https://h0/a.jpg"),
                    _span("link", "child", "https://h0/b"),
                    _span("link", "out", "https://x/y"),
                ],
            ),
            (
                "https://h0/b",
                [
                    _span("heading1", "Doc B"),
                    _span("paragraph", "epsilon zeta"),
                    _span("image", None, "https://h0/logo.png"),
                    _span("video", None, "https://h0/b.mp4"),
                    _span("link", "up", "https://h0/a"),
                ],
            ),
            (
                "https://h0/c",
                [
                    _span("heading1", "Doc C"),
                    _span("code", "print(1)"),
                ],
            ),
        ],
    )


class TestMediaManifest:
    def test_manifest(self, spark, corpus):
        rows = {
            r["media_ref"]: r
            for r in interleaved.media_manifest(corpus).collect()
        }
        # link hrefs are NOT media refs
        assert set(rows) == {
            "https://h0/logo.png",
            "https://h0/a.jpg",
            "https://h0/b.mp4",
        }
        logo = rows["https://h0/logo.png"]
        assert logo["n_refs"] == 2
        assert logo["first_url"] == "https://h0/a"
        assert logo["kind"] == "image"
        assert rows["https://h0/b.mp4"]["kind"] == "video"
        assert rows["https://h0/b.mp4"]["n_refs"] == 1

    def test_kind_restriction(self, spark, corpus):
        only_video = interleaved.media_manifest(corpus, kinds=("video",))
        assert [r["media_ref"] for r in only_video.collect()] == [
            "https://h0/b.mp4"
        ]

    def test_single_aggregate_plan(self, spark, corpus):
        plan = interleaved.media_manifest(corpus)._jdf.queryExecution(
        ).executedPlan().toString()
        # one hash-aggregate pair around one exchange: partial counts
        # collapse per-ref fan-in map-side
        assert plan.count("Exchange hashpartitioning") == 1


class TestSpanStats:
    def test_values(self, spark, corpus):
        rows = {r["url"]: r for r in interleaved.span_stats(corpus).collect()}
        a = rows["https://h0/a"]
        assert (a["n_spans"], a["n_text_spans"], a["n_media_spans"],
                a["n_link_spans"]) == (7, 3, 2, 2)
        # 'Doc A'(2) + 'alpha beta gamma'(3) + 'delta'(1)
        assert a["n_text_tokens"] == 6
        assert a["media_per_100_tokens"] == pytest.approx(
            round(2 * 100 / 6, 6))
        c = rows["https://h0/c"]
        # code counts as a text span: 'print(1)' = 1 token
        assert (c["n_text_spans"], c["n_text_tokens"],
                c["n_media_spans"]) == (2, 3, 0)
        assert c["media_per_100_tokens"] == 0.0

    def test_scan_only_plan(self, spark, corpus):
        plan = interleaved.span_stats(corpus)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan
        assert "HashAggregate" not in plan


class TestPackInterleaved:
    def test_media_cost_math(self, spark, corpus):
        out = {
            r["url"]: r
            for r in interleaved.pack_interleaved(
                corpus, budget=300, media_cost=100, approx_rows=3
            ).collect()
        }
        a, b, c = (out["https://h0/a"], out["https://h0/b"],
                   out["https://h0/c"])
        assert (a["n_text_tokens"], a["n_media"], a["cost"]) == (6, 2, 206)
        assert (b["n_text_tokens"], b["n_media"], b["cost"]) == (4, 2, 204)
        assert (c["n_text_tokens"], c["n_media"], c["cost"]) == (3, 0, 3)
        # url order: a(0..205), b(206..409), c(410..412)
        assert (a["shard_id"], a["shard_offset"]) == (0, 0)
        assert (b["shard_id"], b["shard_offset"]) == (0, 206)
        assert (c["shard_id"], c["shard_offset"]) == (1, 110)

    def test_scale_path_equals_small_path(self, spark, corpus):
        small = interleaved.pack_interleaved(
            corpus, budget=128, media_cost=256, approx_rows=3).collect()
        scale = interleaved.pack_interleaved(
            corpus, budget=128, media_cost=256).collect()
        key = lambda r: r["url"]  # noqa: E731
        assert sorted(small, key=key) == sorted(scale, key=key)

    def test_zero_media_cost_reduces_to_text_tokens(self, spark, corpus):
        out = interleaved.pack_interleaved(
            corpus, budget=64, media_cost=0, approx_rows=3).collect()
        assert all(r["cost"] == r["n_text_tokens"] for r in out)

    def test_bad_args(self, spark, corpus):
        with pytest.raises(ValueError):
            interleaved.pack_interleaved(corpus, budget=0)
        with pytest.raises(ValueError):
            interleaved.pack_interleaved(corpus, budget=10, media_cost=-1)


def _ospans(*specs):
    # specs: (kind, text, ref) with offsets assigned in order
    return [
        Row(kind=k, text=t, media_ref=r, offset=i)
        for i, (k, t, r) in enumerate(specs)
    ]


class TestMediaContextPairs:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return _docs(
            spark,
            [
                (
                    "https://h0/a",
                    _ospans(
                        ("heading1", "Title A", None),
                        ("paragraph", "intro text", None),
                        ("image", None, "https://h0/1.png"),
                        ("paragraph", "outro text", None),
                        ("image", None, "https://h0/2.png"),
                        ("link", "anchor", "https://h0/b"),
                    ),
                ),
                (
                    # media-first doc: no text before; link must NOT count
                    # as following context
                    "https://h0/b",
                    _ospans(
                        ("image", None, "https://h0/3.png"),
                        ("link", "nav", "https://h0/a"),
                        ("paragraph", "caption below", None),
                    ),
                ),
                ("https://h0/c", _ospans(("paragraph", "no media", None))),
            ],
        )

    def test_contexts(self, spark, docs):
        got = {
            (r["url"], r["media_ref"]): (
                r["context_before"], r["context_after"])
            for r in interleaved.media_context_pairs(docs).collect()
        }
        assert got == {
            ("https://h0/a", "https://h0/1.png"): ("intro text", "outro text"),
            # nearest AFTER 2.png is nothing (link excluded); before is outro
            ("https://h0/a", "https://h0/2.png"): ("outro text", None),
            # media-first: no before; link skipped, paragraph is after
            ("https://h0/b", "https://h0/3.png"): (None, "caption below"),
        }

    def test_no_media_doc_emits_nothing(self, spark, docs):
        urls = {r["url"]
                for r in interleaved.media_context_pairs(docs).collect()}
        assert "https://h0/c" not in urls

    def test_scan_only_until_explode(self, spark, docs):
        plan = (interleaved.media_context_pairs(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan  # no shuffle anywhere


class TestSectionChunks:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return _docs(
            spark,
            [
                (
                    "https://h0/a",
                    _ospans(
                        ("paragraph", "preamble", None),      # section 0
                        ("heading1", "H1", None),             # section 1
                        ("paragraph", "one", None),
                        ("image", None, "https://h0/1.png"),
                        ("heading2", "H2", None),             # section 2
                        ("paragraph", "two", None),
                        ("link", "nav", "https://h0/b"),
                    ),
                ),
                ("https://h0/b", _ospans(("heading1", "only", None))),
                ("https://h0/empty", []),
            ],
        )

    def test_sections(self, spark, docs):
        rows = {
            (r["url"], r["section_id"]): r
            for r in interleaved.section_chunks(docs).collect()
        }
        pre = rows[("https://h0/a", 0)]
        assert pre["heading"] is None
        assert (pre["n_spans"], pre["text"]) == (1, "preamble")
        s1 = rows[("https://h0/a", 1)]
        # heading + paragraph + image = 3 spans; image adds no text
        assert (s1["heading"], s1["n_spans"], s1["text"]) == (
            "H1", 3, "H1\none")
        s2 = rows[("https://h0/a", 2)]
        # link counts as a span but never contributes text
        assert (s2["heading"], s2["n_spans"], s2["text"]) == (
            "H2", 3, "H2\ntwo")
        assert rows[("https://h0/b", 1)]["text"] == "only"

    def test_empty_doc_emits_nothing(self, spark, docs):
        urls = {r["url"] for r in interleaved.section_chunks(docs).collect()}
        assert "https://h0/empty" not in urls

    def test_no_preamble_means_no_section_zero(self, spark, docs):
        ids = {r["section_id"] for r in interleaved.section_chunks(docs)
               .filter("url = 'https://h0/b'").collect()}
        assert ids == {1}

    def test_scan_only_until_explode(self, spark, docs):
        plan = (interleaved.section_chunks(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestSpanCap:
    """The max_spans guard on the in-row O(n²) operators: truncation is
    deliberate and surfaced, never an unbounded executor stall."""

    def _long_doc(self, spark, n):
        spans = [("heading1", "H", None)]
        for i in range(n - 1):
            spans.append(("paragraph", f"p{i}", None))
        return _docs(spark, [("https://h0/long", _ospans(*spans))])

    def test_truncation_processes_prefix_only(self, spark):
        docs = self._long_doc(spark, 20)
        full = interleaved.section_chunks(docs, max_spans=None).collect()
        capped = interleaved.section_chunks(docs, max_spans=5).collect()
        assert sum(r["n_spans"] for r in full) == 20
        assert sum(r["n_spans"] for r in capped) == 5
        # prefix semantics: the capped text is a prefix of the full text
        assert full[0]["text"].startswith(capped[0]["text"])

    def test_under_cap_is_identity(self, spark):
        docs = self._long_doc(spark, 20)
        a = interleaved.section_chunks(docs).collect()
        b = interleaved.section_chunks(docs, max_spans=None).collect()
        assert a == b

    def test_media_context_cap(self, spark):
        spans = [("paragraph", "intro", None),
                 ("image", None, "https://h0/1.png"),
                 ("paragraph", "mid", None),
                 ("image", None, "https://h0/2.png")]
        docs = _docs(spark, [("https://h0/m", _ospans(*spans))])
        got = interleaved.media_context_pairs(docs, max_spans=2).collect()
        # only the first 2 spans survive: one media, before=intro, after=None
        assert [(r["media_ref"], r["context_before"], r["context_after"])
                for r in got] == [("https://h0/1.png", "intro", None)]

    def test_cap_count_is_observed_not_silent(self, spark):
        docs = self._long_doc(spark, 20)
        plan = (interleaved.section_chunks(docs, max_spans=5)
                ._jdf.queryExecution().analyzed().toString())
        assert "n_truncated_docs" in plan  # CollectMetrics node present
