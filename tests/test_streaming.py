"""Structured Streaming frontier tests.

Covers: foreachBatch scheduling equals the batch schedule chain applied
arrival-group by arrival-group (cross-batch dedup through the committed
seen set), epoch-replay idempotence, watermarked per-host request windows,
and the stateful admission operator's cross-batch budget."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.operators import schedule
from crawler_to_md_spark.store.schemas import LINKS_SCHEMA
from crawler_to_md_spark.store.warehouse import SnapshotStore
from crawler_to_md_spark.streaming import frontier


def _mk_candidates(spark):
    """Three arrival groups; url u3 appears in groups 0 and 2 (cross-batch
    dupe), u1 twice within group 0 (intra-batch dupe), plus junk."""
    rows = [
        # grp, page_url, href, parent_depth
        (0, "https://h0.example.com/a", "https://h0.example.com/u1", 0),
        (0, "https://h0.example.com/b", "/u1", 2),             # same as u1
        (0, "https://h0.example.com/a", "u3", 1),
        (0, "https://h0.example.com/a", "mailto:x@y.z", 0),    # junk
        (1, "https://h1.example.com/c", "https://h1.example.com/u2#frag", 3),
        (2, "https://h0.example.com/d", "/u3", 5),             # dupe of grp 0
        (2, "https://h2.example.com/e", "https://h2.example.com/u4", 1),
    ]
    return spark.createDataFrame(
        rows, "grp int, page_url string, href string, parent_depth int"
    )


def _run_stream(spark, tmp_path, host_budget=None):
    in_dir = str(tmp_path / "arrivals")
    os.makedirs(in_dir, exist_ok=True)
    frontier.write_candidate_arrivals(
        spark, _mk_candidates(spark), in_dir
    )
    store = SnapshotStore(
        spark, str(tmp_path / "wh"), schemas={"links": LINKS_SCHEMA}
    )
    sched = frontier.StreamingScheduler(
        store, store_buckets=8, host_budget=host_budget
    )
    q = sched.start(
        frontier.read_candidate_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    return store, sched, in_dir


def test_stream_schedule_matches_batchwise_reference(spark, tmp_path):
    store, _, _ = _run_stream(spark, tmp_path)
    got = {
        (r["url"], r["depth"], r["batch_id"])
        for r in store.read("links").collect()
    }
    # reference semantics: per-group dedup w/ min parent depth, first
    # arrival group wins across groups
    assert got == {
        ("https://h0.example.com/u1", 1, 0),   # min(0,2)+1
        ("https://h0.example.com/u3", 2, 0),   # relative href vs page /a
        ("https://h1.example.com/u2", 4, 1),   # fragment stripped
        ("https://h2.example.com/u4", 2, 2),   # u3 re-arrival deduped
    }
    # seq is dense 0-based within each commit (order key = (batch_id, seq))
    rows = store.read("links").collect()
    by_batch: dict[int, list[int]] = {}
    for r in rows:
        by_batch.setdefault(r["batch_id"], []).append(r["seq"])
    for seqs in by_batch.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_stream_epoch_replay_is_idempotent(spark, tmp_path):
    store, sched, in_dir = _run_stream(spark, tmp_path)
    before = sorted(
        (r["url"], r["seq"]) for r in store.read("links").collect()
    )
    batch0 = spark.createDataFrame(
        [("https://h0.example.com/a", "https://h0.example.com/u1", 0)],
        "page_url string, href string, parent_depth int",
    )
    # replay an old epoch directly (what foreachBatch does after failure)
    sched.process_batch(batch0, 0)
    after = sorted((r["url"], r["seq"]) for r in store.read("links").collect())
    assert after == before


def test_stream_matches_batch_operator_per_group(spark, tmp_path):
    """The streamed frontier equals applying the BATCH schedule operator
    group-by-group against the accumulating seen set."""
    store, _, _ = _run_stream(spark, tmp_path)
    cand = _mk_candidates(spark)
    seen = spark.createDataFrame([], LINKS_SCHEMA)
    expect = set()
    for g in (0, 1, 2):
        raw = cand.filter(F.col("grp") == g).drop("grp")
        _, unseen = schedule.schedule_candidates(raw, seen)
        rows = unseen.select("url", "depth").collect()
        expect |= {(r["url"], r["depth"], g) for r in rows}
        seen = seen.unionByName(
            spark.createDataFrame(
                [
                    (r["url"], 0, "h", False, 0, r["depth"], g, 0)
                    for r in rows
                ],
                LINKS_SCHEMA,
            ).withColumn("url_hash", F.xxhash64("url"))
            .select(*LINKS_SCHEMA.fieldNames())
        )
    got = {
        (r["url"], r["depth"], r["batch_id"])
        for r in store.read("links").collect()
    }
    assert got == expect


def test_stream_host_budget_caps_per_batch(spark, tmp_path):
    store, _, _ = _run_stream(spark, tmp_path, host_budget=1)
    per = (
        store.read("links")
        .groupBy("host", "batch_id")
        .count()
        .collect()
    )
    assert all(r["count"] <= 1 for r in per)


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 12, minute, second)


def test_host_request_windows_batch_semantics(spark):
    log = spark.createDataFrame(
        [
            ("h0", "u1", _ts(0, 10)),
            ("h0", "u2", _ts(0, 50)),
            ("h0", "u3", _ts(1, 5)),
            ("h1", "u4", _ts(0, 30)),
        ],
        frontier.FETCH_LOG_SCHEMA,
    )
    out = {
        (r["host"], r["window_start"].minute, r["requests"])
        for r in frontier.host_request_windows(log).collect()
    }
    assert out == {("h0", 0, 2), ("h0", 1, 1), ("h1", 0, 1)}


def test_host_request_windows_streaming_with_watermark(spark, tmp_path):
    in_dir = str(tmp_path / "log")
    os.makedirs(in_dir, exist_ok=True)
    log = spark.createDataFrame(
        [("h0", "u1", _ts(0, 10)), ("h0", "u2", _ts(0, 20)),
         ("h1", "u3", _ts(0, 40))],
        frontier.FETCH_LOG_SCHEMA,
    )
    log.coalesce(1).write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema(frontier.FETCH_LOG_SCHEMA).parquet(in_dir)
    )
    q = (
        frontier.host_request_windows(stream, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        (r["host"], r["requests"])
        for r in spark.sql("select * from wincounts").collect()
    }
    assert out == {("h0", 2), ("h1", 1)}


def test_stateful_admission_budget_spans_micro_batches(spark, tmp_path):
    """rate_limit=2/60s per host; 3 requests for h0 in the same window split
    across two micro-batches -> the third is rejected because GroupState
    carries (window_start, sent) across the batch boundary."""
    in_dir = str(tmp_path / "req")
    os.makedirs(in_dir, exist_ok=True)
    b0 = spark.createDataFrame(
        [("h0", "u1", _ts(0, 5)), ("h0", "u2", _ts(0, 10)),
         ("h1", "u5", _ts(0, 7))],
        frontier.FETCH_LOG_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [("h0", "u3", _ts(0, 30)),          # same 60s window -> rejected
         ("h0", "u4", _ts(2, 0)),           # new window -> admitted
         ("h1", "u6", _ts(0, 50))],         # h1 budget not exhausted
        frontier.FETCH_LOG_SCHEMA,
    )
    for i, b in enumerate((b0, b1)):
        tmp = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(in_dir, f"req-{i:04d}.parquet")
        os.replace(os.path.join(tmp, src), dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)

    stream = (
        spark.readStream.schema(frontier.FETCH_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        frontier.stateful_host_admission(stream, rate_limit=2)
        .writeStream.format("memory")
        .queryName("admissions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["url"]: r["admitted"]
        for r in spark.sql("select * from admissions").collect()
    }
    assert got == {"u1": True, "u2": True, "u5": True,
                   "u3": False, "u4": True, "u6": True}


# ---------------------------------------------------------------------------
# streaming corpus ingestion (streaming/ingest.py)
# ---------------------------------------------------------------------------


def _mk_docs(spark):
    # three arrival epochs; "dup text" re-arrives in epochs 0/1/2 from
    # different urls, "tiny" fails the 3-token quality gate
    rows = [
        (0, "https://h0.example.com/a", "dup text body with six tokens"),
        (0, "https://h0.example.com/b", "unique zero body has five tokens"),
        (1, "https://h0.example.com/c", "dup text body with six tokens"),
        (1, "https://h0.example.com/d", "unique one body alpha beta"),
        (1, "https://h0.example.com/e", "tiny doc"),
        (2, "https://h0.example.com/f", "dup text body with six tokens"),
        (2, "https://h0.example.com/g", "unique two body gamma delta"),
    ]
    return spark.createDataFrame(rows, "grp int, url string, text string")


def _run_ingest(spark, tmp_path):
    from crawler_to_md_spark.streaming import ingest

    in_dir = str(tmp_path / "docs_in")
    os.makedirs(in_dir, exist_ok=True)
    frontier.write_candidate_arrivals(spark, _mk_docs(spark), in_dir)
    store = SnapshotStore(
        spark, str(tmp_path / "corpus_wh"),
        schemas={"corpus_docs": ingest.CORPUS_DOCS_SCHEMA})
    ing = ingest.StreamingCorpusIngest(store, min_tokens=3, store_buckets=8)
    q = ing.start(
        ingest.read_document_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "ingest_ckpt"))
    q.awaitTermination()
    return store, ing


def test_stream_ingest_dedups_across_epochs(spark, tmp_path):
    store, _ = _run_ingest(spark, tmp_path)
    rows = store.read("corpus_docs").collect()
    by_text = {r["text"]: r for r in rows}
    assert len(rows) == len(by_text) == 4          # tiny gated, dups folded
    dup = by_text["dup text body with six tokens"]
    assert dup["url"] == "https://h0.example.com/a"   # first-epoch min-url
    assert dup["epoch"] == 0
    assert by_text["unique two body gamma delta"]["epoch"] == 2
    assert all(r["n_tokens"] >= 3 for r in rows)
    assert store.lineage["counters"]["docs_ingested"] == 4


def test_stream_ingest_epoch_replay_is_idempotent(spark, tmp_path):
    store, ing = _run_ingest(spark, tmp_path)
    before = sorted((r["digest"], r["url"], r["epoch"])
                    for r in store.read("corpus_docs").collect())
    batch_id_before = store.batch_id
    # replay an already-committed epoch with EXTRA rows: must be a no-op
    replay = spark.createDataFrame(
        [("https://h0.example.com/zz", "replayed body never lands here")],
        "url string, text string")
    ing.process_batch(replay, 1)
    assert store.batch_id == batch_id_before
    after = sorted((r["digest"], r["url"], r["epoch"])
                   for r in store.read("corpus_docs").collect())
    assert after == before


def test_stream_ingest_all_duplicate_batch_commits_lineage_only(spark,
                                                                tmp_path):
    store, ing = _run_ingest(spark, tmp_path)
    n_before = store.read("corpus_docs").count()
    dup_only = spark.createDataFrame(
        [("https://h9.example.com/x", "dup text body with six tokens")],
        "url string, text string")
    ing.process_batch(dup_only, 99)
    assert store.read("corpus_docs").count() == n_before
    assert store.lineage["ingest_epoch"] == 99     # epoch advanced anyway


# ---------------------------------------------------------------------------
# streaming NEAR-dup ingestion (near_threshold)
# ---------------------------------------------------------------------------

_BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
         "kilo lima mike november oscar papa quebec romeo sierra tango")


def _mk_near_docs(spark):
    # family 1: base + unique suffix per member (pairwise ~0.87 Jaccard,
    # a CLIQUE), members across epochs 0/1/2 plus an in-batch sibling pair
    # in epoch 0; family 2: a disjoint-vocabulary singleton; plus an exact
    # dup of a family-1 member re-arriving later (exact path still first)
    rows = [
        (0, "https://h0.example.com/f1-b", _BASE + " one"),
        (0, "https://h0.example.com/f1-a", _BASE + " two"),   # min url e0
        (1, "https://h0.example.com/f1-c", _BASE + " three"),
        (1, "https://h9.example.com/other",
         "zulu yankee xray whiskey victor uniform sierra2 quebec2 papa2 "
         "oscar2 november2 mike2 lima2 kilo2 india2 hotel2 golf2 foxtrot2"),
        (2, "https://h0.example.com/f1-d", _BASE + " four"),
        (2, "https://h0.example.com/f1-exact", _BASE + " one"),  # exact dup
    ]
    return spark.createDataFrame(rows, "grp int, url string, text string")


def _run_near_ingest(spark, tmp_path):
    from crawler_to_md_spark.streaming import ingest

    in_dir = str(tmp_path / "near_in")
    os.makedirs(in_dir, exist_ok=True)
    frontier.write_candidate_arrivals(spark, _mk_near_docs(spark), in_dir)
    store = SnapshotStore(
        spark, str(tmp_path / "near_wh"),
        schemas={"corpus_docs": ingest.CORPUS_DOCS_SCHEMA})
    ing = ingest.StreamingCorpusIngest(store, min_tokens=3, store_buckets=8,
                                       near_threshold=0.5)
    q = ing.start(
        ingest.read_document_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "near_ckpt"))
    q.awaitTermination()
    return store, ing


def test_stream_near_ingest_keeps_one_per_clique(spark, tmp_path):
    store, _ = _run_near_ingest(spark, tmp_path)
    rows = {r["url"]: r for r in store.read("corpus_docs").collect()}
    # family 1 collapsed to its earliest-epoch min-url member: the epoch-0
    # in-batch sibling lost by url domination, epochs 1/2 lost to the
    # committed corpus, the exact re-arrival lost to the digest anti-join
    assert set(rows) == {"https://h0.example.com/f1-a",
                         "https://h9.example.com/other"}
    keeper = rows["https://h0.example.com/f1-a"]
    assert keeper["epoch"] == 0
    assert keeper["minhash"] is not None and len(keeper["minhash"]) > 0
    assert store.lineage["counters"]["docs_ingested"] == 2


def test_stream_near_ingest_replay_is_idempotent(spark, tmp_path):
    store, ing = _run_near_ingest(spark, tmp_path)
    before = sorted((r["digest"], r["url"], r["epoch"])
                    for r in store.read("corpus_docs").collect())
    batch_id_before = store.batch_id
    replay = spark.createDataFrame(
        [("https://h0.example.com/f1-zz", _BASE + " replayed")],
        "url string, text string")
    ing.process_batch(replay, 1)                    # epoch 1 already applied
    assert store.batch_id == batch_id_before
    after = sorted((r["digest"], r["url"], r["epoch"])
                   for r in store.read("corpus_docs").collect())
    assert after == before
    # the same rows as a NEW epoch are near-dups of the keeper: lineage
    # advances, corpus unchanged
    ing.process_batch(replay, 50)
    assert store.lineage["ingest_epoch"] == 50
    assert sorted((r["digest"], r["url"], r["epoch"])
                  for r in store.read("corpus_docs").collect()) == before


def test_stream_near_ingest_chain_keeps_local_minima(spark, tmp_path):
    """Documented greedy semantics on a CHAIN (A~B, B~C, A!~C): the stream
    keeps the local minima (A and C when B has the largest url), where the
    batch closure would keep A alone — the stated online/offline trade."""
    from crawler_to_md_spark.operators import dedup
    from crawler_to_md_spark.streaming import ingest

    # chain construction compatible with LSH candidate recall: all three
    # docs share a dominant 62-token core (so nearly all MinHash minima
    # come from shared shingles and band collisions are near-certain);
    # the 4-token unique suffixes place the EXACT Jaccards at
    # J(A,B) = J(B,C) = 60/64 = .9375 and J(A,C) = 60/68 = .882 — a chain
    # through threshold 0.91.  (Low-J chains near t=0.5 are exactly where
    # LSH recall collapses, which is why this test cannot use them.)
    core = " ".join(f"y{i}" for i in range(1, 63))
    a_text = core + " pa1 pa2 pa3 pa4"
    b_text = core
    c_text = core + " pc1 pc2 pc3 pc4"
    # precondition: A~B and B~C at 0.91, A!~C (exact shingle Jaccard)
    tri = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, c_text)], "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in dedup.shingle_jaccard_pairs(
                 tri, threshold=0.91).collect()}
    assert pairs == {(1, 2), (2, 3)}

    in_dir = str(tmp_path / "chain_in")
    os.makedirs(in_dir, exist_ok=True)
    docs = spark.createDataFrame(
        [(0, "https://h/a", a_text), (0, "https://h/z-mid", b_text),
         (0, "https://h/c", c_text)],
        "grp int, url string, text string")
    frontier.write_candidate_arrivals(spark, docs, in_dir)
    store = SnapshotStore(
        spark, str(tmp_path / "chain_wh"),
        schemas={"corpus_docs": ingest.CORPUS_DOCS_SCHEMA})
    ing = ingest.StreamingCorpusIngest(store, min_tokens=3, store_buckets=8,
                                       near_threshold=0.91)
    q = ing.start(
        ingest.read_document_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "chain_ckpt"))
    q.awaitTermination()
    kept = sorted(r["url"] for r in store.read("corpus_docs").collect())
    assert kept == ["https://h/a", "https://h/c"]


# ---------------------------------------------------------------------------
# streaming WET-archive ingestion (sources/archive.read_wet_stream -> ingest)
# ---------------------------------------------------------------------------


def test_stream_wet_archive_ingest(spark, tmp_path):
    """Archive shards landing on storage stream straight into the corpus
    ingest: record-boundary split + parse per epoch, corrupt records
    dropped, cross-batch dedup unchanged."""
    import os as _os

    from crawler_to_md_spark.sources import archive
    from crawler_to_md_spark.streaming import ingest

    in_dir = str(tmp_path / "wet_in")
    _os.makedirs(in_dir)
    waves = [
        [("https://h/a", "dup text body with six tokens"),
         ("https://h/b", "unique zero body has five tokens")],
        [("https://h/c", "dup text body with six tokens"),   # cross-batch dup
         ("https://h/d", "unique one body alpha beta"),
         ("https://h/e", "tiny doc")],                        # gated
    ]
    for i, rows in enumerate(waves):
        df = spark.createDataFrame(rows, "url string, text string")
        archive.write_wet(df.coalesce(1), str(tmp_path / f"stage{i}"))
        part = [f for f in _os.listdir(str(tmp_path / f"stage{i}"))
                if f.startswith("part-")][0]
        dst = _os.path.join(in_dir, f"shard-{i}.wet")
        _os.rename(str(tmp_path / f"stage{i}" / part), dst)
        # distinct mtimes: the file source orders epochs by modification
        # time, and both shards land within the same clock tick here
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    # one unframeable shard: must be dropped by the stream, not crash it
    with open(_os.path.join(in_dir, "shard-bad.wet"), "w", newline="") as f:
        f.write("WARC/1.0\r\nWARC-Target-URI: bad\r\n\r\nno length\r\n\r\n")

    store = SnapshotStore(
        spark, str(tmp_path / "wet_corpus_wh"),
        schemas={"corpus_docs": ingest.CORPUS_DOCS_SCHEMA})
    ing = ingest.StreamingCorpusIngest(store, min_tokens=3, store_buckets=8)
    q = ing.start(
        archive.read_wet_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "wet_ckpt"))
    q.awaitTermination()

    got = {r["url"]: r["text"]
           for r in store.read("corpus_docs").collect()}
    assert set(got) == {"https://h/a", "https://h/b", "https://h/d"}
    assert got["https://h/a"] == "dup text body with six tokens"


def test_stream_warc_archive_ingest(spark, tmp_path):
    """Raw WARC capture shards stream through parse -> extraction ->
    markdown -> corpus ingest: 404s and corrupt records drop on the
    stream, cross-batch dedup sees the EXTRACTED text."""
    import os as _os

    from crawler_to_md_spark.sources import archive
    from crawler_to_md_spark.streaming import ingest

    def page(i, body):
        return (f"<html><head><title>T{i}</title></head>"
                f"<body><h1>Doc {i}</h1><p>{body}</p></body></html>")

    in_dir = str(tmp_path / "warc_in")
    _os.makedirs(in_dir)
    waves = [
        [(0, "https://h/a", 200, page(0, "dup body with five tokens")),
         (1, "https://h/b", 200, page(1, "unique zero body four tokens"))],
        [(2, "https://h/c", 200, page(0, "dup body with five tokens")),
         (3, "https://h/d", 404, page(3, "never kept: status gate")),
         (4, "https://h/e", 200, page(4, "unique one body alpha beta"))],
    ]
    for i, rows in enumerate(waves):
        df = spark.createDataFrame(
            rows, "id long, url string, status int, html string")
        archive.write_warc(df.coalesce(1), str(tmp_path / f"wstage{i}"),
                           status_col="status", id_col="id")
        part = [f for f in _os.listdir(str(tmp_path / f"wstage{i}"))
                if f.startswith("part-")][0]
        dst = _os.path.join(in_dir, f"shard-{i}.warc")
        _os.rename(str(tmp_path / f"wstage{i}" / part), dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    store = SnapshotStore(
        spark, str(tmp_path / "warc_corpus_wh"),
        schemas={"corpus_docs": ingest.CORPUS_DOCS_SCHEMA})
    ing = ingest.StreamingCorpusIngest(store, min_tokens=3, store_buckets=8)
    q = ing.start(
        archive.read_warc_stream(spark, in_dir, max_files_per_trigger=1),
        checkpoint_dir=str(tmp_path / "warc_ckpt"))
    q.awaitTermination()

    got = {r["url"]: r["text"] for r in store.read("corpus_docs").collect()}
    # c extracts to markdown byte-identical to a (same page template) ->
    # cross-batch exact dup dropped; d is a 404; e unique
    assert set(got) == {"https://h/a", "https://h/b", "https://h/e"}
    assert got["https://h/a"].startswith("# Doc 0")
    assert "dup body with five tokens" in got["https://h/a"]
