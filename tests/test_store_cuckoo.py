"""Cuckoo URL-seen filter: shard semantics, file-backed store, engine swap.

The invariant under test everywhere: NO FALSE NEGATIVES — the schedule
operator's bloom/cuckoo-negative branch skips the exact anti-join, so a
missed membership would duplicate frontier rows (operators/schedule.py).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.functions.cuckoo import (
    CuckooShard,
    CuckooShardStore,
)


def _hashes(n: int, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


class TestCuckooShard:
    def test_no_false_negatives_and_low_fp_rate(self):
        sh = CuckooShard.empty(1 << 12)          # 16k slots
        ins = _hashes(10_000, seed=1)
        sh.add(ins)
        assert sh.contains(ins).all()            # every insert found
        other = _hashes(10_000, seed=2)
        fp_rate = sh.contains(other).mean()
        # 4x16-bit slots -> theoretical ~ 8/2^16 = 0.00012
        assert fp_rate < 0.01

    def test_delete_removes_membership(self):
        sh = CuckooShard.empty(1 << 10)
        ins = _hashes(1_000)
        sh.add(ins)
        removed = sh.remove(ins[:500])
        assert removed == 500
        assert not sh.contains(ins[:500]).any() or (
            # a deleted key may still read present if ANOTHER key shares
            # its (bucket-pair, fp) — bound the residue to the collision
            # probability instead of demanding zero
            sh.contains(ins[:500]).mean() < 0.01)
        assert sh.contains(ins[500:]).all()      # the rest untouched

    def test_overflow_goes_to_stash_without_false_negatives(self):
        sh = CuckooShard.empty(4, stash_cap=64)  # 16 slots, tiny
        ins = _hashes(40)                        # 2.5x capacity
        sh.add(ins)
        assert len(sh.stash) > 0                 # overflow happened
        assert sh.contains(ins).all()            # ...but nothing is lost

    def test_stash_cap_overflow_raises(self):
        sh = CuckooShard.empty(4, stash_cap=4)
        with pytest.raises(RuntimeError, match="saturated"):
            sh.add(_hashes(200))

    def test_save_load_roundtrip(self, tmp_path):
        sh = CuckooShard.empty(1 << 8)
        ins = _hashes(500)
        sh.add(ins)
        p = str(tmp_path / "shard.npz")
        sh.save(p)
        back = CuckooShard.load(p)
        assert back.contains(ins).all()
        assert (back.table == sh.table).all()

    def test_power_of_two_required(self):
        with pytest.raises(AssertionError):
            CuckooShard.empty(100)


class TestCuckooShardStore:
    def test_add_lookup_remove_distributed(self, spark, tmp_path):
        store = CuckooShardStore.create(str(tmp_path / "ck"), num_shards=8,
                                        n_buckets=1 << 10)
        df = spark.range(0, 5000).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
        store.add_dataframe(df)
        assert store.version == 1

        probe = df.withColumn(
            "seen", store.might_contain_udf(spark)(F.col("url_hash")))
        assert probe.filter(~F.col("seen")).count() == 0   # no false negatives

        unseen = spark.range(100000, 105000).select(
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
        fp = unseen.withColumn(
            "seen", store.might_contain_udf(spark)(F.col("url_hash"))
        ).filter(F.col("seen")).count()
        assert fp < 250                                    # < 5% false positives

        # deletion: remove half, membership drops for them only
        store.remove_dataframe(df.limit(2500))
        reopened = CuckooShardStore.open(str(tmp_path / "ck"), store.version)
        still = df.withColumn(
            "seen", reopened.might_contain_udf(spark)(F.col("url_hash")))
        n_seen = still.filter(F.col("seen")).count()
        assert 2400 <= n_seen <= 2600   # ~2500 remain (fp-collision slack)

    def test_versioned_files_and_gc(self, spark, tmp_path):
        import glob
        import os

        d = str(tmp_path / "ck")
        store = CuckooShardStore.create(d, num_shards=4, n_buckets=1 << 8)
        for i in range(5):
            df = spark.range(i * 100, (i + 1) * 100).select(
                F.xxhash64(F.col("id").cast("string")).alias("url_hash"))
            store.add_dataframe(df)
        metas = sorted(glob.glob(os.path.join(d, "meta-v*.json")))
        assert len(metas) == 3              # retain=3 manifests
        # live shard files only reference retained versions
        for fp in glob.glob(os.path.join(d, "shard-*.npz")):
            v = int(os.path.basename(fp).split("-v")[1].split(".")[0])
            assert v >= store.version - 2


class TestEngineCuckoo:
    def test_crawl_with_cuckoo_seen_filter(self, spark, tmp_path):
        """Full sf0.001 crawl with seen_filter='cuckoo' reaches the same
        frontier as the bloom default (the filter is a pre-filter; the seen
        SET must be identical)."""
        from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
        from crawler_to_md_spark.sources import corpus

        eng = CrawlEngine(
            spark, str(tmp_path / "wh"),
            corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001",
                                       replicas=1),
            config=CrawlConfig(scope_domain="example.com", max_retries=2,
                               seen_filter="cuckoo", bloom_shards=8,
                               cuckoo_buckets=1 << 10),
        )
        eng.seed([corpus.seed_url()])
        eng.run_to_completion()
        # reference end-state (same numbers the verify drive records for
        # the bloom path at sf0.001/replicas=1)
        assert eng.total_link_count() == 494
        assert eng.docs().filter("status='ok'").count() == 441
        # frontier URLs are unique (no duplicate inserts despite the
        # pre-filter swap)
        assert eng.links().select("url").distinct().count() == 494


class TestReopenPurge:
    @pytest.fixture()
    def eng(self, spark, tmp_path):
        from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
        from crawler_to_md_spark.sources import corpus

        eng = CrawlEngine(
            spark, str(tmp_path / "wh"),
            corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001",
                                       replicas=1),
            config=CrawlConfig(scope_domain="example.com", max_retries=2,
                               seen_filter="cuckoo", bloom_shards=8,
                               cuckoo_buckets=1 << 10),
        )
        eng.seed([corpus.seed_url()])
        eng.run_to_completion()
        return eng

    def test_reopen_refetches(self, spark, eng):
        url = "https://h0.example.com/docs/p0"
        docs_before = eng.docs().count()
        n = eng.reopen([url])
        assert n == 1
        row = eng.links().filter(F.col("url") == url).collect()[0]
        assert not row["visited"] and row["retry_count"] == 0
        runs = eng.run(resume=True)
        assert runs["dequeued"] >= 1
        # refetched: visited again, doc upserted last-write-wins (no dupes)
        assert eng.links().filter(F.col("url") == url).collect()[0]["visited"]
        assert eng.docs().filter(F.col("url") == url).count() == 1
        assert eng.docs().count() == docs_before

    def test_purge_removes_and_cuckoo_forgets(self, spark, eng):
        from crawler_to_md_spark.functions import urlkit

        victims = [r["url"] for r in
                   eng.docs().filter("status='ok'").orderBy("url")
                   .limit(5).collect()]
        links_before = eng.total_link_count()
        n = eng.purge(victims)
        assert n == 5
        assert eng.total_link_count() == links_before - 5
        assert eng.docs().filter(F.col("url").isin(victims)).count() == 0
        # the cuckoo filter genuinely forgot the purged hashes
        bloom = eng._load_bloom()
        probe = (spark.createDataFrame([(u,) for u in victims], "url string")
                 .select(urlkit.url_hash(F.col("url")).alias("url_hash"))
                 .withColumn("seen",
                             bloom.might_contain_udf(spark)("url_hash")))
        assert probe.filter(F.col("seen")).count() == 0

    def test_purged_url_rediscovered_via_parent_reopen(self, spark, eng):
        """End-to-end deletion story: purge a page, reopen its parent, and
        the next run re-discovers AND re-crawls the purged URL through the
        sure-new fast path (the cuckoo filter no longer claims it)."""
        parent = "https://h0.example.com/docs/p0"
        child = "https://h0.example.com/docs/p1"   # BFS child of p0
        assert eng.purge([child]) == 1
        assert eng.links().filter(F.col("url") == child).count() == 0
        eng.reopen([parent])
        eng.run(resume=True)
        back = eng.links().filter(F.col("url") == child).collect()
        assert len(back) == 1 and back[0]["visited"]
        assert eng.docs().filter(F.col("url") == child).count() == 1

    def test_recrawl_due_ttl_selection(self, spark, eng):
        """recrawl_due(ttl) = ok docs whose fetch commit is >= ttl commits
        old; reopen_due + run refreshes exactly those (batch ids bump,
        seen set unchanged)."""
        current = eng.store.batch_id
        # pages fetched in the first waves are the stalest
        oldest = eng.docs().filter("status = 'ok'") \
            .agg(F.min("batch_id")).collect()[0][0]
        ttl = current - oldest  # due set = exactly the first-wave pages
        due = eng.recrawl_due(ttl)
        want = {r["url"] for r in eng.docs().filter(
            (F.col("status") == "ok") & (F.col("batch_id") <= oldest))
            .select("url").collect()}
        assert {r["url"] for r in due.collect()} == want
        links_before = eng.total_link_count()
        n = eng.reopen_due(ttl)
        assert n == len(want)
        eng.run(resume=True)
        refreshed = eng.docs().filter(F.col("url").isin(list(want))).collect()
        assert all(r["batch_id"] > current for r in refreshed)
        assert eng.total_link_count() == links_before  # seen set unchanged
        # nothing is due anymore at the same TTL measured from the new head
        assert eng.recrawl_due(eng.store.batch_id - oldest).count() == 0
