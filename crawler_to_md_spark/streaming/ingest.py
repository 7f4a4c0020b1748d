"""Streaming corpus ingestion with cross-batch exact + near-dup dedup.

The streaming frontier (streaming/frontier.py) covers the SCHEDULING half
of a continuous crawl; this module is the other half: fetched documents
arriving continuously (a fetch fleet writing batches to object storage)
are ingested into a deduplicated corpus table with exactly-once semantics.

Shape, Spark-first:

  * ``readStream`` over document files -> ``foreachBatch``; each
    micro-batch runs the BATCH cleaning operators (token-count quality
    gate from operators/textstats.py, md5 content digest from
    operators/dedup.py's exact-dedup key) and lands one atomic snapshot
    commit — the same transactional-sink pattern as StreamingScheduler.
  * cross-batch dedup is an anti-join against the COMMITTED corpus's
    digest column, not Spark streaming state: the corpus table itself is
    the dedup state, so state size never lives in the streaming engine,
    survives restarts for free, and the batch engine can query it
    mid-stream.  (``dropDuplicates`` on a stream would pin every digest
    ever seen in executor state; at 10^10 documents the committed table +
    anti-join — prefilterable by the same bloom/cuckoo shard stores the
    frontier uses — is the design that scales.)
  * in-batch dedup keeps the deterministic min-url copy per digest
    (groupBy digest -> min(struct(url, ...)) — same keeper rule as
    operators/dedup.exact_dup_groups).
  * exactly-once: ``foreachBatch`` replays epochs after failure; the
    commit is idempotent via ``lineage["ingest_epoch"]`` (epoch <= last
    applied -> skip), identical to the frontier's epoch-replay guard.
  * commits are incremental: rows bucket by ``pmod(xxhash64(digest), B)``
    and only dirty buckets rewrite (BucketedUpdate), so a small batch
    against a 10^10-row corpus writes O(batch) not O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from crawler_to_md_spark.operators.textstats import token_count
from crawler_to_md_spark.store.warehouse import BucketedUpdate, SnapshotStore

# what the fetch fleet emits per document
DOC_STREAM_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
    ]
)

CORPUS_DOCS_SCHEMA = StructType(
    [
        StructField("digest", StringType(), False),
        StructField("doc_hash", LongType(), False),   # xxhash64(digest)
        StructField("url", StringType(), False),
        StructField("text", StringType()),
        StructField("n_tokens", LongType()),
        StructField("epoch", LongType(), False),      # first-ingest epoch
        # MinHash signature of the text (operators/dedup.minhash_signature),
        # carried on every committed row when near-dedup is on so the
        # cross-batch LSH band join never re-shingles the corpus; NULL when
        # the ingest runs exact-only
        StructField("minhash", ArrayType(LongType())),
    ]
)


def read_document_stream(
    spark: SparkSession, input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of fetched documents (deterministic replay —
    files are the offsets; the sandbox stand-in for a Kafka topic)."""
    reader = spark.readStream.schema(DOC_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(input_dir)


class StreamingCorpusIngest:
    """``foreachBatch`` sink: micro-batches of fetched documents ->
    quality gate -> in-batch dedup -> anti-join vs the committed corpus ->
    one atomic, idempotent, incremental snapshot commit per epoch."""

    def __init__(self, store: SnapshotStore, min_tokens: int = 0,
                 store_buckets: int = 64,
                 near_threshold: float | None = None):
        """``near_threshold`` turns on cross-batch NEAR-dup dedup on top of
        the exact path: committed rows carry a MinHash signature column;
        an incoming doc is dropped when a committed doc shares an LSH band
        AND verifies at exact shingle-Jaccard >= ``near_threshold``
        (first-arrival wins, like the exact path).  Within a batch the
        same rule applies with the smaller ``url`` winning
        (neighbor-domination: drop a doc iff a verified near-neighbor with
        a smaller url exists in the batch).

        Semantics note (the online/offline trade, stated honestly): for
        near-dup CLUSTERS that are cliques through the threshold — mirror
        families, boilerplate variants, the dominant real-world shape —
        this greedy rule keeps exactly the batch pipeline's one keeper per
        cluster (operators/dedup.clean_pipeline's connected-components
        collapse).  For CHAIN clusters (A~B, B~C, A!~C) the greedy stream
        keeps local minima — one per maximal dominated region — where the
        batch closure keeps one per chain; an online dedup cannot know C
        duplicates A through a B it already dropped without keeping
        dropped signatures as state.  Run the batch collapse over the
        committed corpus when closure semantics are required."""
        self.store = store
        self.min_tokens = min_tokens
        self.store_buckets = store_buckets
        self.near_threshold = near_threshold

    # -- one epoch ---------------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        lineage = dict(self.store.lineage) if self.store.exists() else {}
        last = lineage.get("ingest_epoch")
        if last is not None and int(epoch_id) <= int(last):
            return  # epoch replay after failure: already committed, skip

        spark = batch.sparkSession
        if not self.store.exists():
            self.store.commit(
                {"corpus_docs": BucketedUpdate(
                    spark.createDataFrame([], CORPUS_DOCS_SCHEMA),
                    list(range(self.store_buckets)), self.store_buckets,
                    key_col="doc_hash")},
                batch_id=0,
                lineage={"counters": {}},
            )
            lineage = dict(self.store.lineage)

        from crawler_to_md_spark.operators import dedup

        gated = batch.withColumn(
            "n_tokens", token_count(F.col("text"))
        ).filter(F.col("n_tokens") >= self.min_tokens)
        # in-batch dedup: deterministic min-url keeper per digest (the
        # exact_dup_groups keeper rule, applied before rows become state)
        sig = (
            dedup.minhash_signature(F.col("k.text"))
            if self.near_threshold is not None
            else F.lit(None).cast("array<bigint>")
        )
        keeper = gated.groupBy(F.md5("text").alias("digest")).agg(
            F.min(F.struct("url", "text", "n_tokens")).alias("k")
        ).select(
            "digest",
            F.xxhash64("digest").alias("doc_hash"),
            F.col("k.url").alias("url"),
            F.col("k.text").alias("text"),
            F.col("k.n_tokens").alias("n_tokens"),
            F.lit(int(epoch_id)).cast("long").alias("epoch"),
            sig.alias("minhash"),
        )
        # cross-batch dedup: the committed corpus IS the state
        committed = self.store.read("corpus_docs")
        new = keeper.join(committed.select("digest"), "digest", "left_anti")
        pre_near = None
        if self.near_threshold is not None:
            # the near path references this frame from ~6 plan branches
            # (bands, both text joins, the anti-join chain) — persist so
            # the MinHash signatures and the exact anti-join compute once
            pre_near = new.persist()
            new = self._drop_near_dups(pre_near, committed)

        B = self.store_buckets
        entry = self.store.bucket_entry("corpus_docs")
        if entry is not None:
            B = int(entry["n_buckets"])
        new = new.persist()
        ins = new.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(F.col("doc_hash"), F.lit(B)).cast("int")
            ).alias("dirty"),
        ).collect()[0]
        dirty = sorted(set(ins["dirty"] or []))

        counters = dict(lineage.get("counters", {}))
        counters["docs_ingested"] = (
            counters.get("docs_ingested", 0) + int(ins["n"]))
        lineage["counters"] = counters
        lineage["ingest_epoch"] = int(epoch_id)
        if dirty:
            docs_new = self.store.read_buckets("corpus_docs", dirty).unionByName(new)
            updates = {"corpus_docs": BucketedUpdate(
                docs_new, dirty, B, key_col="doc_hash")}
        else:
            updates = {}
        self.store.commit(
            updates, batch_id=self.store.batch_id + 1, lineage=lineage)
        new.unpersist()
        if pre_near is not None:
            pre_near.unpersist()

    # -- near-dup path -------------------------------------------------

    def _drop_near_dups(self, new: DataFrame,
                        committed: DataFrame) -> DataFrame:
        """Drop incoming docs that near-duplicate the committed corpus
        (first-arrival wins) or a smaller-url batch sibling
        (neighbor-domination; see __init__).

        Plan shape at 10^10 committed docs: the committed side moves ONLY
        (doc_hash, 8 band-hash rows) derived from the stored ``minhash``
        column — never text, never re-shingled — through the band join;
        incoming bands are a micro-batch-sized build side.  Candidate
        pairs (ids only) then pull both texts for the exact
        shingle-Jaccard verify, so text moves for the tiny candidate set
        only — the same ids-first discipline as
        operators/dedup.minhash_near_dups.  Like the exact path's digest
        anti-join, the per-epoch cost is one scan of the committed table
        (prefilterable by the same bloom/cuckoo shard stores the frontier
        uses)."""
        from crawler_to_md_spark.operators import dedup

        t = float(self.near_threshold)
        inb = new.select(
            "doc_hash", "url",
            F.explode(dedup.band_structs(F.col("minhash"))).alias("bb"),
        ).select("doc_hash", "url", "bb.band", "bb.bh")

        # 1. committed wins: any verified committed band-neighbor drops
        #    the incoming doc
        cb = committed.filter(F.col("minhash").isNotNull()).select(
            F.col("doc_hash").alias("doc_c"),
            F.explode(dedup.band_structs(F.col("minhash"))).alias("bb"),
        ).select("doc_c", "bb.band", "bb.bh")
        cand_c = (
            inb.select("band", "bh", "doc_hash")
            .join(cb, ["band", "bh"])
            .select("doc_hash", "doc_c")
            .distinct()
        )
        verified_c = (
            cand_c.join(new.select("doc_hash", "text"), "doc_hash")
            .join(
                committed.select(F.col("doc_hash").alias("doc_c"),
                                 F.col("text").alias("text_c")),
                "doc_c",
            )
            .filter(dedup.shingle_jaccard(F.col("text"), F.col("text_c")) >= t)
            .select("doc_hash")
            .distinct()
        )
        new = new.join(verified_c, "doc_hash", "left_anti")

        # 2. in-batch neighbor domination among the survivors: drop a doc
        #    iff a verified near-neighbor with a smaller url is in the
        #    batch (on clique clusters this keeps exactly the min-url
        #    member — the batch collapse's keeper)
        inb2 = inb.join(new.select("doc_hash"), "doc_hash")
        a = inb2.select("band", "bh", F.col("doc_hash").alias("doc_a"),
                        F.col("url").alias("url_a"))
        b = inb2.select("band", "bh", F.col("doc_hash").alias("doc_b"),
                        F.col("url").alias("url_b"))
        cand_ab = (
            a.join(b, ["band", "bh"])
            .filter(F.col("url_b") < F.col("url_a"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        dominated = (
            cand_ab.join(new.select(F.col("doc_hash").alias("doc_a"),
                                    F.col("text").alias("text_a")), "doc_a")
            .join(new.select(F.col("doc_hash").alias("doc_b"),
                             F.col("text").alias("text_b")), "doc_b")
            .filter(
                dedup.shingle_jaccard(F.col("text_a"), F.col("text_b")) >= t)
            .select(F.col("doc_a").alias("doc_hash"))
            .distinct()
        )
        return new.join(dominated, "doc_hash", "left_anti")

    # -- query lifecycle ---------------------------------------------------

    def start(self, documents: DataFrame, checkpoint_dir: str,
              available_now: bool = True,
              processing_time: str | None = None):
        """Start the stream; ``available_now=True`` drains present files
        and stops (test/bench mode), a live deployment uses
        ``processing_time`` triggers."""
        writer = (
            documents.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()
