"""Streaming corpus ingestion with cross-batch exact dedup.

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
                 store_buckets: int = 64):
        self.store = store
        self.min_tokens = min_tokens
        self.store_buckets = store_buckets

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

        gated = batch.withColumn(
            "n_tokens", token_count(F.col("text"))
        ).filter(F.col("n_tokens") >= self.min_tokens)
        # in-batch dedup: deterministic min-url keeper per digest (the
        # exact_dup_groups keeper rule, applied before rows become state)
        keeper = gated.groupBy(F.md5("text").alias("digest")).agg(
            F.min(F.struct("url", "text", "n_tokens")).alias("k")
        ).select(
            "digest",
            F.xxhash64("digest").alias("doc_hash"),
            F.col("k.url").alias("url"),
            F.col("k.text").alias("text"),
            F.col("k.n_tokens").alias("n_tokens"),
            F.lit(int(epoch_id)).cast("long").alias("epoch"),
        )
        # cross-batch dedup: the committed corpus IS the state
        committed = self.store.read("corpus_docs")
        new = keeper.join(committed.select("digest"), "digest", "left_anti")

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
