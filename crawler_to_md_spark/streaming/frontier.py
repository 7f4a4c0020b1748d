"""Structured Streaming frontier: the scheduling megawave as a stream.

The batch engine (operators/crawl.py) drives its own wave loop; a
production crawl at 10^10 URLs instead has candidates arriving
*continuously* — link-extract output landing in object storage, a fetch
fleet emitting request logs.  This module re-expresses the north rule's
"priority queue realized as window-ranked micro-batches feeding the fetch
stage" in Structured Streaming terms:

  * :class:`StreamingScheduler` — ``readStream`` over candidate files ->
    ``foreachBatch``: each micro-batch runs the SAME declarative schedule
    chain as a batch wave (resolve -> canonicalize -> validate -> dedup ->
    bloom prefilter -> anti-join vs the committed seen set) and lands one
    atomic snapshot commit, so the frontier store is the exactly-once sink.
    ``foreachBatch`` is the canonical Spark pattern for reusing batch
    operators against a transactional sink: Spark guarantees epoch replay
    after failure, and the scheduler makes the commit idempotent by
    recording the last applied epoch in snapshot lineage and skipping
    replays (epoch <= last) — together that is exactly-once.
  * :func:`host_request_windows` — the reference's requests/min window
    (scraper.py:428-468) in declarative event-time form: watermarked
    sliding-window counts per host.  Late fetch-log rows beyond the
    watermark are dropped instead of reopening closed windows — the
    standard late-data contract.
  * :func:`stateful_host_admission` — per-host token-bucket admission as a
    custom stateful operator (``applyInPandasWithState``): state is ONE
    tiny (window_start, sent) pair per host — O(hosts), never O(URLs) —
    and rows over budget are flagged ``admitted = false`` for re-enqueue
    rather than buffered in state, so state size is bounded at any scale.

Scale notes: every per-batch plan is the batch megawave's plan — the same
bloom-prefiltered anti-join, the same uniform url/url_hash shuffle keys —
so the streaming path inherits the batch path's scaling evidence (BENCH.md).
The stateful admission operator shuffles once on ``host`` (Zipf-skewed, but
each group does O(rows-in-batch-for-host) work and carries O(1) state, so a
hot host costs one task's worth of the batch's rows, same bound as the
salted politeness window's phase 2).
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawler_to_md_spark.functions import urlkit
from crawler_to_md_spark.operators import schedule
from crawler_to_md_spark.operators.seq import with_ordered_seq
from crawler_to_md_spark.store.schemas import LINKS_SCHEMA
from crawler_to_md_spark.store.warehouse import BucketedUpdate, SnapshotStore

# What the link-extract stage emits (operators/crawl.py:_discover raw shape).
CANDIDATE_SCHEMA = StructType(
    [
        StructField("page_url", StringType()),
        StructField("href", StringType()),
        StructField("parent_depth", IntegerType()),
    ]
)

# A fetch-log stream row (for the event-time politeness operators).
FETCH_LOG_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("event_time", TimestampType()),
    ]
)


def read_candidate_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of candidate hrefs.  The file source gives
    deterministic replay (files are the offsets) — the sandbox stand-in for
    a Kafka topic of link-extract output."""
    reader = spark.readStream.schema(CANDIDATE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    return reader.parquet(input_dir)


class StreamingScheduler:
    """``foreachBatch`` sink that turns candidate micro-batches into atomic
    frontier snapshot commits.

    Each epoch:  schedule chain vs the CURRENT committed seen set ->
    ordered seq -> dirty-bucket commit (same incremental layout as the
    batch engine's waves).  Idempotent under epoch replay via
    ``lineage["stream_epoch"]``.
    """

    def __init__(
        self,
        store: SnapshotStore,
        scope_base_url: str | None = None,
        scope_domain: str | None = None,
        include_patterns: list[str] | None = None,
        exclude_patterns: list[str] | None = None,
        robots: DataFrame | None = None,
        store_buckets: int = 64,
        host_budget: int | None = None,
        salt_shards: int = 8,
    ):
        self.store = store
        self.scope_base_url = scope_base_url
        self.scope_domain = scope_domain
        self.include_patterns = include_patterns or []
        self.exclude_patterns = exclude_patterns or []
        self.robots = robots
        self.store_buckets = store_buckets
        self.host_budget = host_budget
        self.salt_shards = salt_shards

    # -- one epoch ---------------------------------------------------------

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        lineage = dict(self.store.lineage) if self.store.exists() else {}
        last = lineage.get("stream_epoch")
        if last is not None and int(epoch_id) <= int(last):
            return  # epoch replay after failure: already committed, skip

        spark = batch.sparkSession
        from crawler_to_md_spark.session import url_pipeline_confs

        with url_pipeline_confs(spark):
            self._process_batch_inner(batch, epoch_id, lineage, spark)

    def _process_batch_inner(self, batch: DataFrame, epoch_id: int,
                             lineage: dict, spark) -> None:
        if not self.store.exists():
            # snapshot 0: empty frontier (stream may start before any seed)
            self.store.commit(
                {"links": BucketedUpdate(
                    spark.createDataFrame([], LINKS_SCHEMA),
                    list(range(self.store_buckets)), self.store_buckets)},
                batch_id=0,
                lineage={"counters": {}},
            )
            lineage = dict(self.store.lineage)

        seen = self.store.read("links")
        counters = dict(lineage.get("counters", {}))
        seen_count = int(counters.get("seeds", 0)) + int(
            counters.get("links_inserted", 0))
        cand, unseen = schedule.schedule_candidates(
            batch,
            seen,
            bloom=None,
            scope_base_url=self.scope_base_url,
            scope_domain=self.scope_domain,
            include_patterns=self.include_patterns,
            exclude_patterns=self.exclude_patterns,
            robots=self.robots,
            seen_count=seen_count,
        )
        if self.host_budget is not None:
            from crawler_to_md_spark.operators.politeness import politeness_cap

            unseen = politeness_cap(
                unseen.withColumn("priority", F.col("depth")),
                self.host_budget, self.salt_shards,
            ).drop("priority")

        batch_id = self.store.batch_id + 1
        new_links = with_ordered_seq(
            unseen.select(
                "url", "url_hash", "host",
                F.lit(False).alias("visited"),
                F.lit(0).alias("retry_count"),
                "depth",
                F.lit(int(epoch_id)).cast("long").alias("batch_id"),
            ),
            ["url"],
        ).select(*LINKS_SCHEMA.fieldNames()).persist()

        B = self.store_buckets
        entry = self.store.bucket_entry("links")
        if entry is not None:
            B = int(entry["n_buckets"])
        ins = new_links.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(
                F.pmod(F.col("url_hash"), F.lit(B)).cast("int")
            ).alias("dirty"),
        ).collect()[0]
        dirty = sorted(set(ins["dirty"] or []))

        links_new = self.store.read_buckets("links", dirty).unionByName(new_links)
        counters["links_inserted"] = counters.get("links_inserted", 0) + int(ins["n"])
        lineage["counters"] = counters
        lineage["stream_epoch"] = int(epoch_id)
        self.store.commit(
            {"links": BucketedUpdate(links_new, dirty, B)},
            batch_id=batch_id,
            lineage=lineage,
        )
        new_links.unpersist()

    # -- query lifecycle ---------------------------------------------------

    def start(
        self,
        candidates: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
        processing_time: str | None = None,
    ):
        """Start the stream.  ``available_now=True`` drains the files
        currently present and stops — the test/benchmark mode; a live
        deployment uses ``processing_time`` triggers."""
        writer = (
            candidates.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("update")
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


def host_request_windows(
    fetch_log: DataFrame,
    window_duration: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Reference requests/min accounting (scraper.py:455-468) as an
    event-time windowed aggregation: requests per host per window, with a
    watermark bounding both state and how late a fetch-log row may arrive.
    Works identically on a batch frame (no watermark applied)."""
    df = fetch_log
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    win = (
        F.window("event_time", window_duration, slide)
        if slide
        else F.window("event_time", window_duration)
    )
    return df.groupBy(win.alias("window"), "host").agg(
        F.count(F.lit(1)).alias("requests")
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "host",
        "requests",
    )


# -- stateful per-host admission (applyInPandasWithState) -------------------

ADMISSION_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("event_time", TimestampType()),
        StructField("admitted", BooleanType()),
    ]
)
# state: one row per host — (window_start_epoch_sec, sent_in_window)
ADMISSION_STATE = StructType(
    [StructField("window_start", LongType()), StructField("sent", LongType())]
)


def _admission_fn(rate_limit: int, window_seconds: int):
    """Build the per-group state-update function.  Deliberately tiny state:
    a (window_start, sent) pair per host.  Over-budget rows are EMITTED with
    ``admitted = false`` (the caller re-enqueues them) instead of being
    buffered in state — buffering URLs in state would make state O(frontier)
    and is exactly the unbounded-state trap this operator exists to avoid."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            window_start, sent = state.get
        else:
            window_start, sent = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("event_time")
            admitted = []
            for ts in pdf["event_time"]:
                sec = int(ts.timestamp())
                if window_start is None or sec - window_start >= window_seconds:
                    window_start, sent = sec, 0
                if sent < rate_limit:
                    sent += 1
                    admitted.append(True)
                else:
                    admitted.append(False)
            out = pdf.copy()
            out["admitted"] = admitted
            yield out
        state.update((window_start if window_start is not None else 0, sent))

    return fn


def stateful_host_admission(
    fetch_requests: DataFrame,
    rate_limit: int,
    window_seconds: int = 60,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host token-bucket admission across micro-batches.

    Input: ``(host, url, event_time)`` rows (streaming).  Output: the same
    rows plus ``admitted`` — at most ``rate_limit`` admissions per host per
    ``window_seconds`` tumbling window, with the window position carried in
    GroupState so the budget holds ACROSS micro-batch boundaries (the purely
    declarative :func:`host_request_windows` can count but not gate).
    """
    df = fetch_requests
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    return df.groupBy("host").applyInPandasWithState(
        _admission_fn(rate_limit, window_seconds),
        outputStructType=ADMISSION_OUTPUT,
        stateStructType=ADMISSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- deterministic stream feed for tests / correctness gate ------------------


def write_candidate_arrivals(
    spark: SparkSession,
    candidates: DataFrame,
    out_dir: str,
    group_col: str = "grp",
) -> list[str]:
    """Materialize a candidate frame as one parquet file per arrival group,
    with file mtimes in group order so the file source replays arrivals
    deterministically (maxFilesPerTrigger=1 -> one micro-batch per group)."""
    groups = sorted(
        r[0] for r in candidates.select(group_col).distinct().collect()
    )
    paths = []
    for i, g in enumerate(groups):
        part = candidates.filter(F.col(group_col) == g).drop(group_col)
        tmp = os.path.join(out_dir, f"__stage_{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dst = os.path.join(out_dir, f"arrival-{i:04d}.parquet")
        os.replace(os.path.join(tmp, src), dst)
        shutil.rmtree(tmp, ignore_errors=True)
        base = 1_700_000_000 + i * 10
        os.utime(dst, (base, base))
        paths.append(dst)
    return paths
