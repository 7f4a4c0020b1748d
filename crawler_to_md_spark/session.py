"""SparkSession factory tuned for the crawl-frontier workload.

Local-mode settings mirror what a 1000-executor cluster deployment would set
per-executor: AQE on (runtime skew-join + partition coalescing), Arrow for
every pandas UDF boundary, shuffle partitions sized to the parallelism level
rather than the 200 default.

The two URL-pipeline-specific optimizer knobs (per-operator codegen and the
PushDownPredicates exclusion) are NOT session-global: they are applied around
the scheduling/crawl stages via :func:`url_pipeline_confs`, so short-
expression operators (textstats, dedup, similarity) keep whole-stage codegen.
"""

from __future__ import annotations

import contextlib
import os

from pyspark.sql import SparkSession

# Knobs that only help the URL scheduling pipeline's very long staged
# expression chains (see url_pipeline_confs for the full rationale).
URL_PIPELINE_CONFS = {
    # Per-operator codegen instead of whole-stage fusion: fused stages pass
    # DEFERRED expression code between operators, so every reuse of a
    # computed column re-emits its code — the URL pipeline's staged
    # projections DAG-unfold into one 175k-line method, Janino rejects it
    # (64 KB limit) and Spark silently falls back to fully INTERPRETED row
    # processing.  Per-operator codegen materializes rows at operator
    # boundaries, generates each expression exactly once, and measured 2x
    # faster on the scheduling stage with 0.81 strong-scaling efficiency
    # from 2 to 8 cores (fused/interpreted: flat).
    "spark.sql.codegen.wholeStage": "false",
    # The engine hand-places every filter adjacent to the scan or projection
    # it belongs to, so the filter-MOVING rule only hurts: it rewrites
    # filters through the staged URL projections by substitution,
    # DAG-unfolding the resolve+canonicalize chain into a single >100k-node
    # predicate (29 MB of generated Java, Janino's 64 KB method limit,
    # whole-stage codegen bailout, interpreted hot path).  Parquet scan
    # pushdown is unaffected — that is V2ScanRelationPushDown/FileSource
    # pruning, separate rules.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates",
}


@contextlib.contextmanager
def url_pipeline_confs(spark: SparkSession):
    """Apply the URL-pipeline optimizer knobs for the duration of a stage.

    Both confs are runtime-settable SQLConfs, read at physical-planning /
    execution time of each action — so wrapping the stage that RUNS the
    plans is sufficient even when the DataFrames were built outside.
    Restores (or unsets) the previous values on exit, so operators outside
    the crawl path — textstats, dedup, similarity — regain whole-stage
    codegen that round 2 denied them session-globally.
    """
    prev: dict[str, str | None] = {}
    for k, v in URL_PIPELINE_CONFS.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, old in prev.items():
            if old is None:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass
            else:
                spark.conf.set(k, old)


def get_spark(
    app_name: str = "crawler_to_md_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with crawl-engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback ``*``).
    ``shuffle_partitions`` defaults to the core count so tiny local runs do
    not fan out into hundreds of empty tasks.

    Under spark-submit, deployment-provided configuration WINS: the gateway
    JVM already owns the master and static confs, and any ``--conf`` passed
    on the submit command line is respected — the tuning defaults below are
    applied only for keys the deployment did not set (and
    ``shuffle_partitions`` only when the caller passed it explicitly).
    """
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if submitted:
        return _get_spark_submitted(app_name, shuffle_partitions, extra_conf)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
    parts = inner.split(",")
    try:
        if len(parts) >= 2:        # local-cluster[workers, coresPerWorker, mem]
            total_cores = int(parts[0]) * int(parts[1])
        elif inner == "*":
            total_cores = os.cpu_count() or 8
        else:
            total_cores = int(parts[0])
    except ValueError:
        total_cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(4, total_cores)

    # Throughput GC: ParallelGC measured ~14% faster than the G1 default on
    # the string-churn scheduling stage (385k vs 339k URLs/s at 8 cores).
    # GC worker threads are left at the JVM default (sized by machine
    # cores) — identical at every parallelism level, exactly as executor
    # JVMs on a real cluster node size their GC.  Pinning GC threads to the
    # task-core count was measured and rejected: it cost 25% at 8 cores
    # (288k vs 385k) while small-heap runs got slightly faster, i.e. it
    # distorts rather than levels strong-scaling comparisons.
    gc_opts = "-XX:+UseParallelGC"
    # Fixed driver heap (-Xms = -Xmx): heap-growth pauses during the first
    # minutes of a run add one-sided wall-clock noise that distorts
    # strong-scaling comparisons; committing the full heap up front removes
    # them (the sandbox has 128 GiB, and a production deployment sets
    # Xms=Xmx for the same reason).  Executor JVMs (local-cluster mode) size
    # their own heap via spark.executor.memory and keep the plain GC opts.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    driver_opts = f"{gc_opts} -Xms{driver_mem}"

    # shuffle/spill to tmpfs when available: the sandbox VM's block device
    # saturates under shuffle writes and serializes scaling runs (a real
    # cluster points this at per-node NVMe instead)
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the wave loop relies on eager localCheckpoint; checkpoint blocks
        # are reclaimed by the ContextCleaner only after a JVM GC notices
        # the dropped references — the default 30 min periodic GC lets
        # blocks from many waves pile up in executor storage on long
        # crawls.  5 min bounds the accumulation (see operators/crawl.py
        # for the executor-loss trade-off note).
        .config("spark.cleaner.periodicGC.interval", "5min")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", driver_opts)
        .config("spark.executor.extraJavaOptions", gc_opts)
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


# Dynamic (runtime-settable) tuning defaults applied under spark-submit only
# when the deployment did not provide them.
_DYNAMIC_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
}


def _get_spark_submitted(
    app_name: str,
    shuffle_partitions: int | None,
    extra_conf: dict[str, str] | None,
) -> SparkSession:
    """spark-submit path: the cluster manager owns master, memory, JVM
    options and anything passed via ``--conf``.  Only fill in dynamic SQL
    confs the deployment left unset; ``spark.sql.shuffle.partitions`` is
    touched only when the caller asked for a specific value."""
    builder = SparkSession.builder.appName(app_name)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    deployed = spark.sparkContext.getConf()
    for k, v in _DYNAMIC_DEFAULTS.items():
        if not deployed.contains(k):
            spark.conf.set(k, v)
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
