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
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """Atomic multi-table snapshot commits over parquet directories."""

    def __init__(self, spark: SparkSession, warehouse_dir: str, retain: int = 2):
        self.spark = spark
        self.dir = warehouse_dir
        self.retain = max(1, retain)
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

    def read(self, table: str) -> DataFrame:
        """Read a table from the current snapshot (fresh scan — per-wave
        plans never accumulate lineage across waves)."""
        rel = self.manifest["tables"][table]
        return self.spark.read.parquet(os.path.join(self.dir, rel))

    # -- commits ----------------------------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        batch_id: int,
        lineage: dict[str, Any] | None = None,
    ) -> None:
        """Write ``tables`` as snapshot ``batch_id`` and atomically advance
        the manifest.  Tables not in ``tables`` carry their previous snapshot
        forward (no rewrite)."""
        prev = self.manifest if self.exists() else {"tables": {}, "history": []}
        new_tables = dict(prev["tables"])
        for name, df in tables.items():
            rel = f"{name}/snap-{batch_id:08d}"
            df.write.mode("overwrite").parquet(os.path.join(self.dir, rel))
            new_tables[name] = rel

        manifest = {
            "batch_id": batch_id,
            "tables": new_tables,
            "lineage": lineage or {},
            "history": (
                prev["history"]
                + [{"batch_id": prev.get("batch_id"), "tables": prev["tables"]}]
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

    def _gc(self, manifest: dict[str, Any]) -> None:
        """Delete snapshot dirs referenced by neither the live manifest nor
        retained history entries."""
        live: set[str] = set(manifest["tables"].values())
        for h in manifest["history"]:
            live.update(h["tables"].values())
        for table in {rel.split("/", 1)[0] for rel in live}:
            tdir = os.path.join(self.dir, table)
            if not os.path.isdir(tdir):
                continue
            for snap in os.listdir(tdir):
                rel = f"{table}/{snap}"
                if rel not in live:
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
            "lineage": m.get("lineage", {}),
            "history": m["history"][:-1],
        }
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def destroy(self) -> None:
        shutil.rmtree(self.dir, ignore_errors=True)
