"""Partitioned cuckoo URL-seen filter — the deletable alternative to bloom.

The north rule names "a partitioned bloom/cuckoo URL-seen filter implemented
as vectorized Arrow UDFs"; ``functions/bloom.py`` is the default, this module
is the cuckoo variant a deployment picks when it needs DELETION — e.g. a
recrawl policy that re-opens URLs after a TTL, which a bloom filter cannot
express without a full rebuild.  Same contract and layout as
``BloomShardStore``: shards keyed by ``url_hash mod P`` (power-of-2 P),
versioned immutable shard FILES written by executor tasks, a tiny
shard→version manifest moved by the driver, membership as an Arrow-batched
pandas UDF over worker-cached files.  ``CrawlConfig(seen_filter="cuckoo")``
swaps it in; the snapshot lineage key stays ``bloom_version``.

Filter shape (Fan et al., "Cuckoo Filter: Practically Better Than Bloom"):
buckets of 4 × 16-bit fingerprints; item with hash h lives in bucket
``i1 = h mod B`` or ``i2 = i1 XOR (fp * 0x5bd1e995) mod B`` (partial-key
cuckoo hashing, so relocation needs only the stored fingerprint).

No-false-negative invariant: the engine's schedule operator treats a
negative as "definitely new" and SKIPS the exact anti-join for that branch
(operators/schedule.py), so a lookup must never miss an inserted key.  Two
cuckoo-specific hazards are handled explicitly:

* insert overflow (table saturated, relocation budget exhausted) parks the
  fingerprint in a small per-shard STASH that lookups always scan; if the
  stash itself fills, the insert RAISES — by design, loudly: size the table
  (``bucket_budget`` ≈ items/shard / 4 / 0.95) instead of silently
  degrading.
* fingerprint erasure by deletion: deleting a key another key collides with
  (same bucket pair, same 16-bit fp — p ≈ 8/2^16 per pair) would erase both.
  ``remove_hashes`` therefore deletes AT MOST ONE copy per request, and
  ``add`` stores duplicates (bloom semantics are idempotent; cuckoo deletion
  semantics require one stored copy per logical insert).  The engine only
  inserts each URL once (inserts are the post-anti-join NEW set), so copies
  stay bounded.

Vectorization note, honest: lookups and deletions are pure-numpy batch
operations; inserts precompute fp/i1/i2 vectorized but place items in a
Python loop — placement is inherently sequential (two items may race for
the last slot of a bucket).  At ~1 M inserts/s/task and one task per shard,
a 10^7-new-URLs wave over 32 shards spends ~0.3 s/task, overlapped with the
commit pool exactly like the bloom update.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

SLOTS = 4                      # fingerprints per bucket
_FP_MIX = np.uint64(0x5BD1E995)
MAX_KICKS = 500


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprints from bits 32..47 of the uint64 hash
    (bucket indexing uses the low bits — disjoint bit ranges keep fp and
    index independent)."""
    fp = ((hashes >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _index1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    return (hashes & np.uint64(n_buckets - 1)).astype(np.int64)


def _alt_index(idx: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key alternate bucket: i XOR H(fp).  Involutive, so the same
    formula maps i1->i2 and i2->i1 — relocation never needs the full key."""
    h = (fp.astype(np.uint64) * _FP_MIX) & np.uint64(n_buckets - 1)
    return (idx.astype(np.uint64) ^ h).astype(np.int64)


def _pack(idx, fp) -> np.uint64:
    return (np.uint64(idx) << np.uint64(16)) | np.uint64(fp)


class CuckooShard:
    """One shard: (n_buckets, 4) uint16 table + victim-cache stash.

    The stash holds packed ``(bucket_idx << 16) | fp`` entries — after a
    failed relocation chain the homeless entry is the LAST VICTIM's
    fingerprint (its full hash is unknowable under partial-key hashing), so
    the stash must be keyed the same way lookups probe: fingerprint + one
    of its two buckets.  ``idx`` is always one of the victim's two valid
    buckets because the alternate-index map is involutive."""

    def __init__(self, table: np.ndarray, stash: np.ndarray,
                 stash_cap: int = 64):
        self.table = table            # uint16, 0 = empty slot
        self.stash = stash            # uint64 packed (bucket_idx, fp)
        self.stash_cap = stash_cap

    @classmethod
    def empty(cls, n_buckets: int, stash_cap: int = 64) -> "CuckooShard":
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        return cls(np.zeros((n_buckets, SLOTS), dtype=np.uint16),
                   np.empty(0, dtype=np.uint64), stash_cap)

    # -- insert ------------------------------------------------------------

    def add(self, hashes: np.ndarray) -> None:
        n_buckets = self.table.shape[0]
        fps = _fingerprints(hashes)
        i1s = _index1(hashes, n_buckets)
        stash_new: list[np.uint64] = []
        state = 0x243F6A8885A308D3     # deterministic kick choice (LCG)
        for j in range(len(hashes)):
            fp, idx = fps[j], i1s[j]
            placed = False
            for i in (idx, _alt_index(np.array([idx]), np.array([fp]),
                                      n_buckets)[0]):
                row = self.table[i]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                continue
            cur_fp, cur_idx = fp, idx
            for _ in range(MAX_KICKS):
                state = (state * 6364136223846793005
                         + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
                slot = (state >> 61) & (SLOTS - 1)
                victim = self.table[cur_idx, slot]
                self.table[cur_idx, slot] = cur_fp
                cur_fp = victim
                cur_idx = _alt_index(np.array([cur_idx]),
                                     np.array([cur_fp]), n_buckets)[0]
                row = self.table[cur_idx]
                empty = np.nonzero(row == 0)[0]
                if len(empty):
                    row[empty[0]] = cur_fp
                    placed = True
                    break
            if not placed:
                # the homeless entry after a failed chain is the last
                # VICTIM's fingerprint — park it in the stash keyed by
                # (one of its buckets, fp) so lookups still find it: the
                # no-false-negative invariant holds even saturated
                stash_new.append(_pack(cur_idx, cur_fp))
        if stash_new:
            self.stash = np.concatenate(
                [self.stash, np.array(stash_new, dtype=np.uint64)])
            if len(self.stash) > self.stash_cap:
                raise RuntimeError(
                    f"cuckoo shard saturated: {len(self.stash)} stashed > "
                    f"cap {self.stash_cap}; increase bucket_budget")

    # -- lookup (vectorized) ----------------------------------------------

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        n_buckets = self.table.shape[0]
        fps = _fingerprints(hashes)
        i1 = _index1(hashes, n_buckets)
        i2 = _alt_index(i1, fps, n_buckets)
        hit = ((self.table[i1] == fps[:, None]).any(axis=1)
               | (self.table[i2] == fps[:, None]).any(axis=1))
        if len(self.stash):
            p1 = (i1.astype(np.uint64) << np.uint64(16)) | fps
            p2 = (i2.astype(np.uint64) << np.uint64(16)) | fps
            hit |= np.isin(p1, self.stash) | np.isin(p2, self.stash)
        return hit

    # -- delete ------------------------------------------------------------

    def remove(self, hashes: np.ndarray) -> int:
        """Delete AT MOST ONE stored copy per hash; returns #removed."""
        n_buckets = self.table.shape[0]
        fps = _fingerprints(hashes)
        i1s = _index1(hashes, n_buckets)
        i2s = _alt_index(i1s, fps, n_buckets)
        removed = 0
        keep_stash = np.ones(len(self.stash), dtype=bool)
        for j in range(len(hashes)):
            done = False
            for i in (i1s[j], i2s[j]):
                row = self.table[i]
                slots = np.nonzero(row == fps[j])[0]
                if len(slots):
                    row[slots[0]] = 0
                    removed += 1
                    done = True
                    break
            if not done and len(self.stash):
                for packed in (_pack(i1s[j], fps[j]), _pack(i2s[j], fps[j])):
                    s = np.nonzero((self.stash == packed) & keep_stash)[0]
                    if len(s):
                        keep_stash[s[0]] = False
                        removed += 1
                        break
        if not keep_stash.all():
            self.stash = self.stash[keep_stash]
        return removed

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, table=self.table, stash=self.stash,
                     stash_cap=np.int64(self.stash_cap))
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "CuckooShard":
        with np.load(path) as z:
            return cls(z["table"].copy(), z["stash"].copy(),
                       int(z["stash_cap"]))


# per-worker cache of immutable shard files (same discipline as bloom)
_SHARD_CACHE: dict[str, CuckooShard] = {}
_SHARD_CACHE_MAX = 256


def _load_shard(path: str) -> CuckooShard:
    sh = _SHARD_CACHE.get(path)
    if sh is None:
        sh = CuckooShard.load(path)
        if len(_SHARD_CACHE) >= _SHARD_CACHE_MAX:
            _SHARD_CACHE.clear()
        _SHARD_CACHE[path] = sh
    return sh


class CuckooShardStore:
    """File-backed partitioned cuckoo filter — drop-in for
    ``BloomShardStore`` (create/open/add_dataframe/might_contain_udf/
    version) plus ``remove_dataframe`` for deletion."""

    def __init__(self, cuckoo_dir: str, num_shards: int, n_buckets: int,
                 shard_versions: dict[int, int], version: int):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be a power of 2"
        assert num_shards & (num_shards - 1) == 0, (
            "num_shards must be a power of 2 (signed/unsigned shard-modulo "
            "agreement)")
        self.dir = cuckoo_dir
        self.num_shards = num_shards
        self.n_buckets = n_buckets
        self.shard_versions = shard_versions
        self.version = version

    # -- paths / manifest (same scheme as BloomShardStore) -----------------

    @staticmethod
    def _shard_path(cuckoo_dir: str, shard: int, version: int) -> str:
        return os.path.join(cuckoo_dir, f"shard-{shard:04d}-v{version:08d}.npz")

    @classmethod
    def create(cls, cuckoo_dir: str, num_shards: int = 32,
               n_buckets: int = 1 << 15) -> "CuckooShardStore":
        """Default 2^15 buckets × 4 slots/shard ≈ 125k items/shard at 95%
        load — size to items/shard/3.8 for production frontiers."""
        os.makedirs(cuckoo_dir, exist_ok=True)
        store = cls(cuckoo_dir, num_shards, n_buckets,
                    {s: 0 for s in range(num_shards)}, version=0)
        store._write_meta()
        return store

    @classmethod
    def open(cls, cuckoo_dir: str, version: int) -> "CuckooShardStore":
        with open(os.path.join(cuckoo_dir, f"meta-v{version:08d}.json")) as f:
            meta = json.load(f)
        return cls(cuckoo_dir, meta["num_shards"], meta["n_buckets"],
                   {int(k): v for k, v in meta["shards"].items()},
                   meta["version"])

    def _write_meta(self) -> None:
        path = os.path.join(self.dir, f"meta-v{self.version:08d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"num_shards": self.num_shards,
                       "n_buckets": self.n_buckets, "version": self.version,
                       "shards": {str(k): v
                                  for k, v in self.shard_versions.items()}}, f)
        os.replace(tmp, path)
        self._gc()

    def _gc(self, retain: int = 3) -> None:
        metas = sorted(glob.glob(os.path.join(self.dir, "meta-v*.json")))
        for old in metas[:-retain]:
            os.remove(old)
        live: set[str] = set()
        for mp in metas[-retain:]:
            try:
                with open(mp) as f:
                    m = json.load(f)
            except (OSError, ValueError):
                continue
            for s, v in m["shards"].items():
                if v:
                    live.add(self._shard_path(self.dir, int(s), int(v)))
        for fp in glob.glob(os.path.join(self.dir, "shard-*.npz")):
            if fp not in live:
                os.remove(fp)

    # -- distributed update / delete ---------------------------------------

    def _apply(self, df, hash_col: str, op: str) -> None:
        cuckoo_dir, n_buckets = self.dir, self.n_buckets
        num_shards = self.num_shards
        next_version = self.version + 1
        versions = dict(self.shard_versions)
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast(versions)

        def update_shard(key, pdf):
            shard = int(key[0])
            cur = bc.value.get(shard, 0)
            if cur:
                sh = CuckooShard.load(
                    CuckooShardStore._shard_path(cuckoo_dir, shard, cur))
            else:
                sh = CuckooShard.empty(n_buckets)
            hashes = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
            if op == "add":
                sh.add(hashes)
            else:
                sh.remove(hashes)
            sh.save(CuckooShardStore._shard_path(cuckoo_dir, shard,
                                                 next_version))
            return pd.DataFrame({"shard": [shard]})

        touched = (
            df.select(F.pmod(F.col(hash_col), F.lit(num_shards))
                      .cast("int").alias("__shard"), F.col(hash_col))
            .groupBy("__shard")
            .applyInPandas(update_shard, schema="shard int")
            .collect()
        )
        bc.unpersist()
        for row in touched:
            versions[row["shard"]] = next_version
        self.shard_versions = versions
        self.version = next_version
        self._write_meta()

    def add_dataframe(self, df, hash_col: str = "url_hash") -> None:
        self._apply(df, hash_col, "add")

    def remove_dataframe(self, df, hash_col: str = "url_hash") -> None:
        """Deletion — the capability bloom cannot offer: e.g. a recrawl
        policy re-opening URLs after TTL removes them from the seen filter
        so the scheduler admits them again."""
        self._apply(df, hash_col, "remove")

    # -- membership --------------------------------------------------------

    def might_contain_udf(self, spark: SparkSession):
        paths = {
            s: (self._shard_path(self.dir, s, v) if v else None)
            for s, v in self.shard_versions.items()
        }
        num_shards = self.num_shards
        bc = spark.sparkContext.broadcast(paths)

        @pandas_udf(BooleanType())
        def might_contain(url_hash: pd.Series) -> pd.Series:
            pmap = bc.value
            hashes = url_hash.to_numpy(dtype=np.int64).astype(np.uint64)
            out = np.zeros(len(hashes), dtype=bool)
            shards = (hashes % np.uint64(num_shards)).astype(np.int64)
            for s in np.unique(shards):
                path = pmap.get(int(s))
                if path is None:
                    continue
                sel = shards == s
                out[sel] = _load_shard(path).contains(hashes[sel])
            return pd.Series(out)

        return might_contain
