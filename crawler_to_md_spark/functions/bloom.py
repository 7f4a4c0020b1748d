"""Partitioned bloom URL-seen filter, vectorized end-to-end.

The reference's URL-seen set is ``url TEXT PRIMARY KEY`` + ``INSERT OR
IGNORE`` (database_manager.py:52-57,168-172).  At 10^10 URLs an exact
anti-join of every discovered-link batch against the full frontier shuffles
the whole seen set every wave; the north rule instead calls for a
"partitioned bloom/cuckoo URL-seen filter implemented as vectorized Arrow
UDFs" used as a *pre-filter*:

    candidate --bloom negative--> definitely new  (no join needed)
              --bloom positive--> exact anti-join on (url_hash, url)

Bloom false positives therefore cost only a redundant exact check — a URL is
never dropped (SURVEY.md §7 "hard parts").  The filter is sharded by
``url_hash mod P`` so shards build in parallel, update incrementally per
wave, and version independently; the shard version is recorded in every
snapshot manifest for resume lineage.

Shard bitmaps are built *distributed* (``applyInPandas`` per shard — each
task ORs its URLs into one numpy bitset and emits the bytes) and merged
driver-side (P bitmaps of m/8 bytes each — at the sandbox default 32 x 128
KiB = 4 MiB; a 10^10-URL deployment sizes m per shard to the per-shard URL
count and lets executors write shard files directly, keeping the driver out
of the data path).  Membership tests run as an Arrow-batched pandas UDF over
a broadcast of the bitmaps — pure numpy, no per-row Python.

Double hashing (Kirsch-Mitzenmacher): bit_i = h1 + i*h2 (mod m) over the
64-bit xxhash64 URL hash, so no re-hashing of strings is ever needed.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(hashes: np.ndarray, num_hashes: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; m_bits must be a power of 2."""
    h = hashes.astype(np.uint64)
    h1 = h
    h2 = (h ^ (h >> np.uint64(33))) * _MIX | np.uint64(1)  # odd -> full-period step
    i = np.arange(num_hashes, dtype=np.uint64)
    mask = np.uint64(m_bits - 1)
    return (h1[:, None] + i[None, :] * h2[:, None]) & mask


def _set_bits(bitmap: np.ndarray, positions: np.ndarray) -> None:
    flat = positions.reshape(-1)
    np.bitwise_or.at(bitmap, flat >> np.uint64(6), np.uint64(1) << (flat & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, positions: np.ndarray) -> np.ndarray:
    words = bitmap[(positions >> np.uint64(6)).astype(np.int64)]
    bits = (words >> (positions & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


class BloomShards:
    """P independent bloom bitmaps keyed by ``url_hash mod P``."""

    def __init__(self, num_shards: int, m_bits: int, num_hashes: int,
                 bitmaps: dict[int, np.ndarray], version: int = 0):
        assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of 2"
        self.num_shards = num_shards
        self.m_bits = m_bits
        self.num_hashes = num_hashes
        self.bitmaps = bitmaps
        self.version = version

    @classmethod
    def empty(cls, num_shards: int = 32, m_bits: int = 1 << 20, num_hashes: int = 7
              ) -> "BloomShards":
        return cls(num_shards, m_bits, num_hashes,
                   {s: np.zeros(m_bits // 64, dtype=np.uint64) for s in range(num_shards)})

    # -- build / update (distributed) -------------------------------------

    def shard_col(self, url_hash) -> F.Column:
        return F.pmod(url_hash, F.lit(self.num_shards)).cast("int")

    def add_dataframe(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """OR every ``url_hash`` in ``df`` into the shard bitmaps.

        Bitmap construction runs on executors (one Arrow batch -> one numpy
        OR pass); the driver only merges P small bitmaps.
        """
        m_bits, k, num_shards = self.m_bits, self.num_hashes, self.num_shards

        def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            local: dict[int, np.ndarray] = {}
            for pdf in batches:
                hashes = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
                shards = (hashes % np.uint64(num_shards)).astype(np.int64)
                for s in np.unique(shards):
                    bm = local.setdefault(int(s), np.zeros(m_bits // 64, dtype=np.uint64))
                    _set_bits(bm, _positions(hashes[shards == s], k, m_bits))
            yield pd.DataFrame(
                {"shard": list(local), "bitmap": [bm.tobytes() for bm in local.values()]}
            )

        rows = (
            df.select(hash_col)
            .mapInPandas(build, schema="shard int, bitmap binary")
            .collect()
        )
        for row in rows:
            self.bitmaps[row["shard"]] |= np.frombuffer(row["bitmap"], dtype=np.uint64)
        self.version += 1

    # -- membership (vectorized Arrow UDF) ---------------------------------

    def might_contain_udf(self, spark: SparkSession):
        """pandas UDF ``long -> boolean``: True if the hash *may* be seen.

        The bitmaps ride a Spark broadcast so every executor core reads one
        shared copy; the UDF is pure numpy per Arrow batch.
        """
        bc = spark.sparkContext.broadcast(
            (self.num_shards, self.m_bits, self.num_hashes,
             {s: bm.copy() for s, bm in self.bitmaps.items()})
        )

        @pandas_udf(BooleanType())
        def might_contain(url_hash: pd.Series) -> pd.Series:
            num_shards, m_bits, k, bitmaps = bc.value
            hashes = url_hash.to_numpy(dtype=np.int64).astype(np.uint64)
            out = np.zeros(len(hashes), dtype=bool)
            shards = (hashes % np.uint64(num_shards)).astype(np.int64)
            for s in np.unique(shards):
                sel = shards == s
                out[sel] = _test_bits(bitmaps[int(s)], _positions(hashes[sel], k, m_bits))
            return pd.Series(out)

        return might_contain

    # -- persistence (shard files under warehouse/bloom/v<k>/) -------------

    def save(self, bloom_dir: str) -> str:
        vdir = os.path.join(bloom_dir, f"v{self.version:08d}")
        os.makedirs(vdir, exist_ok=True)
        meta = np.array([self.num_shards, self.m_bits, self.num_hashes, self.version],
                        dtype=np.int64)
        np.save(os.path.join(vdir, "meta.npy"), meta)
        for s, bm in self.bitmaps.items():
            np.save(os.path.join(vdir, f"shard-{s:04d}.npy"), bm)
        return vdir

    @classmethod
    def load(cls, bloom_dir: str, version: int) -> "BloomShards":
        vdir = os.path.join(bloom_dir, f"v{version:08d}")
        meta = np.load(os.path.join(vdir, "meta.npy"))
        num_shards, m_bits, num_hashes, ver = (int(x) for x in meta)
        bitmaps = {
            s: np.load(os.path.join(vdir, f"shard-{s:04d}.npy"))
            for s in range(num_shards)
        }
        return cls(num_shards, m_bits, num_hashes, bitmaps, version=ver)
