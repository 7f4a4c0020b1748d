"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partitioning, Arrow batch shape) fully real
and the codec layer stubbed.

A crawl at 100 TB carries images/audio/video as ``binary`` columns next to
the text spans (the corpus span model already carries ``media_ref``s; this
module is the fetch-side of those refs).  The container has no image/audio
libraries, so ``decode_image``'s real path raises NotImplementedError and
a clearly-marked deterministic fake produces fixed-shape features — the
UDF signatures, schemas and ``mapInPandas`` batch handling are exactly
what a real codec drops into.

Payloads here are synthesized deterministically from the documents table
(utf-8 text bytes as stand-in blobs) so sizes and checksums have exact
DuckDB oracles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize the media table: (doc_id, media_type, payload binary,
    meta map).  media_type cycles deterministically; payload = utf-8 bytes
    of the text (stand-in blob with an oracle-computable length)."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"),
            F.lit("lang"), F.col("lang"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, real: bool = False) -> tuple[int, int, list[float]]:
    """STUB: the real decoder needs an image library absent from this
    container.  ``real=True`` raises; the deterministic fake derives a
    (width, height) and a 4-value luma-like feature vector from payload
    bytes — fixed output shape, same contract as a real decode."""
    if real:
        raise NotImplementedError(
            "image decoding requires a codec library (e.g. Pillow) not "
            "available in this environment; wire it in here"
        )
    n = len(payload)
    width = 16 + n % 16
    height = 16 + (n // 16) % 16
    if n == 0:
        # empty blob: fixed-shape zero features (no payload[-1] underflow)
        return width, height, [0.0, 0.0, 0.0, 0.0]
    step = max(1, n // 4)
    feats = [payload[min(i * step, n - 1)] / 255.0 for i in range(4)]
    return width, height, feats


def extract_media_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches in, Arrow batches
    out; one decode call per row inside a vectorized batch loop.  This is
    the exact production shape: swap ``decode_image`` for a real codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats = [], [], []
            for payload in pdf["payload"]:
                w, h, f = decode_image(b"" if payload is None else bytes(payload))
                widths.append(w)
                heights.append(h)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)),
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    return media.mapInPandas(
        run,
        schema=("doc_id long, media_type string, n_bytes long, "
                "width int, height int, features array<float>"),
    )


def media_stats(docs: DataFrame) -> DataFrame:
    """Per-type payload accounting — native, oracle-checkable."""
    m = media_table(docs)
    return m.groupBy("media_type").agg(
        F.count("*").cast("long").alias("n_media"),
        F.sum(F.octet_length(F.col("payload"))).cast("long").alias("total_bytes"),
        F.max(F.octet_length(F.col("payload"))).cast("long").alias("max_bytes"),
    )


def duck_media_features_sql(docs_rel: str = "documents") -> str:
    """Oracle for the stub decoder's geometry: width/height are pure
    arithmetic over octet_length (decode_image), so the mapInPandas
    plumbing is fully checkable even though the 4-float feature vector
    (the only genuinely codec-dependent output) is not exported here."""
    n = "octet_length(encode(text))"
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST({n} AS BIGINT) AS n_bytes,
               CAST(16 + {n} % 16 AS INT) AS width,
               CAST(16 + ({n} // 16) % 16 AS INT) AS height
        FROM {docs_rel}
    """


def duck_media_stats_sql(docs_rel: str = "documents") -> str:
    return f"""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM {docs_rel}
        GROUP BY 1
    """


# ---------------------------------------------------------------------------
# resize + video frame sampling (same stub-codec / real-plumbing contract)
# ---------------------------------------------------------------------------

FRAME_BYTES = 32          # stub "frame" granularity: 1 frame per 32 bytes


def resize_image(payload: bytes, target_w: int, target_h: int,
                 real: bool = False) -> tuple[int, int, int]:
    """STUB resize: real path raises (codec library absent); the fake
    scales the stub-decoded byte count by the area ratio — deterministic,
    arithmetic-only, same (w, h, n_bytes) contract a real resizer has."""
    if real:
        raise NotImplementedError(
            "image resizing requires a codec library (e.g. Pillow) not "
            "available in this environment; wire it in here"
        )
    w, h, _ = decode_image(payload)
    n = len(payload)
    scaled = (n * target_w * target_h) // (w * h)
    return target_w, target_h, scaled


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """mapInPandas resize over image rows only — one resize per row, Arrow
    batches through; fixed fan-in/fan-out (1 row -> 1 row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sub = pdf[pdf["media_type"] == "image"]
            out_w, out_h, out_n = [], [], []
            for payload in sub["payload"]:
                w, h, n = resize_image(
                    b"" if payload is None else bytes(payload),
                    target_w, target_h)
                out_w.append(w)
                out_h.append(h)
                out_n.append(n)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(sub["doc_id"], dtype="int64"),
                    "width": pd.Series(out_w, dtype="int32", index=sub.index),
                    "height": pd.Series(out_h, dtype="int32", index=sub.index),
                    "n_bytes": pd.Series(out_n, dtype="int64", index=sub.index),
                }
            )

    return media.mapInPandas(
        run, schema="doc_id long, width int, height int, n_bytes long")


def sample_frames(payload: bytes, every_n: int,
                  real: bool = False) -> list[tuple[int, float]]:
    """STUB frame sampler: real path raises (no video codec); the fake
    treats every FRAME_BYTES bytes as one frame and emits every
    ``every_n``-th frame index with an arithmetic luma stand-in — the
    (frame_idx, luma) contract of a real sampler."""
    if real:
        raise NotImplementedError(
            "video decoding requires a codec library (e.g. PyAV) not "
            "available in this environment; wire it in here"
        )
    n = len(payload)
    n_frames = n // FRAME_BYTES
    return [
        (i, ((n + i * FRAME_BYTES) % 256) / 255.0)
        for i in range(0, n_frames, every_n)
    ]


def sample_video_frames(media: DataFrame, every_n: int = 3) -> DataFrame:
    """mapInPandas frame sampling over video rows: VARIABLE fan-out (one
    input row -> 0..k frame rows), the Arrow batch shape a real
    frame-sample stage has.  Output dtypes are pinned explicitly so an
    all-miss batch still produces Arrow-castable empty columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            lumas: list[float] = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "video":
                    continue
                for i, luma in sample_frames(
                    b"" if payload is None else bytes(payload), every_n
                ):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    lumas.append(luma)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media.mapInPandas(
        run, schema="doc_id long, frame_idx long, luma double")


AUDIO_RATE = 100          # stub "sample rate": 1 second of audio per 100 bytes


def sample_audio(payload: bytes, window_s: int, hop_s: int,
                 real: bool = False) -> list[tuple[int, int, float]]:
    """STUB audio windower: the real path raises (no audio codec in this
    container); the fake treats every AUDIO_RATE bytes as one second and
    emits sliding (window_idx, start_s, rms) rows — window_s-second
    windows every hop_s seconds, the exact contract of a real
    frame/spectrogram windower.  rms is an arithmetic stand-in so the
    variable fan-out is oracle-checkable."""
    if real:
        raise NotImplementedError(
            "audio decoding requires a codec library (e.g. soundfile/"
            "torchaudio) not available in this environment; wire it in here"
        )
    if window_s <= 0 or hop_s <= 0:
        raise ValueError("window_s and hop_s must be positive")
    n = len(payload)
    duration_s = n // AUDIO_RATE
    out = []
    i = 0
    start = 0
    while start + window_s <= duration_s:
        out.append((i, start, ((n + start * AUDIO_RATE) % 256) / 255.0))
        i += 1
        start += hop_s
    return out


def sample_audio_windows(media: DataFrame, window_s: int = 4,
                         hop_s: int = 2) -> DataFrame:
    """mapInPandas sliding-window sampling over audio rows: VARIABLE
    fan-out (one input row -> 0..k window rows), same Arrow batch shape
    as :func:`sample_video_frames`; output dtypes pinned so all-miss
    batches stay castable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            starts: list[int] = []
            rmss: list[float] = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio":
                    continue
                for i, start, rms in sample_audio(
                    b"" if payload is None else bytes(payload),
                    window_s, hop_s,
                ):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    starts.append(start)
                    rmss.append(rms)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int64"),
                    "start_s": pd.Series(starts, dtype="int64"),
                    "rms": pd.Series(rmss, dtype="float64"),
                }
            )

    return media.mapInPandas(
        run, schema="doc_id long, window_idx long, start_s long, rms double")


def duck_audio_windows_sql(window_s: int = 4, hop_s: int = 2,
                           docs_rel: str = "documents") -> str:
    """Oracle for the stub windower: window count, start times, and rms
    are pure arithmetic over octet_length."""
    n = "octet_length(encode(text))"
    return f"""
        WITH auds AS (
            SELECT doc_id, {n} AS n, {n} // {AUDIO_RATE} AS dur
            FROM {docs_rel} WHERE doc_id % 3 = 1
        ),
        wins AS (
            SELECT doc_id, n,
                   unnest(range(0, greatest(dur - {window_s} + 1, 0),
                                {hop_s})) AS start_s
            FROM auds
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(start_s // {hop_s} AS BIGINT) AS window_idx,
               CAST(start_s AS BIGINT) AS start_s,
               CAST((n + start_s * {AUDIO_RATE}) % 256 AS DOUBLE) / 255.0
                   AS rms
        FROM wins
    """


def duck_video_frames_sql(every_n: int = 3,
                          docs_rel: str = "documents") -> str:
    """Oracle for the stub sampler: frame count and luma are pure
    arithmetic over octet_length, so the variable-fan-out mapInPandas
    plumbing is exactly checkable."""
    n = "octet_length(encode(text))"
    return f"""
        WITH vids AS (
            SELECT doc_id, {n} AS n FROM {docs_rel} WHERE doc_id % 3 = 2
        ),
        frames AS (
            SELECT doc_id, n,
                   unnest(range(0, greatest(n // {FRAME_BYTES}, 0),
                                {every_n})) AS frame_idx
            FROM vids
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST((n + frame_idx * {FRAME_BYTES}) % 256 AS DOUBLE) / 255.0
                   AS luma
        FROM frames
    """


def duck_resized_media_sql(target_w: int, target_h: int,
                           docs_rel: str = "documents") -> str:
    """Oracle for the stub resizer's arithmetic (images only)."""
    n = "octet_length(encode(text))"
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST({target_w} AS INT) AS width,
               CAST({target_h} AS INT) AS height,
               CAST(({n} * {target_w} * {target_h})
                    // ((16 + {n} % 16) * (16 + ({n} // 16) % 16))
                    AS BIGINT) AS n_bytes
        FROM {docs_rel} WHERE doc_id % 3 = 0
    """
