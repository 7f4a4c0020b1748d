"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and an IVF-bucketed approximate variant (the scale path).

Embeddings are ``array<float>`` columns (driver ``embeddings.parquet``:
vec_id, embedding, label).  Dot products and norms are native
``zip_with`` / ``aggregate`` expressions — no Python in the loop; all
arithmetic is double-precision so the DuckDB oracle
(``list_cosine_similarity``) reproduces scores bit-comparably after
rounding.

Brute force is one broadcast nested-loop join of Q query vectors against N
corpus vectors followed by a per-query window top-k: O(Q*N*d) but fully
JVM-vectorized — correct at any N, the right baseline for verifying the
approximate path.

IVF: centroids are the first C corpus vectors (deterministic — a real
deployment would k-means them; centroid *choice* only affects recall, not
the mechanics), every vector is assigned to its argmax-cosine centroid
(broadcast C-way comparison), and a query searches only its own bucket:
O(Q*N/C*d) — the standard inverted-file trade.  SimHash sketches for
embedding near-dup live here too: sign-projection bits against
deterministic hyperplanes -> 64-bit sketch, hamming distance <= r as the
near-dup predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _vec(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vec_ids.

    The query side is tiny -> broadcast; the corpus side streams through
    one codegen'd projection.  Ties broken by neighbor_id for determinism.
    """
    corpus = embeddings.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        _vec("embedding").alias("vec"),
    )
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("long").alias("query_id"),
        _vec("embedding").alias("qvec"),
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("long").alias("rank"), "cos")
    )


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign every vector to its argmax-cosine centroid (bucket)."""
    centroids = embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        _vec("embedding").alias("cvec"),
    )
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    )
    scored = vecs.join(F.broadcast(centroids)).withColumn(
        "cos", cosine(F.col("cvec"), F.col("vec"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("vec_id", "centroid_id", "vec")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
) -> DataFrame:
    """Approximate top-k: search only the query's own IVF bucket."""
    assigned = ivf_assign(embeddings, n_centroids)
    corpus = assigned.select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id",
        F.col("vec").alias("nvec"),
    )
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "centroid_id",
        F.col("vec").alias("qvec"),
    )
    scored = (
        corpus.join(F.broadcast(queries), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qvec"), F.col("nvec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("long").alias("rank"), "cos")
    )


# ---------------------------------------------------------------------------
# SimHash sign-projection sketches (embedding near-dup at scale)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _hyperplanes(dim: int, bits: int = SIMHASH_BITS) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG; values in [-1, 1])."""
    planes = []
    x = 20240816
    for _ in range(bits):
        row = []
        for _ in range(dim):
            x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
            row.append((x / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def simhash_sketch(embeddings: DataFrame, dim: int) -> DataFrame:
    """vec_id + integer sketch: bit b set iff vec . plane_b > 0."""
    planes = _hyperplanes(dim)
    v = _vec("embedding")
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, val: acc + val,
            )
            > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b, plane in enumerate(planes)
    ]
    sketch = bits[0]
    for bit in bits[1:]:
        sketch = sketch + bit
    return embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        sketch.cast("long").alias("sketch"),
    )


def simhash_near_pairs(embeddings: DataFrame, dim: int, max_hamming: int = 3
                       ) -> DataFrame:
    """Pairs whose sketches differ in <= max_hamming bits.  Pair generation
    is banded on sketch prefixes (two 16-bit halves: a pair within hamming
    r < 16 shares at least one exact half... only guaranteed for r <= 1 per
    half split; with 4 bands of 8 bits, any pair with hamming <= 3 shares
    >= 1 exact band) — the standard pigeonhole LSH for hamming space."""
    sk = simhash_sketch(embeddings, dim)
    bands = sk.select(
        "vec_id", "sketch",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("sketch"), i * 8)
                    .bitwiseAND(F.lit(255)).alias("key"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("vec_id", "sketch", "bb.band", "bb.key")
    a = bands.select("band", "key", F.col("vec_id").alias("id_a"),
                     F.col("sketch").alias("sk_a"))
    b = bands.select("band", "key", F.col("vec_id").alias("id_b"),
                     F.col("sketch").alias("sk_b"))
    pairs = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sk_a", "sk_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sk_a").bitwiseXOR(F.col("sk_b")))
    return (
        pairs.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def duck_brute_force_topk_sql(
    emb_rel: str = "embeddings", n_queries: int = 8, k: int = 10
) -> str:
    return f"""
        SELECT CAST(q.vec_id AS BIGINT) AS query_id,
               CAST(c.vec_id AS BIGINT) AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) DESC,
                       c.vec_id) AS BIGINT) AS rank,
               round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cos
        FROM {emb_rel} q JOIN {emb_rel} c ON q.vec_id != c.vec_id
        WHERE q.vec_id < {n_queries}
        QUALIFY rank <= {k}
    """


def duck_ivf_topk_sql(
    emb_rel: str = "embeddings", n_queries: int = 8, k: int = 10,
    n_centroids: int = 16,
) -> str:
    return f"""
        WITH assigned AS (
            SELECT v.vec_id, v.embedding,
                   (SELECT c.vec_id FROM {emb_rel} c
                    WHERE c.vec_id < {n_centroids}
                    ORDER BY list_cosine_similarity(
                        CAST(c.embedding AS DOUBLE[]),
                        CAST(v.embedding AS DOUBLE[])) DESC, c.vec_id
                    LIMIT 1) AS centroid_id
            FROM {emb_rel} v
        )
        SELECT CAST(q.vec_id AS BIGINT) AS query_id,
               CAST(c.vec_id AS BIGINT) AS neighbor_id,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(c.embedding AS DOUBLE[])), 6) DESC,
                       c.vec_id) AS BIGINT) AS rank,
               round(list_cosine_similarity(
                   CAST(q.embedding AS DOUBLE[]),
                   CAST(c.embedding AS DOUBLE[])), 6) AS cos
        FROM assigned q
        JOIN assigned c ON q.centroid_id = c.centroid_id
                        AND q.vec_id != c.vec_id
        WHERE q.vec_id < {n_queries}
        QUALIFY rank <= {k}
    """
