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


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Exact top-k neighbors for the first ``n_queries`` vec_ids.

    The query side is tiny -> broadcast; the corpus side streams through
    one codegen'd projection.  Ties broken by neighbor_id for determinism.
    """
    # norms are per-VECTOR, so compute them on each side before the join —
    # folding them into a per-pair cosine() would redo each norm n_queries
    # (resp. n_corpus) times; values are identical (same expression over
    # the same vector)
    corpus = embeddings.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        _vec("embedding").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("long").alias("query_id"),
        _vec("embedding").alias("qvec"),
    ).withColumn("qnrm", _norm(F.col("qvec")))
    scored = (
        corpus.join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qvec"), F.col("vec"))
                / (F.col("qnrm") * F.col("nrm")), 6),
        )
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


def seed_centroids(embeddings: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic seed centroids: the first ``n_centroids`` vec_ids.
    SQL-expressible (the oracle mirrors it) and the k-means init point."""
    return embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        _vec("embedding").alias("cvec"),
    )


def kmeans_centroids(
    embeddings: DataFrame, n_centroids: int = 16, iters: int = 5
) -> DataFrame:
    """Deterministic Lloyd k-means over the embedding column.

    Init = first ``n_centroids`` vectors (no randomness); each iteration is
    one distributed assignment (broadcast C-way argmax-cosine) plus an
    element-wise mean per bucket (posexplode -> groupBy(centroid, dim) avg).
    Only the C x dim centroid matrix ever reaches the driver — the
    assignment and the mean both scale with the corpus.  Quality path for
    production IVF; the oracle-gated entry query uses
    :func:`seed_centroids` + multi-probe instead (k-means is not reasonably
    SQL-expressible, and fp summation order would make a SQL twin flaky).
    """
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    )
    centroids = seed_centroids(embeddings, n_centroids)
    for _ in range(iters):
        assigned = _rank_centroids(vecs, centroids).filter("cr = 1")
        means = (
            assigned.select("centroid_id", F.posexplode("vec"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("centroid_id",
                    F.col("pm.m").alias("cvec"))
            .collect()
        )
        centroids = spark.createDataFrame(
            [(int(r["centroid_id"]), [float(x) for x in r["cvec"]]) for r in means],
            "centroid_id long, cvec array<double>",
        )
    return centroids


def _rank_centroids(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, vec, vnrm, centroid_id, cr): centroids ranked by cosine per
    vec.  Norms are stamped per side BEFORE the cross join (a vector's norm
    would otherwise be refolded once per centroid); the multiply order
    matches ``cosine(cvec, vec)`` exactly, so values are bit-identical."""
    scored = (
        vecs.withColumn("vnrm", _norm(F.col("vec")))
        .join(F.broadcast(centroids.withColumn("cnrm", _norm(F.col("cvec")))))
        .withColumn(
            "ccos",
            _dot(F.col("cvec"), F.col("vec"))
            / (F.col("cnrm") * F.col("vnrm")),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id")
    )
    return scored.withColumn("cr", F.row_number().over(w)).select(
        "vec_id", "vec", "vnrm", "centroid_id", "cr"
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Assign every vector to its argmax-cosine centroid (bucket)."""
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    )
    if centroids is None:
        centroids = seed_centroids(embeddings, n_centroids)
    return (
        _rank_centroids(vecs, centroids)
        .filter("cr = 1")
        .select("vec_id", "centroid_id", "vec")
    )


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: a query searches its ``n_probe`` nearest IVF
    buckets (multi-probe recovers most of the recall a single probe loses
    at bucket boundaries; cost is O(Q * n_probe * N/C * d)).  Pass
    ``centroids=kmeans_centroids(...)`` for the quality path."""
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    )
    if centroids is None:
        centroids = seed_centroids(embeddings, n_centroids)
    ranked = _rank_centroids(vecs, centroids)
    corpus = ranked.filter("cr = 1").select(
        F.col("vec_id").alias("neighbor_id"), "centroid_id",
        F.col("vec").alias("nvec"), F.col("vnrm").alias("nnrm"),
    )
    queries = ranked.filter(
        (F.col("cr") <= n_probe) & (F.col("vec_id") < n_queries)
    ).select(F.col("vec_id").alias("query_id"), "centroid_id",
             F.col("vec").alias("qvec"), F.col("vnrm").alias("qnrm"))
    scored = (
        corpus.join(F.broadcast(queries), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qvec"), F.col("nvec"))
                / (F.col("qnrm") * F.col("nnrm")), 6),
        )
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
    """vec_id + integer sketch: bit b set iff vec . plane_b > 0.

    The double-cast vector is staged ONCE behind a plan barrier: without
    it CollapseProject inlines the ``_vec`` transform back into all
    SIMHASH_BITS dot-product expressions, and interpreted higher-order
    functions re-execute it per bit (32 casts of every vector per row —
    measured 0.78 s -> 0.47 s over 2k x 64-dim, bit-identical sketches;
    the 32 dot products themselves are genuine work and keep the exact
    fold order the brute-force oracle reproduces)."""
    from crawler_to_md_spark.functions.urlkit import plan_barrier

    planes = _hyperplanes(dim)
    staged = plan_barrier(
        embeddings.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            _vec("embedding").alias("__v"),
        )
    )
    v = F.col("__v")
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
    return staged.select("vec_id", sketch.cast("long").alias("sketch"))


def _band_layout(bits: int, n_bands: int) -> list[tuple[int, int]]:
    """(offset, width) per band: ``bits`` split into ``n_bands`` contiguous
    chunks, widths differing by at most 1."""
    base, extra = divmod(bits, n_bands)
    layout, off = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        layout.append((off, w))
        off += w
    return layout


def simhash_near_pairs(
    embeddings: DataFrame,
    dim: int,
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """EXACT pairs whose sketches differ in <= max_hamming bits.

    Pair generation is pigeonhole-banded LSH for hamming space: with
    ``n_bands >= max_hamming + 1`` bands, a pair with <= max_hamming
    differing bits must share at least one band exactly, so banding
    generates a guaranteed superset of the answer and the exact
    ``bit_count(xor)`` filter makes the result identical to brute force
    (verified against a DuckDB XOR+popcount oracle,
    :func:`duck_simhash_near_pairs_sql`).  Default band count is
    ``max_hamming + 1`` — the round-1 fixed-4-band layout silently missed
    hamming-4..8 pairs when called with ``max_hamming=8``."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"n_bands={n_bands} cannot guarantee recall for "
            f"max_hamming={max_hamming}; need >= {max_hamming + 1}")
    sk = simhash_sketch(embeddings, dim)
    bands = sk.select(
        "vec_id", "sketch",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("sketch"), off)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                )
                for i, (off, width) in enumerate(
                    _band_layout(SIMHASH_BITS, n_bands))
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


def lsh_topk(
    embeddings: DataFrame,
    dim: int,
    n_queries: int = 8,
    k: int = 10,
    n_bands: int = 8,
) -> DataFrame:
    """Approximate top-k by hyperplane-LSH bucketing — the third ANN
    variant next to :func:`brute_force_topk` (exact baseline) and
    :func:`ivf_topk` (coarse-quantizer path).

    Shape: sign-projection sketch (``simhash_sketch``) → split into
    ``n_bands`` contiguous bit bands → a corpus vector is a CANDIDATE for
    a query iff they share at least one band exactly (same pigeonhole
    layout as :func:`simhash_near_pairs`) → exact cosine re-rank of the
    candidates only, top-k per query, ties broken by neighbor_id.

    Scale shape: the band join is keyed by (band, key) — corpus vectors
    hash into 2^width buckets per band, so candidate generation is a
    bucket equi-join moving (band, key, id) triples, never a cross join;
    the O(dim) cosine runs only on the surviving candidate set.  Recall
    is the LSH trade: a neighbor differing in every band is missed —
    raise ``n_bands`` (wider OR over narrower bands) for higher recall
    on nearer neighbors.  Fully deterministic (fixed planes, fixed
    layout), so the DuckDB twin (:func:`duck_lsh_topk_sql`) reproduces
    the exact candidate sets and ranks."""
    sk = simhash_sketch(embeddings, dim)
    layout = _band_layout(SIMHASH_BITS, n_bands)
    bands = sk.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("sketch"), off)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                )
                for i, (off, width) in enumerate(layout)
            ])
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.key")
    qb = bands.filter(F.col("vec_id") < n_queries).select(
        "band", "key", F.col("vec_id").alias("query_id"))
    cands = (
        bands.select("band", "key", F.col("vec_id").alias("neighbor_id"))
        .join(qb, ["band", "key"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    corpus = embeddings.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        _vec("embedding").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))
    queries = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").cast("long").alias("query_id"),
        _vec("embedding").alias("qvec"),
    ).withColumn("qnrm", _norm(F.col("qvec")))
    scored = (
        cands.join(corpus, "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("qvec"), F.col("vec"))
                / (F.col("qnrm") * F.col("nrm")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("long").alias("rank"), "cos")
    )


def duck_lsh_topk_sql(
    dim: int, emb_rel: str = "embeddings", n_queries: int = 8, k: int = 10,
    n_bands: int = 8,
) -> str:
    """Twin of :func:`lsh_topk`: sketches from the same plane literals,
    band keys from the same (offset, width) layout, candidates = share a
    band, exact cosine re-rank."""
    planes = _hyperplanes(dim)
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(v) for v in plane)}]) > 0 THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, {i} AS band, "
        f"((sketch >> {off}) & {(1 << w) - 1}) AS key FROM sk"
        for i, (off, w) in enumerate(_band_layout(SIMHASH_BITS, n_bands))
    )
    return f"""
        WITH sk AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST({bit_terms} AS BIGINT) AS sketch
            FROM {emb_rel}
        ),
        bands AS ({band_rows}),
        cands AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM bands q JOIN bands c USING (band, key)
            WHERE q.vec_id < {n_queries} AND c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT cands.query_id, cands.neighbor_id,
                   round(list_cosine_similarity(
                       CAST(qe.embedding AS DOUBLE[]),
                       CAST(ce.embedding AS DOUBLE[])), 6) AS cos
            FROM cands
            JOIN {emb_rel} qe ON qe.vec_id = cands.query_id
            JOIN {emb_rel} ce ON ce.vec_id = cands.neighbor_id
        )
        SELECT query_id, neighbor_id,
               CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id)
                    AS BIGINT) AS rank,
               cos
        FROM scored
        QUALIFY rank <= {k}
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (LSH-prefiltered, exact-verified)
# ---------------------------------------------------------------------------

EMB_DUP_MOD = 9          # vec_id % 9 == 0 -> planted near copy at vec_id + 10^6
# element i scaled by 1 + 0.05 * ((i % 3) - 1): multipliers cycle
# 0.95 / 1.0 / 1.05 -> cosine vs the original ~0.998 on random vectors,
# far above any natural pair in the driver embeddings (max ~0.51)
_PERTURB_EPS = 0.05


def dup_embedding_corpus(embeddings: DataFrame) -> DataFrame:
    """embeddings + planted near-duplicate vectors (deterministic
    element-wise scaling, double precision on both sides so the DuckDB
    twin reproduces the cosines bit-comparably)."""
    base = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("embedding"),
    )
    near = base.filter(F.col("vec_id") % EMB_DUP_MOD == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x * (F.lit(1.0) + F.lit(_PERTURB_EPS)
                              * ((i % 3) - 1).cast("double")),
        ).alias("embedding"),
    )
    return base.unionByName(near)


def embedding_near_dups(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.9,
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by exact cosine >= ``threshold``, with
    sign-projection LSH candidate generation so the all-pairs O(N²) join
    never materializes.

    Candidates are pairs whose sketches differ in <= ``max_hamming`` of the
    32 projection bits — banding with ``max_hamming + 1`` bands makes that
    candidate set EXACT by pigeonhole (see :func:`simhash_near_pairs`) —
    then the surviving pairs join their vectors back by id and the exact
    cosine filter runs on that tiny set only.  A qualifying pair can be
    missed only if its hamming exceeds ``max_hamming``: at cos >= 0.9 the
    expected differing bits are 32·arccos(0.9)/π ≈ 4.6, and the pytest
    suite asserts equality against the in-Spark brute force (the DuckDB
    oracle is the all-pairs ground truth, so a recall miss fails the gate
    rather than hiding).
    """
    cand = simhash_near_pairs(embeddings, dim, max_hamming=max_hamming)
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))   # per vector, not per pair
    pairs = (
        cand.join(vecs.select(F.col("vec_id").alias("id_a"),
                              F.col("vec").alias("vec_a"),
                              F.col("nrm").alias("nrm_a")), "id_a")
        .join(vecs.select(F.col("vec_id").alias("id_b"),
                          F.col("vec").alias("vec_b"),
                          F.col("nrm").alias("nrm_b")), "id_b")
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("nrm_a") * F.col("nrm_b")), 6),
        )
    )
    return (
        pairs.filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def brute_force_near_dups(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """All-pairs exact cosine near-dup — the in-Spark ground truth used by
    the test suite to certify :func:`embedding_near_dups` recall."""
    vecs = embeddings.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _vec("embedding").alias("vec"),
    ).withColumn("nrm", _norm(F.col("vec")))   # per vector, not per pair
    a = vecs.select(F.col("vec_id").alias("id_a"),
                    F.col("vec").alias("vec_a"), F.col("nrm").alias("nrm_a"))
    b = vecs.select(F.col("vec_id").alias("id_b"),
                    F.col("vec").alias("vec_b"), F.col("nrm").alias("nrm_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(
                _dot(F.col("vec_a"), F.col("vec_b"))
                / (F.col("nrm_a") * F.col("nrm_b")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def duck_embedding_near_dups_sql(
    dim: int, emb_rel: str = "embeddings", threshold: float = 0.9
) -> str:
    """All-pairs cosine ground truth over the planted dup corpus (the LSH
    path must reproduce it exactly)."""
    perturbed = (
        f"list_transform(range(1, len(CAST(embedding AS DOUBLE[])) + 1), "
        f"i -> CAST(embedding AS DOUBLE[])[i] "
        f"* (1.0 + {_PERTURB_EPS} * (((i - 1) % 3) - 1)))"
    )
    return f"""
        WITH dup_emb AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS emb
            FROM {emb_rel}
            UNION ALL
            SELECT CAST(vec_id AS BIGINT) + 1000000, {perturbed}
            FROM {emb_rel} WHERE vec_id % {EMB_DUP_MOD} = 0
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.emb, b.emb), 6) AS cos
        FROM dup_emb a JOIN dup_emb b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= {threshold}
    """


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


def duck_simhash_near_pairs_sql(
    dim: int, max_hamming: int = 3, emb_rel: str = "embeddings"
) -> str:
    """Brute-force XOR+popcount oracle for :func:`simhash_near_pairs`:
    sketches recomputed in SQL from the same hyperplanes (inlined as
    literals), then EVERY pair checked exactly — no LSH — so agreement
    proves the banded path loses nothing."""
    planes = _hyperplanes(dim)
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(v) for v in plane)}]) > 0 THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )
    return f"""
        WITH sk AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST({bit_terms} AS BIGINT) AS sketch
            FROM {emb_rel}
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(bit_count(xor(a.sketch, b.sketch)) AS BIGINT) AS hamming
        FROM sk a JOIN sk b ON a.vec_id < b.vec_id
        WHERE bit_count(xor(a.sketch, b.sketch)) <= {max_hamming}
    """


def duck_ivf_topk_sql(
    emb_rel: str = "embeddings", n_queries: int = 8, k: int = 10,
    n_centroids: int = 16, n_probe: int = 1,
) -> str:
    """Oracle twin of :func:`ivf_topk` with :func:`seed_centroids`:
    corpus vectors live in their argmax bucket; a query probes its
    ``n_probe`` best buckets."""
    return f"""
        WITH ranked AS (
            SELECT v.vec_id, v.embedding, c.vec_id AS centroid_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(c.embedding AS DOUBLE[]),
                           CAST(v.embedding AS DOUBLE[])) DESC, c.vec_id
                   ) AS cr
            FROM {emb_rel} v
            JOIN {emb_rel} c ON c.vec_id < {n_centroids}
        ),
        assigned AS (SELECT * FROM ranked WHERE cr = 1),
        probes AS (SELECT * FROM ranked
                   WHERE cr <= {n_probe} AND vec_id < {n_queries})
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
        FROM probes q
        JOIN assigned c ON q.centroid_id = c.centroid_id
                        AND q.vec_id != c.vec_id
        WHERE q.vec_id < {n_queries}
        QUALIFY rank <= {k}
    """
