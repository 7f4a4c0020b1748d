"""Deduplication for training-data pipelines: exact and MinHash-LSH.

Exact dedup is a hash-groupBy on the content digest (md5 — byte-identical
in Spark and DuckDB, so the oracle checks the digests themselves).
Near-dup is MinHash over 3-word shingles with LSH banding:

    shingle -> md5-prefix 60-bit int -> 32 permuted minima (signature)
    -> 8 bands x 4 rows -> band hash -> self-join on (band, hash)
    -> verify candidates with EXACT shingle Jaccard >= threshold

All native expressions — signatures are ``transform``s over the shingle
hash array inside codegen; the only shuffles are the band-bucket self-join
(keyed by band hash — uniform) and the final distinct.  Because candidates
are verified with exact Jaccard, LSH false positives never surface; a
false *negative* needs a >=threshold pair missed by all 8 bands
(P ~ (1-j^4)^8, < 1e-5 at j=0.8) — the planted duplicates in the test
corpus sit at j ~ 0.9+ where misses are negligible and, with fixed hash
constants, deterministic.

Scale notes: at 10^10 documents the band self-join is the cost center;
bucket sizes stay bounded because identical band hashes imply
near-identical shingle prefixes; pathological buckets (boilerplate) are
capped with a per-bucket limit before pairing (``max_bucket`` below),
which is also what production LSH dedup does to bound quadratic blowup.
Only (doc_id, band, band_hash) rides the band explode and self-join —
document text is joined back per doc_id for the surviving candidate
pairs only, so the corpus never ships 8x through a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.operators.textstats import shingles

NUM_PERM = 32
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS
# 31-bit Mersenne prime universe: a*h + b stays < 2^62, no int64 overflow
# under Spark's ANSI arithmetic; collisions at 2^31 are negligible for
# per-document shingle counts
_PRIME = (1 << 31) - 1


def _perm_constants(n: int = NUM_PERM) -> list[tuple[int, int]]:
    """Deterministic LCG-derived (a, b) pairs (seeded, no randomness)."""
    out = []
    x = 42
    for _ in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        a = (x % (_PRIME - 1)) | 1
        x = (6364136223846793005 * x + 1442695040888963407) % (1 << 63)
        b = x % _PRIME
        out.append((a, b))
    return out


PERMS = _perm_constants()


def shingle_hashes(text: F.Column) -> F.Column:
    """31-bit ints from md5 prefixes of distinct 3-word shingles (conv of
    15 hex chars mod the Mersenne prime — same arithmetic as the oracle)."""
    return F.transform(
        shingles(text),
        lambda s: (
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
            % F.lit(_PRIME)
        ),
    )


def minhash_signature(text: F.Column) -> F.Column:
    """Array of NUM_PERM minima of (a*h + b) mod PRIME over shingle hashes.

    Single-pass fold: one ``aggregate`` over the shingle-hash array updates
    all NUM_PERM minima per shingle (values identical to per-permutation
    ``array_min``).  The naive form — NUM_PERM separate
    ``array_min(transform(...))`` expressions — embeds NUM_PERM copies of
    the md5 shingle-hash subtree, and higher-order functions run
    interpreted (no codegen, no common-subexpression elimination), so every
    document's shingles were md5-hashed 32x: measured 44 s -> 2 s for the
    signature+band stage over 6.2k docs."""
    perms = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in PERMS
    ])
    init = F.array_repeat(F.lit(_PRIME).cast("long"), NUM_PERM)
    return F.aggregate(
        shingle_hashes(text),
        init,
        lambda acc, h: F.zip_with(
            acc, perms,
            lambda m, p: F.least(m, (h * p["a"] + p["b"]) % F.lit(_PRIME)),
        ),
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated digest."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.count("*").cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def band_structs(sig: F.Column) -> F.Column:
    """LSH banding of a MinHash signature: array of BANDS
    ``struct(band int, bh string)`` rows — ``bh`` is the md5 of the band's
    ROWS_PER_BAND signature values.  Two documents are candidates iff they
    share a (band, bh).  Shared by the batch pair-miner below and the
    streaming ingest's cross-batch band join (streaming/ingest.py)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sig, b * ROWS_PER_BAND + 1, ROWS_PER_BAND),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                )
            ).alias("bh"),
        ),
    )


def shingle_jaccard(text_a: F.Column, text_b: F.Column) -> F.Column:
    """Exact k-word-shingle Jaccard of two text columns (rounded to 6
    decimals, the repo-wide comparison grain)."""
    sh_a, sh_b = shingles(text_a), shingles(text_b)
    inter = F.size(F.array_intersect(sh_a, sh_b)).cast("double")
    union = F.size(F.array_union(sh_a, sh_b)).cast("double")
    return F.round(inter / union, 6)


def minhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = 50,
) -> DataFrame:
    """Verified near-duplicate pairs (doc_a < doc_b, exact jaccard)."""
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col(text_col))
    sig = ids.select(
        "doc_id", minhash_signature(F.col(text_col)).alias("sig"),
    )
    # ids only through the 8x band explode + self-join: at corpus scale the
    # band shuffle then moves (doc_id, 16-byte band hash) rows, not 8 copies
    # of every document's text — text is joined back below for the tiny
    # surviving candidate-pair set only (round-1 scale flaw fixed)
    bands = sig.select(
        "doc_id", F.explode(band_structs(F.col("sig"))).alias("bb")
    ).select("doc_id", "bb.band", "bb.bh")
    # cap pathological buckets (boilerplate) to bound the quadratic join
    from pyspark.sql import Window

    w = Window.partitionBy("band", "bh").orderBy("doc_id")
    bands = bands.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    ).drop("__rn")

    a = bands.select("band", "bh", F.col("doc_id").alias("doc_a"))
    b = bands.select("band", "bh", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, ["band", "bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    pairs = (
        pairs.join(
            ids.select(F.col("doc_id").alias("doc_a"),
                       F.col(text_col).alias("text_a")), "doc_a")
        .join(
            ids.select(F.col("doc_id").alias("doc_b"),
                       F.col(text_col).alias("text_b")), "doc_b")
    )
    return (
        pairs.withColumn(
            "jaccard", shingle_jaccard(F.col("text_a"), F.col("text_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# planted-duplicate corpus (shared derivation; oracle twin below)
# ---------------------------------------------------------------------------

DUP_EXACT_MOD = 7        # doc_id % 7 == 0 -> exact copy at doc_id + 10^6
DUP_NEAR_MOD = 11        # doc_id % 11 == 0 -> near copy at doc_id + 2*10^6
NEAR_SUFFIX = " extra tail token"


def dup_corpus(docs: DataFrame) -> DataFrame:
    """documents + planted exact copies + planted near copies."""
    base = docs.select("doc_id", "text")
    exact = base.filter(F.col("doc_id") % DUP_EXACT_MOD == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = base.filter(F.col("doc_id") % DUP_NEAR_MOD == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(NEAR_SUFFIX)).alias("text"),
    )
    return base.unionByName(exact).unionByName(near)


DUCK_DUP_CORPUS = f"""
dup_corpus AS (
    SELECT doc_id, text FROM {{docs_rel}}
    UNION ALL
    SELECT doc_id + 1000000, text FROM {{docs_rel}}
    WHERE doc_id % {DUP_EXACT_MOD} = 0
    UNION ALL
    SELECT doc_id + 2000000, text || '{NEAR_SUFFIX}' FROM {{docs_rel}}
    WHERE doc_id % {DUP_NEAR_MOD} = 0
)
""".strip()


def duck_exact_dups_sql(docs_rel: str = "documents") -> str:
    return f"""
        WITH {DUCK_DUP_CORPUS.format(docs_rel=docs_rel)}
        SELECT md5(text) AS digest,
               CAST(count(*) AS BIGINT) AS n_copies,
               CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
        FROM dup_corpus GROUP BY md5(text) HAVING count(*) > 1
    """


# ---------------------------------------------------------------------------
# end-to-end training-data cleaning: quality gate -> exact dedup keeper pick
# ---------------------------------------------------------------------------


def quality_dedup_pipeline(
    docs: DataFrame, text_col: str = "text", min_tokens: int = 40
) -> DataFrame:
    """The two front stages of an LLM-training-data pipeline composed
    end-to-end: quality-gate documents (token-count floor over the
    textstats features), then collapse exact duplicates to one keeper per
    digest (min ``doc_id`` — the deterministic tie-break a reproducible
    pipeline needs).

    Scale shape: the quality gate is a narrow codegen'd filter evaluated
    during the scan (no shuffle), so low-quality rows never reach the dedup
    exchange; the only shuffle is the digest groupBy, keyed by md5(text) —
    uniform by construction, no skew.  One row per kept document.
    """
    from crawler_to_md_spark.operators.textstats import token_count

    t = F.col(text_col)
    kept = docs.filter(token_count(t) >= min_tokens).withColumn(
        "digest", F.md5(t)
    )
    return kept.groupBy("digest").agg(
        F.min("doc_id").cast("long").alias("doc_id"),
        F.min(token_count(t)).cast("long").alias("n_tokens"),
    )


def duck_quality_dedup_sql(
    docs_rel: str = "documents", min_tokens: int = 40
) -> str:
    from crawler_to_md_spark.operators.textstats import DUCK_TOKEN_COUNT

    ntok = DUCK_TOKEN_COUNT.format(t="text")
    return f"""
        WITH {DUCK_DUP_CORPUS.format(docs_rel=docs_rel)},
        stats AS (
            SELECT doc_id, text, {ntok} AS n_tokens FROM dup_corpus
        )
        SELECT md5(text) AS digest,
               CAST(min(doc_id) AS BIGINT) AS doc_id,
               CAST(min(n_tokens) AS BIGINT) AS n_tokens
        FROM stats WHERE n_tokens >= {min_tokens}
        GROUP BY md5(text)
    """


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact, inverted-index — no sketching)
# ---------------------------------------------------------------------------

NGRAM_N = 5


def char_ngrams(text: F.Column, n: int = NGRAM_N) -> F.Column:
    """Distinct character n-grams of ``text`` (empty array when shorter
    than ``n`` — ``sequence(1, 0)`` would count DOWN in Spark, so guard)."""
    upper = F.length(text) - n + 1
    return F.when(
        upper >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), upper),
                lambda i: text.substr(i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _jaccard_pairs_from_grams(
    grams: DataFrame, threshold: float, max_df: int | None
) -> DataFrame:
    """EXACT set-Jaccard near-dup pairs via an inverted index, shared by the
    character-n-gram and word-shingle variants.  Input: ``(doc_id, gs)``
    with ``gs`` the document's DISTINCT gram array.

    Unlike :func:`minhash_near_dups` (probabilistic candidate generation),
    this is the exact-similarity form: explode each document's gram set
    into ``(gram, doc_id, set_size)`` postings, self-join on the gram, and
    count shared grams per pair — any pair with Jaccard > 0 shares a gram,
    so the posting join enumerates a guaranteed superset and
    ``|A ∩ B| / (|A| + |B| - |A ∩ B|)`` is computed exactly.  The only
    shuffles are the posting join (keyed by gram) and the pair groupBy.

    Scale: the posting join's cost is Σ df(gram)² — boilerplate grams
    (df in the millions at 10^10 docs) dominate.  Production runs set
    ``max_df`` to drop grams whose document frequency exceeds it, and the
    Jaccard is then computed over the RETAINED vocabulary (set sizes are
    recomputed after the cut — the standard df-cut semantics, so identical
    documents still score 1.0; pairs similar ONLY through ultra-common
    grams drop out, which is the point).  The oracle-gated entry queries
    run with ``max_df=None`` so the result is exactly brute-force Jaccard.
    """
    from pyspark.sql import Window

    if max_df is None:
        # sizes are array sizes — no extra shuffle
        inv = (
            grams.withColumn("sz", F.size("gs").cast("long"))
            .filter(F.col("sz") > 0)
            .select("doc_id", "sz", F.explode("gs").alias("gram"))
        )
    else:
        inv = grams.select("doc_id", F.explode("gs").alias("gram"))
        wdf = Window.partitionBy("gram")
        inv = inv.withColumn("__df", F.count(F.lit(1)).over(wdf)).filter(
            F.col("__df") <= max_df
        ).drop("__df")
        # set sizes recomputed over the retained vocabulary
        wsz = Window.partitionBy("doc_id")
        inv = inv.withColumn("sz", F.count(F.lit(1)).over(wsz))
    a = inv.select(F.col("doc_id").alias("doc_a"),
                   F.col("sz").alias("sz_a"), "gram")
    b = inv.select(F.col("doc_id").alias("doc_b"),
                   F.col("sz").alias("sz_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).cast("double").alias("inter"))
    )
    jac = F.round(
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
    )
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_dups(
    docs: DataFrame,
    text_col: str = "text",
    n: int = NGRAM_N,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact character-n-gram Jaccard near-dup pairs (inverted index; see
    :func:`_jaccard_pairs_from_grams` for semantics and scale notes)."""
    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        char_ngrams(F.col(text_col), n).alias("gs"),
    )
    return _jaccard_pairs_from_grams(grams, threshold, max_df)


def shingle_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact k-word-shingle Jaccard near-dup pairs — the same similarity
    MinHash-LSH estimates (:func:`minhash_near_dups`), computed EXACTLY via
    the inverted index.  This is the deterministic pair stage the certified
    cleaning pipeline uses: LSH is probabilistic (a >=threshold pair missed
    by all bands with P ~ (1-j^r)^b — negligible at j ~ 0.9, but real for
    organic pairs sitting near the threshold), so an oracle-gated
    composition needs the exact form.  At 10^10 docs the production run
    swaps in LSH (``pairs="lsh"`` in :func:`clean_pipeline`) or bounds the
    posting join with ``max_df``."""
    grams = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        shingles(F.col(text_col), k).alias("gs"),
    )
    return _jaccard_pairs_from_grams(grams, threshold, max_df)


def duck_ngram_jaccard_sql(
    docs_rel: str = "documents", n: int = NGRAM_N, threshold: float = 0.5
) -> str:
    """Brute-force all-pairs character-n-gram Jaccard over the planted
    dup corpus — the ground truth :func:`ngram_jaccard_dups` must equal."""
    grams = (
        f"list_distinct(list_transform("
        f"range(1, greatest(length(text) - {n} + 1, 0) + 1), "
        f"i -> substr(text, CAST(i AS INTEGER), {n})))"
    )
    return f"""
        WITH {DUCK_DUP_CORPUS.format(docs_rel=docs_rel)},
        gr AS (SELECT doc_id, {grams} AS gs FROM dup_corpus),
        gr2 AS (SELECT doc_id, gs, len(gs) AS sz FROM gr WHERE len(gs) > 0)
        SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
               CAST(b.doc_id AS BIGINT) AS doc_b,
               round(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                     / (a.sz + b.sz - len(list_intersect(a.gs, b.gs))),
                     6) AS jaccard
        FROM gr2 a JOIN gr2 b ON a.doc_id < b.doc_id
        WHERE round(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                    / (a.sz + b.sz - len(list_intersect(a.gs, b.gs))),
                    6) >= {threshold}
    """


def _duck_pairs_ctes(docs_rel: str, threshold: float, k: int) -> str:
    """CTE chain ``dup_corpus, sh, nd_pairs`` — ground-truth near-dup pairs
    by exhaustive shingle Jaccard (shared by the pair oracle and the
    connected-components oracle)."""
    toks = "string_split(trim(text), ' ')"
    shingle = (
        f"list_distinct(list_transform(range(0, greatest(len({toks}) - {k}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + {k}), ' ')))"
    )
    return f"""
        {DUCK_DUP_CORPUS.format(docs_rel=docs_rel)},
        sh AS (SELECT doc_id, {shingle} AS s FROM dup_corpus),
        nd_pairs AS (
            SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
                   CAST(b.doc_id AS BIGINT) AS doc_b,
                   round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6)
                       AS jaccard
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                        / len(list_distinct(list_concat(a.s, b.s))), 6)
                  >= {threshold}
        )
    """


def duck_brute_force_near_dups_sql(
    docs_rel: str = "documents", threshold: float = 0.5, k: int = 3
) -> str:
    """Ground-truth near-dup pairs by exhaustive shingle Jaccard — the
    oracle the LSH path must reproduce."""
    return f"""
        WITH {_duck_pairs_ctes(docs_rel, threshold, k)}
        SELECT doc_a, doc_b, jaccard FROM nd_pairs
    """


# ---------------------------------------------------------------------------
# near-dup cluster collapse: connected components (large-star / small-star)
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node links its LARGER neighbors to the
    minimum of its neighborhood (incl. itself)."""
    # no intermediate distincts: duplicate edges change neither the min
    # aggregation nor the join semantics, and the small-star round that
    # always follows ends in the one distinct that bounds growth — each
    # dropped distinct saves a full shuffle per round
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u").agg(F.min("v").alias("__mv"))
        .select("u", F.least("__mv", F.col("u")).alias("__m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient edges large->small; every node links
    its smaller neighbors (and itself) to the minimum neighbor."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("__m"))
    relink = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("__m").alias("v"))
    )
    self_link = mins.select("u", F.col("__m").alias("v"))
    return (
        relink.unionByName(self_link).filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_iter: int = 50, check_every: int = 2,
) -> DataFrame:
    """Exact connected components over an undirected pair graph via
    alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond" — O(log^2 n) rounds, every round
    a pair of keyed aggregations, nothing driver-side).

    Near-dup pair lists are the input this exists for: pair output alone
    cannot drive removal (A~B, B~C must collapse to ONE keeper, not two).
    EVERY round is localCheckpoint-truncated: the star rounds scan their
    input 3-4x (symmetrize union + groupBy + join), so an unmaterialized
    round re-executes the whole upstream plan multiplicatively — deferring
    the checkpoint is exponential work, measured 12x wall on the bench
    corpus.  What IS batched is the convergence probe: the fixpoint test
    runs every ``check_every`` rounds (monotone-safe — star rounds are
    idempotent at the fixpoint, so overshoot rounds are no-ops), saving
    one blocking aggregate job per skipped probe at 10^9-edge scale.
    Convergence is detected on (count, xxhash64-sum) of the canonical edge
    set.  Returns one row per node that appears in ``pairs``:
    (node, component) where component = min doc_id of the cluster.
    """
    check_every = max(1, check_every)
    e = (
        pairs.select(F.col(a_col).cast("long").alias("u"),
                     F.col(b_col).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev: tuple | None = None
    converged = False
    for it in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        if (it + 1) % check_every and it + 1 < max_iter:
            continue  # skip the probe job, not the materialization
        got = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: full-range int64 hashes overflow a long
            # sum under ANSI arithmetic
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        sig = (got["n"], got["h"])
        if sig == prev:
            converged = True
            break
        prev = sig
    if not converged:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixpoint edge set is a star forest: (node, root) with root < node
    members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = members.select(
        F.col("component").alias("node"), F.col("component")
    ).distinct()
    return members.unionByName(roots)


def near_dup_components(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """MinHash-LSH near-dup pairs collapsed into clusters: one
    (doc_id, component) row per document that has at least one near-dup;
    component = min doc_id of its transitive cluster (the keeper)."""
    pairs = minhash_near_dups(docs, text_col=text_col, threshold=threshold)
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


def drop_near_dups(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """The removal pass a training-data pipeline actually runs: keep every
    document except non-keeper cluster members (left-anti join against the
    component table's losers).

    ``docs`` is read more than once (pair generation + the anti-join
    probe side) and connected components runs its own job loop — persist
    or checkpoint an EXPENSIVE input lineage first (``clean_pipeline``
    fences this internally; callers composing ad hoc should do the
    same)."""
    losers = near_dup_components(docs, text_col, threshold).filter(
        F.col("doc_id") != F.col("component")
    )
    return docs.join(losers.select("doc_id"), "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# the FULL cleaning pipeline a training-data run executes, as one statement:
# quality gate -> exact dedup -> near-dup cluster collapse -> drop losers
# ---------------------------------------------------------------------------


def clean_pipeline(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    threshold: float = 0.5,
    k: int = 3,
    pairs: str = "exact",
    max_df: int | None = None,
    max_bucket: int = 50,
    bench: DataFrame | None = None,
    decontam_k: int = 13,
    max_dup_window: float | None = None,
    dup_window_n: int = 10,
    dup_window_mode: str = "drop",
) -> DataFrame:
    """Gate -> [decontaminate] -> exact dedup -> [ExactSubstr drop/cut] ->
    near-dup collapse -> drop.

    Stages (each individually oracle-gated elsewhere; the composition is
    certified end-to-end by the ``crawl_clean_shards`` entry query):

    1. **quality gate** — ``token_count(text) >= min_tokens``; a codegen'd
       scan filter, so junk rows never reach a shuffle.
    2. **exact dedup** — keeper = min ``id_col`` per ``md5(text)``; one
       uniform digest shuffle.  Exact copies are removed here so the
       quadratic pair stage never sees them.
    3. **near-dup pair stage** — ``pairs="exact"`` (default): inverted-index
       k-word-shingle Jaccard (:func:`shingle_jaccard_pairs`), deterministic
       and oracle-matchable; ``pairs="lsh"``: MinHash-LSH
       (:func:`minhash_near_dups`), the probabilistic 10^10-doc scale path —
       identical composition, candidate generation swapped.
    4. **cluster collapse** — connected components over the pair graph
       (A~B, B~C must yield ONE keeper); losers = nodes that are not their
       cluster's min id.
    5. **drop** — left-anti join of the exact-dedup survivors against the
       losers.

    Returns the surviving rows with all input columns.  Every stage's
    shuffle is keyed uniformly (digest / gram / node id); nothing is
    driver-side beyond connected_components' 2-tuple convergence probe.

    MATERIALIZATION: the pipeline consumes its input through MULTIPLE
    actions (the exact-dedup self-join reads the gated frame twice, the
    pair stage + final anti-join read the survivors again, and the
    connected-components loop runs its own jobs), so the gated frame and
    the survivor frame are eagerly ``localCheckpoint``-ed.  Without the
    fences every consumer re-executes the whole upstream lineage — for
    the CLI's ``--warc-input --clean`` path that meant re-running the
    archive parse + extraction UDF ~4×; measured on the 100k-doc bench
    corpus the fences cut the end-to-end stage 25.4 s → 9.5 s.  The
    checkpoint blocks release via the ContextCleaner when the frames go
    out of scope; recovery on executor loss = re-run the stage (the same
    designed trade as the crawl wave checkpoints).

    ``bench`` adds a decontamination stage right after the gate (before
    any shuffle): training docs sharing a ``decontam_k``-word shingle with
    the benchmark frame are dropped (operators/curation.decontaminate —
    benchmark grams broadcast, so the stage costs one map-side join).

    ``max_dup_window`` adds the ExactSubstr stage between exact dedup and
    the pair stage — run after exact dedup so byte-identical copies don't
    inflate the window statistics, before the pair stage so secondhand
    text never reaches the quadratic candidate generation.
    ``dup_window_mode`` picks its form: ``"drop"`` removes whole
    documents over the ``max_dup_window`` fraction threshold
    (operators/curation.drop_window_dups); ``"cut"`` instead SURGICALLY
    removes the duplicated windows from every document, first
    corpus-wide occurrence keeping its text (curation.exact_substr_cut,
    the Lee et al. transform — ``max_dup_window`` still gates which
    documents are eligible first, pass 1.0 to cut everywhere).
    """
    from crawler_to_md_spark.operators.textstats import token_count

    t = F.col(text_col)
    gated = docs.filter(token_count(t) >= min_tokens)
    if bench is not None:
        from crawler_to_md_spark.operators import curation

        contaminated = curation.decontaminate(
            gated, bench, text_col=text_col, id_col=id_col, k=decontam_k
        ).filter("contaminated").select(id_col)
        gated = gated.join(contaminated, id_col, "left_anti")
    # fence 1: one pass over the (possibly very expensive) input lineage;
    # the digest self-join below reads this frame twice
    gated = gated.withColumn("__digest", F.md5(t)).localCheckpoint(
        eager=True)
    keepers = gated.groupBy("__digest").agg(
        F.min(id_col).alias(id_col)
    )
    survivors = gated.join(keepers, ["__digest", id_col]).drop("__digest")
    if max_dup_window is not None:
        from crawler_to_md_spark.operators import curation

        survivors = curation.drop_window_dups(
            survivors, max_fraction=max_dup_window, n=dup_window_n,
            id_col=id_col, text_col=text_col,
        )
        if dup_window_mode == "cut":
            cut = curation.exact_substr_cut(
                survivors, n=dup_window_n,
                id_col=id_col, text_col=text_col)
            survivors = survivors.drop(text_col).join(cut, id_col)
        elif dup_window_mode != "drop":
            raise ValueError(
                f"dup_window_mode must be 'drop' or 'cut', got "
                f"{dup_window_mode!r}")

    # fence 2: the pair stage, the final anti-join, and the caller's
    # downstream consumption all read the survivors
    survivors = survivors.localCheckpoint(eager=True)
    pair_input = survivors.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col)
    )
    if pairs == "exact":
        nd = shingle_jaccard_pairs(
            pair_input, text_col=text_col, k=k,
            threshold=threshold, max_df=max_df,
        )
    elif pairs == "lsh":
        nd = minhash_near_dups(
            pair_input, text_col=text_col,
            threshold=threshold, max_bucket=max_bucket,
        )
    else:
        raise ValueError(f"pairs must be 'exact' or 'lsh', got {pairs!r}")
    losers = connected_components(nd).filter(
        F.col("node") != F.col("component")
    ).select(F.col("node").alias(id_col))
    return survivors.join(losers, id_col, "left_anti")


def clean_shards(
    docs: DataFrame,
    *,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_cols: list[str] | None = None,
    min_tokens: int = 10,
    threshold: float = 0.5,
    k: int = 3,
    pairs: str = "exact",
    max_df: int | None = None,
    approx_rows: int | None = None,
    bench: DataFrame | None = None,
    decontam_k: int = 13,
    max_dup_window: float | None = None,
    dup_window_n: int = 10,
) -> DataFrame:
    """:func:`clean_pipeline` -> token-budget shard packing: the one-shot
    crawl-to-training-shards cleaning statement (gate, optional benchmark
    decontamination, exact dedup, near-dup collapse, drop, pack).  Returns
    (order_cols..., n_tokens, shard_id, shard_offset) over the CLEANED
    corpus."""
    from crawler_to_md_spark.operators.packing import pack_shards

    cleaned = clean_pipeline(
        docs, text_col=text_col, id_col=id_col, min_tokens=min_tokens,
        threshold=threshold, k=k, pairs=pairs, max_df=max_df,
        bench=bench, decontam_k=decontam_k,
        max_dup_window=max_dup_window, dup_window_n=dup_window_n,
    )
    return pack_shards(
        cleaned, budget=budget, text_col=text_col,
        order_cols=order_cols or [id_col], approx_rows=approx_rows,
    )


def duck_near_dup_components_sql(
    docs_rel: str = "documents", threshold: float = 0.5, k: int = 3
) -> str:
    """Oracle: transitive closure of the brute-force pair graph by a
    recursive CTE — component = min doc_id reachable from each node."""
    return f"""
        WITH RECURSIVE {_duck_pairs_ctes(docs_rel, threshold, k)},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM nd_pairs
            UNION
            SELECT doc_b, doc_a FROM nd_pairs
        ),
        reach(node, comp) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(min(comp) AS BIGINT) AS component
        FROM reach GROUP BY node
    """
