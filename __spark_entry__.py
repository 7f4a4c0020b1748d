"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl at sf0.001 and returns the final
frontier state.  ``queries()`` exposes the engine's operators over the
driver testdata; ``oracle_sql()`` gives the DuckDB-equivalent SQL on the
same parquet views (``documents`` etc.).  Both sides derive the synthetic
web corpus from ``documents.parquet`` through the SAME SQL fragments
(crawler_to_md_spark/sources/corpus.py), so every check is an independent
re-derivation, not a self-comparison: Spark runs the actual crawl engine
(frontier waves, bloom anti-join, retry taxonomy), DuckDB recomputes the
expected end state with a recursive CTE.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import urlkit
from crawler_to_md_spark.functions.markdown import spans_to_markdown_expr
from crawler_to_md_spark.operators import (
    crawlhealth,
    curation,
    dedup,
    interleaved,
    linkgraph,
    multimodal,
    packing,
    privacy,
    sampling,
    similarity,
    textstats,
)
from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
from crawler_to_md_spark.sources import corpus

M = 2            # corpus replicas per document row (pages = 2 x docs)
MAX_RETRIES = 3

# ---------------------------------------------------------------------------
# shared oracle CTE prologues
# ---------------------------------------------------------------------------


def _meta_cte() -> str:
    return f"WITH {corpus.edges_sql_duck(M)}"


def _reach_cte() -> str:
    return f"WITH RECURSIVE {corpus.reach_sql_duck(M)}"


# class -> end-state rules (reference O5 taxonomy; corpus.python_golden_crawl)
_RETRY_CASE = (
    "CASE WHEN cls IN ('http500','http429','empty','missing') "
    f"THEN {MAX_RETRIES} ELSE 0 END"
)
_STATUS_CASE = (
    "CASE WHEN cls IN ('ok','transient') THEN 'ok' "
    "WHEN cls IN ('http500','http429','empty','missing') THEN 'failed' "
    "ELSE NULL END"
)
# dequeue attempts per class: ok/skip 1, transient 2 (fail+success);
# permanent-retriable URLs are attempted until retry_count hits the cap —
# each failure increments, requeue requires retry < max, so exactly
# MAX_RETRIES attempts total
_ATTEMPTS_CASE = (
    "CASE WHEN cls = 'transient' THEN 2 "
    f"WHEN cls IN ('http500','http429','empty','missing') THEN {MAX_RETRIES} "
    "ELSE 1 END"
)


# ---------------------------------------------------------------------------
# crawl memoization (several queries share one completed crawl per sf_dir)
# ---------------------------------------------------------------------------

_ENGINES: dict[str, CrawlEngine] = {}


def _engine(spark: SparkSession, sf_dir: str) -> CrawlEngine:
    eng = _ENGINES.get(sf_dir)
    if eng is None:
        wh = tempfile.mkdtemp(prefix="entry_wh_")
        eng = CrawlEngine(
            spark, wh,
            corpus=corpus.synth_corpus(spark, sf_dir, replicas=M),
            config=CrawlConfig(scope_domain="example.com",
                               max_retries=MAX_RETRIES),
        )
        eng.seed([corpus.seed_url()])
        eng.run_to_completion()
        _ENGINES[sf_dir] = eng
    return eng


def _corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus.synth_corpus(spark, sf_dir, replicas=M)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full crawl of the sf0.001 corpus; final frontier state."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    return eng.links().select(
        "url", "host", F.col("depth").cast("long").alias("depth"),
        F.col("retry_count").cast("long").alias("retry_count"), "visited",
    )


def _q_corpus_class_histogram(spark, sf_dir):
    return (
        _corpus_df(spark, sf_dir)
        .groupBy("cls").agg(F.count("*").cast("long").alias("n_pages"))
    )


def _q_corpus_host_pages(spark, sf_dir):
    return (
        _corpus_df(spark, sf_dir)
        .groupBy("host").agg(F.count("*").cast("long").alias("n_pages"))
    )


def _q_corpus_edges(spark, sf_dir):
    """Link scheduling primitives (F2+F1+P1/P2): resolve every link span,
    canonicalize, scope-filter, dedup — the exact per-wave candidate
    derivation, corpus-wide."""
    df = _corpus_df(spark, sf_dir)
    return (
        df.filter(F.col("cls").isin(*corpus.PARSED_CLASSES))
        .select(
            F.col("url").alias("src_url"),
            F.explode(F.filter(F.col("spans"),
                               lambda s: s["kind"] == F.lit("link"))).alias("s"),
        )
        .select(
            "src_url",
            urlkit.canonicalize(
                urlkit.resolve_href(F.col("src_url"), F.col("s.media_ref"))
            ).alias("dst_url"),
        )
        .filter(
            F.col("dst_url").isNotNull()
            & urlkit.is_supported_scheme(F.col("dst_url"))
            & urlkit.in_scope_domain(F.col("dst_url"), "example.com")
        )
        .distinct()
    )


def _q_host_pagerank(spark, sf_dir):
    """Host-authority ranking (operators/linkgraph.py): the crawl-priority
    signal a web-scale scheduler orders hosts by.  Integer power iteration
    (3 rounds, damping 4/5, micro-unit BIGINT ranks — bit-stable across
    engines and partitionings) over the host graph collapsed from the
    certified canonical edge list (`corpus_edges`).  The oracle unrolls
    the identical recurrence as chained CTEs."""
    edges = linkgraph.host_edges(_q_corpus_edges(spark, sf_dir),
                                 "src_url", "dst_url")
    return linkgraph.pagerank(edges, iterations=3).select(
        F.col("node").alias("host"), F.col("rank").alias("rank_units"))


def _q_anchor_index(spark, sf_dir):
    """Anchor-text index (operators/linkgraph.py anchor_text_index): for
    every link target the top-3 anchor texts the rest of the corpus uses
    for it, with distinct-(src, anchor, target) citation counts — the
    classic retrieval/relevance training signal.  Skew-safe: salted
    two-phase top-k per target (the certified politeness_cap pattern).
    Oracle re-derives the anchor-labeled edge list forward from the
    generator formulas and replays the textbook ROW_NUMBER form."""
    df = _corpus_df(spark, sf_dir).filter(
        F.col("cls").isin(*corpus.PARSED_CLASSES))
    return linkgraph.anchor_text_index(df, k=3, scope_domain="example.com")


def _pagerank_ctes(iters: int = 3, unit: int = 10**12,
                   num: int = 4, den: int = 5) -> str:
    """DuckDB twin of linkgraph.pagerank: the same integer recurrence
    unrolled (pr0..pr{iters}); expects pr_nodes(node) and
    pr_e(src, dst, deg) CTEs upstream."""
    from crawler_to_md_spark.operators.linkgraph import pagerank_base

    base = pagerank_base(unit, num, den)
    parts = [f"pr0 AS (SELECT node, CAST({unit} AS BIGINT) AS r FROM pr_nodes)"]
    for i in range(1, iters + 1):
        parts.append(f"""pr{i} AS (
            SELECT n.node,
                   CAST({base} + ({num} * COALESCE(c.s, 0)) // {den}
                        AS BIGINT) AS r
            FROM pr_nodes n LEFT JOIN (
                SELECT e.dst AS node, CAST(SUM(p.r // e.deg) AS BIGINT) AS s
                FROM pr_e e JOIN pr{i - 1} p ON p.node = e.src
                GROUP BY e.dst) c ON c.node = n.node)""")
    return ",\n".join(parts)


def _q_crawl_seen_set(spark, sf_dir):
    return _engine(spark, sf_dir).links().select(
        "url", F.col("depth").cast("long").alias("depth"))


def _q_crawl_wave_sizes(spark, sf_dir):
    return (
        _engine(spark, sf_dir).links()
        .groupBy(F.col("depth").cast("long").alias("depth"))
        .agg(F.count("*").cast("long").alias("n_urls"))
    )


def _q_crawl_retry_state(spark, sf_dir):
    return _engine(spark, sf_dir).links().select(
        "url", F.col("retry_count").cast("long").alias("retry_count"))


def _q_crawl_docs_status(spark, sf_dir):
    return _engine(spark, sf_dir).docs().select("url", "status")


def _q_crawl_visited_counts(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.links().agg(
        F.count("*").cast("long").alias("total_links"),
        F.sum(F.col("visited").cast("long")).cast("long").alias("visited_links"),
    )


def _q_crawl_metrics_totals(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metrics().agg(
        F.sum("dequeued").cast("long").alias("total_dequeued"),
        F.sum("fetched_ok").cast("long").alias("total_fetched_ok"),
        F.sum("failed_retriable").cast("long").alias("total_failed"),
        F.sum("skipped").cast("long").alias("total_skipped"),
    )


def _q_page_markdown(spark, sf_dir):
    """Span->markdown serializer over every successfully crawled page."""
    return (
        _engine(spark, sf_dir).docs().filter("status = 'ok'")
        .select("url", F.expr(spans_to_markdown_expr("spans")).alias("markdown"))
    )


def _q_page_titles(spark, sf_dir):
    return (
        _engine(spark, sf_dir).docs().filter("status = 'ok'")
        .select("url", F.col("metadata")["title"].alias("title"))
    )


def _q_url_filenames(spark, sf_dir):
    return _corpus_df(spark, sf_dir).select(
        "url", urlkit.url_to_filename_expr(F.col("url")).alias("filename"))


def _q_export_relpaths(spark, sf_dir):
    return _corpus_df(spark, sf_dir).select(
        "url", urlkit.export_relpath_expr(F.col("url")).alias("relpath"))


def _q_seed_dedup(spark, sf_dir):
    """Order-preserving dedup (L2/utils.py:94-106) over a synthesized seed
    list with case/fragment/dup noise derived from the corpus urls."""
    seeds = _seed_list_df(spark, sf_dir)
    from pyspark.sql import Window

    canon = seeds.withColumn("url", urlkit.canonicalize(F.col("raw"))).filter(
        F.col("url").isNotNull()
    )
    w = Window.partitionBy("url").orderBy("seed_seq")
    return (
        canon.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(F.col("seed_seq").cast("long").alias("first_seq"), "url")
    )


def _seed_list_df(spark, sf_dir):
    # 3 variants per page id g in [0, 60): canonical, uppercased+fragment,
    # canonical dup — seed_seq = 3g / 3g+1 / 3g+2
    base = _corpus_df(spark, sf_dir).filter("page_id < 60")
    return base.select(
        F.explode(
            F.array(
                F.struct((F.col("page_id") * 3).alias("seed_seq"),
                         F.col("url").alias("raw")),
                F.struct((F.col("page_id") * 3 + 1).alias("seed_seq"),
                         F.concat(F.upper("url"), F.lit("#X")).alias("raw")),
                F.struct((F.col("page_id") * 3 + 2).alias("seed_seq"),
                         F.col("url").alias("raw")),
            )
        ).alias("s")
    ).select("s.seed_seq", "s.raw")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_text_stats(spark, sf_dir):
    return textstats.text_stats(_docs(spark, sf_dir))


# decontamination fixture: doc_id % 10 == 7 is the held-out "benchmark";
# train = the rest plus PLANTED contaminated rows (a 'contam'-prefixed copy
# of every other benchmark doc) — token prefixing preserves every contiguous
# k-gram of the source, so the planted rows are exactly the expected hits
DECONTAM_BENCH_MOD = 10
DECONTAM_BENCH_REM = 7
DECONTAM_PLANT_MOD = 20
DECONTAM_K = 8   # documents.parquet floors at 10 tokens — 13-grams (the
#                  GPT-3 default) would leave sub-k docs a single partial
#                  window; 8 keeps >= 3 full windows per doc


def _q_decontam_report(spark, sf_dir):
    """T6: GPT-3-style k-gram benchmark decontamination
    (operators/curation.decontaminate): per-train-doc count of distinct
    k-grams shared with the benchmark set, benchmark grams broadcast."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    bench = docs.filter(F.col("doc_id") % DECONTAM_BENCH_MOD
                        == DECONTAM_BENCH_REM)
    planted = bench.filter(
        F.col("doc_id") % DECONTAM_PLANT_MOD == DECONTAM_BENCH_REM
    ).select((F.col("doc_id") + 3_000_000).alias("doc_id"),
             F.concat(F.lit("contam "), F.col("text")).alias("text"))
    train = docs.filter(F.col("doc_id") % DECONTAM_BENCH_MOD
                        != DECONTAM_BENCH_REM).unionByName(planted)
    return curation.decontaminate(train, bench, k=DECONTAM_K)


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style within-document repetition signals
    (operators/curation.repetition_stats): shuffle-free sorted-array fold."""
    return curation.repetition_stats(_docs(spark, sf_dir))


# line-dedup fixture: documents re-rendered as multi-line docs (one line
# per 5 tokens) behind a shared boilerplate header line — the header must
# survive only in the corpus-minimum doc, token lines dedup by first
# (doc_id, pos) occurrence wherever the small vocabulary repeats a 5-gram
LINE_WIDTH = 5
BOILER = "NAV home about contact"


def _q_line_dedup(spark, sf_dir):
    """Corpus-wide exact line dedup (operators/curation.line_dedup — the
    CCNet/RefinedWeb boilerplate pass), skew-proof keeper join."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    toks = F.split(F.trim(F.col("text")), " ")
    # fixture-only construction (per-line slice re-evaluates the free toks
    # subtree under interpreted HOFs — fine at oracle scale, not operator
    # code): non-overlapping 5-token lines + the planted boilerplate header
    lines = F.transform(
        F.sequence(
            F.lit(0),
            F.ceil(F.size(toks) / F.lit(LINE_WIDTH)).cast("int") - 1),
        lambda j: F.array_join(
            F.slice(toks, j * LINE_WIDTH + 1, LINE_WIDTH), " "),
    )
    ml = docs.select(
        "doc_id",
        F.concat(F.lit(BOILER + "\n"),
                 F.array_join(lines, "\n")).alias("text"),
    )
    return curation.line_dedup(ml)


# PII fixture: the synthetic documents are digit-free word salad, so PII
# is PLANTED deterministically from doc_id (both engines build the same
# strings): emails on doc_id%7==3, SSNs on %13==6, phones on %5==2, IPv4
# on %11==2 — four-digit tails rendered as 1000+id%9000 (no lpad needed)
def _pii_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    four = s(F.lit(1000) + did % 9000)
    t = F.col("text")
    t = F.when(did % 7 == 3,
               F.concat(t, F.lit(" reach user"), s(did),
                        F.lit("@example.com now"))).otherwise(t)
    t = F.when(did % 13 == 6,
               F.concat(t, F.lit(" id 987-65-"), four)).otherwise(t)
    t = F.when(did % 5 == 2,
               F.concat(t, F.lit(" call 555-867-"), four)).otherwise(t)
    t = F.when(did % 11 == 2,
               F.concat(t, F.lit(" node 10.0."), s(did % 256), F.lit("."),
                        s((did * 7) % 256), F.lit(" up"))).otherwise(t)
    return docs.select("doc_id", t.alias("text"))


_PII_DOCS_DUCK = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           text
           || CASE WHEN doc_id % 7 = 3
                   THEN ' reach user' || CAST(doc_id AS VARCHAR)
                        || '@example.com now' ELSE '' END
           || CASE WHEN doc_id % 13 = 6
                   THEN ' id 987-65-'
                        || CAST(1000 + doc_id % 9000 AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 2
                   THEN ' call 555-867-'
                        || CAST(1000 + doc_id % 9000 AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 2
                   THEN ' node 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                        || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                        || ' up' ELSE '' END
           AS text
    FROM documents
"""


def _q_pii_redact(spark, sf_dir):
    """PII scrub (operators/privacy.redact_pii): sequential typed-regex
    passes + per-type counts, scan-only / shuffle-free."""
    return privacy.redact_pii(_pii_docs(spark, sf_dir))


# mixing fixture: per-language caps with 'es' deliberately absent from the
# mixture spec (an unmentioned stratum contributes nothing)
MIX_CAPS = {"en": 40, "de": 25, "fr": 10}


def _q_mix_sample(spark, sf_dir):
    """Deterministic stratified mixture sample
    (operators/sampling.stratified_sample): exact top-cap-per-language
    under md5 order via the certified salted two-phase plan."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "text")
    caps = spark.createDataFrame(
        [(lang, cap) for lang, cap in sorted(MIX_CAPS.items())],
        "lang string, cap int")
    out = sampling.stratified_sample(docs, ["lang"], caps, ["doc_id"])
    return out.select("doc_id", "lang")


def _q_mixture_report(spark, sf_dir):
    """Per-(lang, source) mixture accounting
    (operators/sampling.mixture_report): docs, token weight, corpus
    share."""
    docs = _docs(spark, sf_dir).select("lang", "source", "text")
    return sampling.mixture_report(docs, ["lang", "source"])


def _q_lm_score(spark, sf_dir):
    """Corpus-intrinsic unigram LM quality score
    (operators/textstats.unigram_logprob): micro-nat-quantized mean token
    log-prob, exact integer aggregation cross-engine."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    return textstats.unigram_logprob(docs)


def _q_exact_dedup(spark, sf_dir):
    return dedup.exact_dup_groups(dedup.dup_corpus(_docs(spark, sf_dir)))


def _q_minhash_near_dups(spark, sf_dir):
    return dedup.minhash_near_dups(dedup.dup_corpus(_docs(spark, sf_dir)),
                                   threshold=0.5)


def _q_embedding_topk(spark, sf_dir):
    return similarity.brute_force_topk(_emb(spark, sf_dir), n_queries=8, k=10)


def _q_embedding_ivf_topk(spark, sf_dir):
    """IVF with multi-probe (n_probe=2) over the SQL-expressible seed
    centroids; the production quality path swaps in
    similarity.kmeans_centroids (pytest-gated — recall >= 0.7 vs brute
    force — because deterministic k-means has no robust SQL twin)."""
    return similarity.ivf_topk(_emb(spark, sf_dir), n_queries=8, k=10,
                               n_centroids=16, n_probe=2)


EMB_DIM = 64  # driver embeddings.parquet dim at every sf


def _q_embedding_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH ANN — the third top-k variant (brute force = exact
    baseline, IVF = coarse quantizer, LSH = hamming-bucket candidates):
    sign-projection sketch -> 8 contiguous bit bands -> candidates share
    a band -> exact cosine re-rank of candidates only.  Deterministic
    planes/layout, so the oracle reproduces the exact candidate sets."""
    return similarity.lsh_topk(_emb(spark, sf_dir), EMB_DIM,
                               n_queries=8, k=10, n_bands=8)


def _q_simhash_near_pairs(spark, sf_dir):
    """Embedding near-dup via sign-projection sketches.  Banded pigeonhole
    LSH (9 bands for r=8 — bands >= r+1 guarantees candidate recall) +
    exact hamming filter, so the result EQUALS the brute-force XOR+popcount
    oracle (similarity.duck_simhash_near_pairs_sql)."""
    return similarity.simhash_near_pairs(_emb(spark, sf_dir), EMB_DIM,
                                         max_hamming=8)


def _q_media_stats(spark, sf_dir):
    return multimodal.media_stats(_docs(spark, sf_dir))


def _q_media_features(spark, sf_dir):
    """Multimodal feature extraction through the mapInPandas plumbing
    (deterministic stub decode — see operators/multimodal.py).  The stub's
    width/height are arithmetic over octet_length, so the whole exported
    projection has an exact DuckDB oracle
    (multimodal.duck_media_features_sql); only the 4-float feature vector
    — the genuinely codec-dependent part — is left out of the compare."""
    m = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.extract_media_features(m).select(
        "doc_id", "media_type", "n_bytes", "width", "height")


def _q_video_frame_sample(spark, sf_dir):
    """Video frame sampling through the VARIABLE-fan-out mapInPandas
    plumbing (one video row -> 0..k frame rows; stub codec, arithmetic
    luma — operators/multimodal.py).  The frame count and luma are pure
    functions of octet_length, so the fan-out shape is exactly
    oracle-checkable (multimodal.duck_video_frames_sql)."""
    m = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.sample_video_frames(m, every_n=3)


def _q_audio_window_sample(spark, sf_dir):
    """Audio sliding-window sampling through the variable-fan-out
    mapInPandas plumbing (one audio row -> 0..k window rows; stub codec,
    arithmetic rms — the third modality next to image resize and video
    frame sampling).  Window count/start/rms are pure functions of
    octet_length (multimodal.duck_audio_windows_sql)."""
    m = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.sample_audio_windows(m, window_s=4, hop_s=2)


def _q_media_resize(spark, sf_dir):
    """Stub image resize through mapInPandas (1 row -> 1 row; target dims
    + area-scaled byte count, arithmetic over octet_length)."""
    m = multimodal.media_table(_docs(spark, sf_dir))
    return multimodal.resize_media(m, target_w=224, target_h=224)


def _q_ngram_jaccard_dups(spark, sf_dir):
    """Exact character-5-gram Jaccard dedup (inverted index, no sketch).
    max_df=None -> exactly the brute-force oracle; production sets max_df
    to cut boilerplate grams (see operators/dedup.py)."""
    return dedup.ngram_jaccard_dups(dedup.dup_corpus(_docs(spark, sf_dir)),
                                    threshold=0.5)


def _q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup over a planted-duplicate corpus: banded
    sign-projection LSH candidates (exact for hamming <= 8 by pigeonhole)
    + exact cosine verify; equals the all-pairs DuckDB ground truth."""
    return similarity.embedding_near_dups(
        similarity.dup_embedding_corpus(_emb(spark, sf_dir)),
        EMB_DIM, threshold=0.9, max_hamming=8)


def _q_quality_dedup_pipeline(spark, sf_dir):
    """Training-data cleaning composed end-to-end: token-count quality gate
    -> exact-dup collapse with deterministic keeper (operators/dedup.py
    quality_dedup_pipeline).  One row per kept document."""
    return dedup.quality_dedup_pipeline(
        dedup.dup_corpus(_docs(spark, sf_dir)), min_tokens=40)


def _q_near_dup_components(spark, sf_dir):
    """Near-dup CLUSTER collapse — pair lists alone can't drive removal
    (A~B, B~C must keep one doc, not two): MinHash-LSH pairs -> exact
    connected components via alternating large-star/small-star
    (operators/dedup.py connected_components).  Oracle: recursive-CTE
    transitive closure of the brute-force pair graph."""
    return dedup.near_dup_components(
        dedup.dup_corpus(_docs(spark, sf_dir)), threshold=0.5)


def _q_cuckoo_purge_schedule(spark, sf_dir):
    """The cuckoo seen-filter's distinguishing capability — DELETION —
    exercised through the real scheduling path (schedule.filter_unseen,
    the same prefilter+exact-anti-join the engine runs with
    CrawlConfig(seen_filter='cuckoo')): even-page URLs are inserted as the
    seen set, every fourth page is purged (the TTL-recrawl reopen,
    CrawlEngine.purge), and the full corpus URL set is rescheduled.
    Cuckoo false positives only route extra rows to the exact anti-join —
    never change the result — so the admitted set is exactly
    (all URLs) minus (seen minus purged), which DuckDB recomputes from the
    host-id arithmetic."""
    import tempfile as _tf

    from crawler_to_md_spark.functions.cuckoo import CuckooShardStore
    from crawler_to_md_spark.operators.schedule import filter_unseen

    pages = _corpus_df(spark, sf_dir).select(
        "page_id", "url", "host",
        urlkit.url_hash(F.col("url")).alias("url_hash"))
    seen = pages.filter(F.col("page_id") % 2 == 0)
    purged = seen.filter(F.col("page_id") % 4 == 0)
    store = CuckooShardStore.create(
        _tf.mkdtemp(prefix="entry_cuckoo_"), num_shards=8)
    store.add_dataframe(seen)
    store.remove_dataframe(purged)
    live_seen = seen.filter(F.col("page_id") % 4 != 0)
    admitted = filter_unseen(
        pages.drop("page_id"), live_seen.select("url_hash", "url"),
        bloom=store)
    return admitted.select("url")


# -- streaming frontier (Structured Streaming, deterministic replay) --------

_STREAM_RESULTS: dict[str, DataFrame] = {}

STREAM_GROUPS = 3  # arrival groups -> micro-batch epochs (page_id % 3)


def _q_stream_schedule(spark, sf_dir):
    """The scheduling chain as a Structured Stream: corpus link candidates
    arrive in 3 deterministic waves (page_id % 3 -> one file -> one
    micro-batch each, maxFilesPerTrigger=1), each epoch runs the batch
    schedule chain vs the committed seen set and lands an atomic snapshot
    commit.  Result: every scheduled URL with the epoch that first admitted
    it — SQL-expressible as min(arrival group) per canonical dst URL, so
    the exactly-once dedup ACROSS micro-batches is what the oracle checks.
    """
    got = _STREAM_RESULTS.get(sf_dir)
    if got is not None:
        return got
    import os
    import tempfile

    from crawler_to_md_spark.streaming import frontier as sf

    work = tempfile.mkdtemp(prefix="entry_stream_")
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals, exist_ok=True)
    cands = (
        _corpus_df(spark, sf_dir)
        .filter(F.col("cls").isin(*corpus.PARSED_CLASSES))
        .select(
            F.col("url").alias("page_url"),
            F.explode(F.filter(F.col("spans"),
                               lambda s: s["kind"] == F.lit("link"))).alias("s"),
            F.pmod(F.col("page_id"), F.lit(STREAM_GROUPS)).cast("int").alias("grp"),
        )
        .select("page_url", F.col("s.media_ref").alias("href"),
                F.lit(0).cast("int").alias("parent_depth"), "grp")
    )
    sf.write_candidate_arrivals(spark, cands, arrivals)
    from crawler_to_md_spark.store.schemas import LINKS_SCHEMA
    from crawler_to_md_spark.store.warehouse import SnapshotStore

    store = SnapshotStore(spark, os.path.join(work, "wh"),
                          schemas={"links": LINKS_SCHEMA})
    sched = sf.StreamingScheduler(store, scope_domain="example.com",
                                  store_buckets=16)
    q = sched.start(
        sf.read_candidate_stream(spark, arrivals, max_files_per_trigger=1),
        checkpoint_dir=os.path.join(work, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    out = store.read("links").select(
        "url", "host", F.col("batch_id").cast("long").alias("epoch"))
    _STREAM_RESULTS[sf_dir] = out
    return out


_INGEST_RESULTS: dict[str, DataFrame] = {}


def _q_stream_ingest(spark, sf_dir):
    """Streaming corpus ingestion (streaming/ingest.py): documents arrive
    in 3 deterministic epochs (doc_id % 3, one file -> one micro-batch),
    each epoch is token-gated, in-batch deduped (min-url keeper per md5
    digest) and anti-joined against the COMMITTED corpus before an atomic
    idempotent snapshot commit.  Oracle: per digest, the keeper is the
    min url within the FIRST epoch containing the digest — the cross-batch
    exactly-once dedup is exactly what the SQL twin recomputes."""
    got = _INGEST_RESULTS.get(sf_dir)
    if got is not None:
        return got
    import os
    import tempfile

    from crawler_to_md_spark.store.warehouse import SnapshotStore
    from crawler_to_md_spark.streaming import frontier as sf
    from crawler_to_md_spark.streaming import ingest as si

    work = tempfile.mkdtemp(prefix="entry_ingest_")
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals, exist_ok=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.pmod(F.col("doc_id"), F.lit(3)).cast("int").alias("grp"),
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        "text",
    )
    sf.write_candidate_arrivals(spark, docs, arrivals)
    store = SnapshotStore(
        spark, os.path.join(work, "wh"),
        schemas={"corpus_docs": si.CORPUS_DOCS_SCHEMA})
    ing = si.StreamingCorpusIngest(store, min_tokens=40, store_buckets=16)
    q = ing.start(
        si.read_document_stream(spark, arrivals, max_files_per_trigger=1),
        checkpoint_dir=os.path.join(work, "ckpt"))
    q.awaitTermination()
    out = store.read("corpus_docs").select(
        "digest", "url", "n_tokens",
        F.col("epoch").cast("long").alias("epoch"))
    _INGEST_RESULTS[sf_dir] = out
    return out


# streaming near-dup ingest: synthetic CLIQUE near-dup families, built
# arithmetically so the greedy online semantics coincide exactly with the
# batch closure's one-keeper-per-cluster (see StreamingCorpusIngest.__init__
# for the clique-vs-chain discussion) and the oracle is pure SQL
NEAR_FAMS = 125          # doc_id % NEAR_FAMS = near-dup family (clique)
NEAR_BASE_TOKENS = 60    # shared family base; unique 1-token suffix per doc
_NEAR_INGEST_RESULTS: dict[str, DataFrame] = {}


def _q_stream_near_ingest(spark, sf_dir):
    """Streaming ingestion with cross-batch NEAR-dup dedup
    (streaming/ingest.py near_threshold): every doc is its family's
    60-token base text plus a unique suffix token, so family members are
    pairwise ~0.90-Jaccard near-dups (a clique) and cross-family pairs
    share nothing.  Docs arrive in 3 epochs (doc_id % 3); committed docs
    carry MinHash signatures, and an incoming doc is dropped when an LSH
    band-neighbor verifies at exact shingle-Jaccard >= 0.5 against the
    committed corpus (first-arrival wins) or against a smaller-url batch
    sibling (neighbor domination).  On cliques that keeps EXACTLY one doc
    per family: the min-url member of the family's earliest epoch — which
    is what the SQL twin recomputes with one window."""
    got = _NEAR_INGEST_RESULTS.get(sf_dir)
    if got is not None:
        return got
    import os
    import tempfile

    from crawler_to_md_spark.store.warehouse import SnapshotStore
    from crawler_to_md_spark.streaming import frontier as sf
    from crawler_to_md_spark.streaming import ingest as si

    work = tempfile.mkdtemp(prefix="entry_near_ingest_")
    arrivals = os.path.join(work, "arrivals")
    os.makedirs(arrivals, exist_ok=True)
    ids = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"))
    fam = F.pmod(F.col("doc_id"), F.lit(NEAR_FAMS)).cast("string")
    base = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(NEAR_BASE_TOKENS)),
            lambda i: F.concat(F.lit("w"), fam, F.lit("x"), i.cast("string")),
        ),
        " ",
    )
    docs = ids.select(
        F.pmod(F.col("doc_id"), F.lit(3)).cast("int").alias("grp"),
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(base, F.lit(" u"),
                 F.col("doc_id").cast("string")).alias("text"),
    )
    sf.write_candidate_arrivals(spark, docs, arrivals)
    store = SnapshotStore(
        spark, os.path.join(work, "wh"),
        schemas={"corpus_docs": si.CORPUS_DOCS_SCHEMA})
    ing = si.StreamingCorpusIngest(store, min_tokens=10, store_buckets=16,
                                   near_threshold=0.5)
    q = ing.start(
        si.read_document_stream(spark, arrivals, max_files_per_trigger=1),
        checkpoint_dir=os.path.join(work, "ckpt"))
    q.awaitTermination()
    out = store.read("corpus_docs").select(
        "url", "n_tokens", F.col("epoch").cast("long").alias("epoch"))
    _NEAR_INGEST_RESULTS[sf_dir] = out
    return out


# ST3 oracle fixture: bursts are arithmetically aligned with the admission
# operator's event-driven windows, so the stateful semantics reduce to SQL.
# doc_id i -> host i%7, burst (i//7)%5, within-burst rank (i//7)//5; bursts
# are 120 s apart (> the 60 s window, so every burst opens a fresh window)
# and a burst's rows land 1 ms apart inside one second (all inside the
# window, uniquely ordered).  Each burst arrives as one micro-batch (grp =
# burst), so the cross-batch GroupState carry is exercised burst-to-burst.
ADMIT_HOSTS = 7
ADMIT_BURSTS = 5
ADMIT_RATE = 3
_ADMISSION_RESULTS: dict[str, DataFrame] = {}


def _q_stream_admission(spark, sf_dir):
    """ST3: stateful per-host token-bucket admission
    (streaming/frontier.stateful_host_admission, applyInPandasWithState).
    With burst-aligned event times the oracle is one window function:
    admitted iff row_number over (host, burst) <= rate limit."""
    got = _ADMISSION_RESULTS.get(sf_dir)
    if got is not None:
        return got
    import os
    import tempfile

    from crawler_to_md_spark.streaming import frontier as sfr

    work = tempfile.mkdtemp(prefix="entry_admission_")
    in_dir = os.path.join(work, "arrivals")
    os.makedirs(in_dir, exist_ok=True)
    i = F.col("doc_id").cast("long")
    j = F.floor(i / ADMIT_HOSTS).cast("long")
    burst = (j % ADMIT_BURSTS).cast("long")
    seq = F.floor(j / ADMIT_BURSTS).cast("long")
    reqs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        burst.cast("int").alias("grp"),
        F.concat(F.lit("h"), (i % ADMIT_HOSTS).cast("string")).alias("host"),
        F.concat(F.lit("u"), i.cast("string")).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000).cast("long") + burst * 120
            + seq.cast("double") / 1000.0
        ).alias("event_time"),
    )
    sfr.write_candidate_arrivals(spark, reqs, in_dir)
    stream = (
        spark.readStream.schema(sfr.FETCH_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out_dir = os.path.join(work, "out")
    q = (
        sfr.stateful_host_admission(stream, rate_limit=ADMIT_RATE,
                                    window_seconds=60)
        .select("host", "url", "admitted")
        .writeStream.foreachBatch(
            lambda batch, _eid: batch.write.mode("append").parquet(out_dir))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    _ADMISSION_RESULTS[sf_dir] = got
    return got


def _q_host_windows(spark, sf_dir):
    """ST2 batch form: the streaming politeness accounting
    (streaming/frontier.py host_request_windows — reference requests/min
    window, scraper.py:455-468) over a deterministic fetch log derived
    from the events table (ts -> event_time, user_id -> host).  Tumbling
    1-minute event-time windows; the DuckDB twin is time_bucket.  Window
    bounds are emitted as formatted strings so the value hash is
    timezone-representation-independent."""
    from crawler_to_md_spark.streaming.frontier import host_request_windows

    log = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("ts").alias("event_time"),
        F.concat(F.lit("h"), (F.col("user_id") % 20).cast("string"),
                 F.lit(".example.com")).alias("host"),
    )
    out = host_request_windows(log, window_duration="1 minute")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "host",
        "requests",
    )


def _q_robots_gate(spark, sf_dir):
    """Robots gating end-to-end minus HTTP: a robots.txt BODY is derived
    arithmetically per host (even host ids publish a '*' group disallowing
    /docs/p1,/docs/p3 plus a more specific 'mybot' group disallowing
    /docs/p2 while ALLOWING the deeper /docs/p21 subtree; odd host ids
    publish an empty-Disallow allow-all), parsed by the engine's RFC
    9309-lite parser (sources/robots.py — group selection must pick the
    'mybot' group over '*'), and the corpus URL set is gated through
    politeness.robots_filter with RFC 9309 longest-match precedence.
    DuckDB recomputes the allowed set from the same host-id arithmetic:
    even-host pages whose page id starts with '2' are blocked UNLESS the
    id starts with '21' (the Allow override certifies precedence
    end-to-end)."""
    from crawler_to_md_spark.operators.politeness import robots_filter
    from crawler_to_md_spark.sources.robots import parse_allow, parse_robots

    pages = _corpus_df(spark, sf_dir).select("url", "host")
    host_id = F.expr("CAST(substr(split_part(host, '.', 1), 2) AS INT)")
    body = F.when(
        host_id % 2 == 0,
        F.lit("User-agent: *\nDisallow: /docs/p1\nDisallow: /docs/p3\n\n"
              "User-agent: mybot\nDisallow: /docs/p2\nAllow: /docs/p21\n"),
    ).otherwise(F.lit("User-agent: *\nDisallow:\n"))
    parse_d = F.pandas_udf(
        lambda t: t.map(lambda x: parse_robots(x, "mybot/1.0")),
        "array<string>")
    parse_a = F.pandas_udf(
        lambda t: t.map(lambda x: parse_allow(x, "mybot/1.0")),
        "array<string>")
    rules = (
        pages.select("host").distinct()
        .select("host", parse_d(body).alias("disallow"),
                parse_a(body).alias("allow"))
    )
    return robots_filter(pages, rules).select("url")


def _q_priority_schedule(spark, sf_dir):
    """North-rule priority queue: window-ranked micro-batch dequeue.  A
    synthetic frontier (priority = page_id mod 3, depth = page_id mod 5)
    goes through the engine's actual wave-batch operators — the two-phase
    SALTED per-host window (politeness.politeness_cap, budget 3 over 4 salt
    shards) then the global TakeOrderedAndProject cap (global_cap, 50) —
    and must equal DuckDB's UNsalted plain ROW_NUMBER top-3-per-host +
    ORDER BY (priority, depth, url) LIMIT 50: the oracle certifies the
    skew-bounded two-phase form is EXACTLY the textbook priority queue."""
    from crawler_to_md_spark.operators.politeness import (
        global_cap,
        politeness_cap,
    )

    frontier = _corpus_df(spark, sf_dir).select(
        "url", "host",
        F.xxhash64("url").alias("url_hash"),
        (F.col("page_id") % 3).cast("long").alias("priority"),
        (F.col("page_id") % 5).cast("long").alias("depth"),
    )
    batch = global_cap(politeness_cap(frontier, 3, salt_shards=4), 50)
    return batch.select("url", "host", "priority", "depth")


def _q_adaptive_schedule(spark, sf_dir):
    """Adaptive politeness: per-host wave budgets derived from the
    ENGINE'S OWN failure record (politeness.adaptive_host_budgets —
    exponential backoff, budget = max(1, 8 >> min(n_failed, 5))), applied
    through the skew-bounded salted two-phase per-host cap
    (politeness_cap_per_host, 4 salt shards) + the global
    TakeOrderedAndProject (cap 80).  The oracle recomputes the failed-host
    counts from the reach + failure-class formulas and replays the
    textbook unsalted ROW_NUMBER top-b(host) form."""
    from crawler_to_md_spark.operators.politeness import (
        adaptive_host_budgets,
        global_cap,
        politeness_cap_per_host,
    )

    eng = _engine(spark, sf_dir)
    budgets = adaptive_host_budgets(
        eng.docs().filter("status = 'failed'"), base_budget=8)
    frontier = _corpus_df(spark, sf_dir).select(
        "url", "host",
        F.xxhash64("url").alias("url_hash"),
        (F.col("page_id") % 3).cast("long").alias("priority"),
        (F.col("page_id") % 5).cast("long").alias("depth"),
    )
    batch = global_cap(
        politeness_cap_per_host(frontier, budgets, default_budget=8,
                                salt_shards=4),
        80,
    )
    return batch.select("url", "host", "priority", "depth")


def _q_crawl_training_shards(spark, sf_dir):
    """End-to-end training-data pipeline FROM THE CRAWL: successfully
    fetched pages -> span->markdown serialization (the interleaved
    text+media document) -> token-count quality gate (>= 10) ->
    token-budget shard packing (512-token shards in url order, scale-path
    two-phase prefix sum).  Composes the crawl engine, the span
    serializer, textstats, and operators/packing.py in one oracle-gated
    statement — the engine's whole reason to exist, crawl to shards."""
    from crawler_to_md_spark.operators.packing import pack_shards
    from crawler_to_md_spark.operators.textstats import token_count

    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    md = docs.select(
        "url", F.expr(spans_to_markdown_expr("spans")).alias("md"))
    gated = md.filter(token_count(F.col("md")) >= 10)
    return pack_shards(gated, budget=512, text_col="md", order_cols=["url"])


# planted-mirror derivation for the certified cleaning pipeline: mirrors
# model the same content fetched at a second URL (the dominant exact-dup
# source in real crawls); near rows model boilerplate-appended variants
CLEAN_MOD = 9                 # page_id % 9 == 0 -> exact copy at +10^7
CLEAN_NEAR_REM = 3            # page_id % 9 == 3 -> near copy at +2*10^7
CLEAN_NEAR_SUFFIX = " extra mirrored tail tokens appended"


def _q_crawl_clean_shards(spark, sf_dir):
    """THE full training-data cleaning pipeline from the crawl, certified
    as one statement: crawl -> span->markdown serialization -> token-count
    quality gate (>= 10) -> exact dedup (min-id keeper per md5 digest) ->
    near-dup CLUSTER collapse (exact shingle-Jaccard pairs >= 0.5,
    connected components, drop non-keepers) -> 512-token shard packing.

    Exact mirror pages (every 9th page at a ``?mirror=1`` URL) and
    near-dup variants (every 9th+3 page with appended boilerplate) are
    planted arithmetically so the exact-dedup and collapse stages provably
    fire on crafted rows in addition to the corpus's organic near-dups.
    The pair stage is the EXACT inverted-index form (dedup.py
    shingle_jaccard_pairs), not LSH: the organic pair population sits on a
    continuous Jaccard spectrum through the threshold, where LSH's
    per-pair miss probability is real — the oracle (brute-force pairs +
    recursive-CTE closure + window cumsum) demands determinism.  The LSH
    variant of the SAME composition is pytest-certified on the planted
    dup corpus (tests/test_dataops.py)."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    md = docs.select(
        "url", F.expr(spans_to_markdown_expr("spans")).alias("md")
    ).withColumn(
        "did", F.regexp_extract("url", r"/docs/p(\d+)$", 1).cast("long")
    )
    mirror = md.filter(F.col("did") % CLEAN_MOD == 0).select(
        F.concat("url", F.lit("?mirror=1")).alias("url"), "md",
        (F.col("did") + 10_000_000).alias("did"),
    )
    near = md.filter(F.col("did") % CLEAN_MOD == CLEAN_NEAR_REM).select(
        F.concat("url", F.lit("?near=1")).alias("url"),
        F.concat("md", F.lit(CLEAN_NEAR_SUFFIX)).alias("md"),
        (F.col("did") + 20_000_000).alias("did"),
    )
    corpus_all = md.unionByName(mirror).unionByName(near)
    return dedup.clean_shards(
        corpus_all, budget=512, text_col="md", id_col="did",
        order_cols=["url"], min_tokens=10, threshold=0.5, pairs="exact",
    )


def _q_media_manifest(spark, sf_dir):
    """Media-fetch frontier over the crawl's interleaved documents
    (operators/interleaved.py): every distinct media reference with its
    citation count and first citing page — dedup BEFORE fetch, so an
    image embedded by many pages downloads once.  Mirror pages (every
    9th page re-served at a ``?mirror=1`` URL, the dominant duplication
    source in real crawls) are planted so the count aggregation provably
    collapses multi-page citations, not just 1:1 rows."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    base = docs.select("url", "spans").withColumn(
        "did", F.regexp_extract("url", r"/docs/p(\d+)$", 1).cast("long")
    )
    mirror = base.filter(F.col("did") % CLEAN_MOD == 0).select(
        F.concat("url", F.lit("?mirror=1")).alias("url"), "spans"
    )
    return interleaved.media_manifest(
        base.select("url", "spans").unionByName(mirror)
    )


def _q_span_stats(spark, sf_dir):
    """Per-document interleaving statistics over the crawl's span table
    — the gate signals of a vision-language curation pass (span counts by
    role, text-token mass, media density).  Scan-only plan: every column
    is an in-row fold over the bounded span array."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    return interleaved.span_stats(docs.select("url", "spans"))


def _q_pack_multimodal(spark, sf_dir):
    """Multimodal token-budget shard packing: interleaved documents pack
    under text tokens + a fixed 64-token patch cost per media span (a
    vision-LM's true sequence length), 512-token shards in url order —
    the same certified two-phase prefix sum as pack_shards, driven by the
    span structure instead of a text column."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    return interleaved.pack_interleaved(
        docs.select("url", "spans"), budget=512, media_cost=64
    )


def _q_media_context(spark, sf_dir):
    """VLM caption mining (operators/interleaved.py media_context_pairs):
    for every media span of every crawled page, the nearest text span
    before/after in document order — computed in-row (no shuffle), one
    explode.  Oracle re-derives both contexts arithmetically from the
    corpus generator formulas (last non-empty paragraph else the heading;
    the code span when present)."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    return interleaved.media_context_pairs(docs)


def _q_section_chunks(spark, sf_dir):
    """Heading-delimited section chunking (operators/interleaved.py
    section_chunks) over a PLANTED multi-heading interleaved table (the
    crawl corpus has one heading per page, which would certify nothing):
    documents.text is cut into 8-token chunks, every 4th chunk is a
    heading, an image span follows every chunk with i%5==2.  Both engines
    derive the same spans from the same formula; the oracle recomputes
    sections with a window-free GROUP BY i//4."""
    docs = corpus.load_documents(spark, sf_dir)
    planted = docs.selectExpr(
        "doc_id",
        f"""
        transform(
          flatten(transform(
            sequence(0,
              CAST((size(split(trim(text), ' ')) + 7) DIV 8 AS INT) - 1),
            i -> concat(
              array(named_struct(
                'kind',
                CASE WHEN i % 4 = 0 THEN 'heading2' ELSE 'paragraph' END,
                'text',
                array_join(slice(split(trim(text), ' '), 8 * i + 1, 8), ' '),
                'media_ref', CAST(NULL AS STRING),
                'offset', 0)),
              CASE WHEN i % 5 = 2 THEN array(named_struct(
                'kind', 'image', 'text', CAST(NULL AS STRING),
                'media_ref',
                'img://' || CAST(doc_id AS STRING) || '/' || CAST(i AS STRING),
                'offset', 0))
              ELSE CAST(array() AS {corpus.SPANS_DDL}) END))),
          (s, j) -> named_struct(
            'kind', s.kind, 'text', s.text, 'media_ref', s.media_ref,
            'offset', CAST(j AS INT))) AS spans
        """,
    )
    return interleaved.section_chunks(planted, id_col="doc_id")


def _q_exact_substr_cut(spark, sf_dir):
    """The SURGICAL ExactSubstr form (operators/curation.exact_substr_cut,
    Lee et al.): duplicated 10-token windows are CUT from documents,
    first corpus-wide occurrence keeps its text.  Mirrored copies of
    every 7th document are planted (doc_id + 10^7) so the mirrors must
    come back fully emptied while their originals pass through
    byte-identical; organically shared windows cut wherever they repeat.
    Oracle = the ROW_NUMBER first-occurrence + covered-index-union
    rebuild over the same planted union."""
    docs = corpus.load_documents(spark, sf_dir).select("doc_id", "text")
    mirrors = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    return curation.exact_substr_cut(docs.union(mirrors), n=10)


def _q_crawl_report(spark, sf_dir):
    """Per-host coverage/health rollup (CrawlEngine.crawl_report): the
    operational dashboard over the finished crawl.  Oracle recomputes
    every column from the reach CTE + class formulas."""
    return _engine(spark, sf_dir).crawl_report()


SOFT404_TEXT_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'Page not found.' ELSE text END"
)
TRAP_URL_SQL = (
    "'https://' || host || '/cal/day?date=2026-' || CAST(doc_id AS STRING)"
    " || '-' || CAST(d AS STRING)"
)
SPLITS = [("train", 80), ("val", 10), ("test", 10)]


def _q_soft404_report(spark, sf_dir):
    """Soft-404 detection (operators/crawlhealth.soft404_report): every
    third document's body is REPLACED by a constant 'Page not found.'
    placeholder, so each host serves a dominant duplicate digest; the
    report must flag exactly the (host, digest) families clearing the
    3-page floor and the 20% integer share test.  Oracle = the GROUP
    BY / HAVING twin over the same planted page table."""
    g = "doc_id"
    pages = _docs(spark, sf_dir).selectExpr(
        f"{corpus.HOST_SQL.format(g=g)} AS host",
        f"{corpus.URL_SQL.format(g=g)} AS url",
        f"{SOFT404_TEXT_SQL} AS text",
    )
    return crawlhealth.soft404_report(
        pages, min_pages=3, share_num=1, share_den=5)


def _q_trap_report(spark, sf_dir):
    """Crawl-trap detection (operators/crawlhealth.trap_report): every
    even document fans out 20 calendar URLs ('/cal/day?date=2026-D'), so
    each host grows a URL family that collapses to one template
    ('/cal/day?date=*') with dozens-to-thousands of members, while the
    organic '/docs/pN' family stays under the threshold on small hosts.
    Oracle recomputes templates with DuckDB regexp_replace(..., 'g')."""
    g = "doc_id"
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"{corpus.HOST_SQL.format(g=g)} AS host",
        f"{corpus.URL_SQL.format(g=g)} AS url",
    )
    base = docs.select("host", "url")
    planted = (
        docs.filter("doc_id % 2 = 0")
        .withColumn("d", F.explode(F.sequence(F.lit(0), F.lit(19))))
        .selectExpr("host", f"{TRAP_URL_SQL} AS url")
    )
    return crawlhealth.trap_report(base.union(planted), min_urls=50)


def _q_mirror_hosts(spark, sf_dir):
    """Mirror-host detection (operators/crawlhealth.mirror_clusters):
    every even document's page is REPLICATED onto a planted
    'mirror-<host>' twin, so each origin host shares half its distinct
    digests with its mirror (100% of the mirror's) — the pair stage must
    flag exactly those pairs and the certified connected-components
    collapse labels each cluster by its lexicographic-min host.  Oracle =
    the same distinct/cap/share pipeline + recursive-CTE closure over
    host strings."""
    g = "doc_id"
    base = _docs(spark, sf_dir).selectExpr(
        f"{corpus.HOST_SQL.format(g=g)} AS host", "text", "doc_id")
    mirrors = base.filter("doc_id % 2 = 0").selectExpr(
        "'mirror-' || host AS host", "text", "doc_id")
    pages = base.union(mirrors).select("host", "text")
    return crawlhealth.mirror_clusters(pages)


def _q_shuffle_split(spark, sf_dir):
    """Deterministic split assignment + global shuffle order
    (operators/sampling.split_assign / global_shuffle_pos): 80/10/10
    hash-bucket splits (a row's split survives corpus growth) and a
    reproducible md5-order permutation ranked by the certified two-phase
    prefix machinery.  Oracle = the same '0x'-cast md5 arithmetic +
    ROW_NUMBER."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"))
    out = sampling.split_assign(docs, ["doc_id"], SPLITS)
    out = sampling.global_shuffle_pos(out, ["doc_id"])
    return out.select("doc_id", "split", "shuffle_pos")


def _q_multi_dedup(spark, sf_dir):
    """Multi-signal dedup report — the union a production cleaning run
    acts on: per id, is it an exact-TEXT-dup loser (min-id keeper per
    md5 digest over the planted text corpus), a text-NEAR-dup loser
    (larger side of a verified MinHash-LSH jaccard-0.5 pair — the
    certified banded path whose exact-verify step makes it equal to
    brute-force shingle jaccard), and/or an embedding-NEAR-dup loser
    (smaller-id cosine-0.9 neighbor exists, via the certified
    banded-LSH + exact-verify path over the planted vector corpus);
    ``dropped`` = any of the three.  Oracle recomputes all three
    signals the readable way (digest GROUP BY + all-pairs shingle
    jaccard + all-pairs cosine) and full-joins them."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tcorp = dedup.dup_corpus(docs)
    groups = dedup.exact_dup_groups(tcorp)
    with_digest = tcorp.select(
        F.col("doc_id").cast("long").alias("id"),
        F.md5("text").alias("digest"))
    tlose = with_digest.join(groups, "digest").filter(
        F.col("id") != F.col("keeper_doc_id")).select("id")
    npairs = dedup.minhash_near_dups(tcorp, threshold=0.5)
    nlose = npairs.select(F.col("doc_b").cast("long").alias("id")).distinct()
    ecorp = similarity.dup_embedding_corpus(_emb(spark, sf_dir))
    pairs = similarity.embedding_near_dups(
        ecorp, EMB_DIM, threshold=0.9, max_hamming=8)
    elose = pairs.select(F.col("id_b").alias("id")).distinct()
    ids = with_digest.select("id").union(
        ecorp.select(F.col("vec_id").cast("long").alias("id"))).distinct()
    return (
        ids.join(tlose.withColumn("__t", F.lit(True)), "id", "left")
        .join(nlose.withColumn("__n", F.lit(True)), "id", "left")
        .join(elose.withColumn("__e", F.lit(True)), "id", "left")
        .select(
            "id",
            F.coalesce("__t", F.lit(False)).alias("text_dup"),
            F.coalesce("__n", F.lit(False)).alias("near_dup"),
            F.coalesce("__e", F.lit(False)).alias("emb_dup"))
        .withColumn(
            "dropped",
            F.col("text_dup") | F.col("near_dup") | F.col("emb_dup"))
    )


def _q_dataset_card(spark, sf_dir):
    """Per-(lang, source) data-card rollup
    (operators/textstats.dataset_card): docs, token/char mass,
    unique-digest count, min/max length — every column an exact integer,
    one partial-aggregated shuffle.  Oracle = the plain GROUP BY with the
    shared token-count fragment."""
    docs = _docs(spark, sf_dir).select("lang", "source", "text")
    return textstats.dataset_card(docs, strata_cols=["lang", "source"])


def _q_curriculum(spark, sf_dir):
    """Curriculum-learning phase assignment
    (operators/sampling.curriculum_buckets over the unigram-LM score):
    corpus ranked easy→hard by lm_logprob (doc_id tie-break) through the
    certified two-phase rank machinery, bucket = exact integer quantile
    (rank·8 div n).  Oracle = the LM-score CTE + ROW_NUMBER + the same
    integer division."""
    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    scored = textstats.unigram_logprob(docs)
    out = sampling.curriculum_buckets(
        scored, "lm_logprob", ["doc_id"], n_buckets=8)
    return out.select("doc_id", "bucket")


def _q_semantic_decontam(spark, sf_dir):
    """Embedding-space benchmark decontamination
    (operators/curation.semantic_decontaminate): every 25th corpus vector
    doubles as a held-out eval item (exact copy ⇒ cosine 1.0 planted
    hits), the eval side broadcast with precomputed norms; flagged train
    docs roll up to (vec_id, n_eval_hits, max_cos).  Oracle = all-pairs
    list_cosine_similarity at the same round-6 threshold."""
    emb = _emb(spark, sf_dir)
    train = emb.selectExpr(
        "CAST(vec_id AS BIGINT) AS vec_id",
        "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
    eval_ = emb.filter("vec_id % 25 = 0").selectExpr(
        "CAST(vec_id AS BIGINT) + 5000000 AS eval_id",
        "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
    return curation.semantic_decontaminate(train, eval_, threshold=0.98)


def _q_snapshot_diff(spark, sf_dir):
    """Time-travel changelog (store/warehouse.snapshot_diff over REAL
    snapshot commits): snapshot 1 holds the even documents, snapshot 2
    drops ids ≡ 4 (mod 10), adds ids ≡ 5 (mod 10), and rewrites the text
    of ids ≡ 0 (mod 6); the diff must report exactly those
    added/removed/changed keys.  Oracle = the same membership arithmetic
    as one CASE over documents."""
    import tempfile

    from crawler_to_md_spark.store.warehouse import (
        SnapshotStore, snapshot_diff,
    )

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text")
    store = SnapshotStore(
        spark, tempfile.mkdtemp(prefix="cms_snapdiff_"))
    store.commit({"corpus": docs.filter("doc_id % 2 = 0")}, batch_id=1)
    v2 = docs.filter(
        "(doc_id % 2 = 0 AND doc_id % 10 != 4) OR doc_id % 10 = 5"
    ).withColumn(
        "text",
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text")))
    store.commit({"corpus": v2}, batch_id=2)
    return snapshot_diff(store, "corpus", 1, 2, ["doc_id"])


def _q_dup_windows(spark, sf_dir):
    """Corpus-wide exact-substring duplication (operators/curation.py
    dup_window_fraction, the ExactSubstr document-level signal): every
    10-token window keeps its first (id, pos) occurrence corpus-wide;
    later copies count against their document.  Mirrored copies of every
    7th document are PLANTED (doc_id + 10^7) so the cross-document path
    provably fires — mirrors must report dup_fraction 1.0.  Oracle = the
    readable ROW_NUMBER first-occurrence form over the same planted
    union."""
    docs = corpus.load_documents(spark, sf_dir).select("doc_id", "text")
    mirrors = docs.filter("doc_id % 7 = 0").select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    return curation.dup_window_fraction(docs.union(mirrors), n=10)


def _q_host_quality_gate(spark, sf_dir):
    """Domain-level quality filtering (operators/curation.py
    host_quality_gate): per-host token-mass rollup, hosts whose mean page
    quality falls below the threshold are dropped WHOLESALE — the
    RefinedWeb/C4 rule that a junk domain poisons even its above-threshold
    pages.  The kept flag is the integer comparison total >= mean*n (no
    float division), so the host split is bit-stable across engines."""
    docs = _engine(spark, sf_dir).docs().filter("status = 'ok'")
    scored = docs.select(
        "url",
        urlkit.url_host(F.col("url")).alias("host"),
        interleaved.text_token_sum(F.col("spans")).alias("score"),
    )
    return curation.host_quality_gate(scored, min_mean=24).select(
        "url", "host")


def _q_pack_shards(spark, sf_dir):
    """Token-budget sequence packing (operators/packing.py): documents in
    doc_id order are concatenated into a continuous token stream cut at
    2048-token boundaries; each doc is assigned the shard its first token
    lands in.  The Spark side deliberately takes the SCALE path — the
    two-phase distributed prefix sum (range repartition + per-partition
    running sum + broadcast offsets), never a single-task global window —
    and the oracle certifies it equals DuckDB's plain window cumsum."""
    from crawler_to_md_spark.operators.packing import pack_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pack_shards(docs, budget=2048)


def _q_wet_roundtrip(spark, sf_dir):
    """Bulk-archive ingestion (sources/archive.py): the documents table
    serialized to a WET-lite archive (native-projection writer, one file
    per partition) and re-read through the SPLITTABLE record-boundary
    lineSep scan + Arrow-batched header/payload parse.  Output is the
    parsed-field + payload-digest view; the oracle recomputes the same
    view directly from the documents table, so any framing error, octet
    miscount, or payload corruption in the round trip hash-mismatches."""
    import tempfile

    from crawler_to_md_spark.sources import archive

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(F.lit("https://archive.example.org/"), F.col("source"),
                 F.lit("/"), F.col("doc_id").cast("string")).alias("url"),
        "lang", "text",
    ).repartition(8)
    path = tempfile.mkdtemp(prefix="entry_wet_") + "/wet"
    archive.write_wet(docs, path, id_col="doc_id", lang_col="lang")
    return archive.read_wet(spark, path).select(
        F.col("record_id").cast("long").alias("doc_id"),
        "url",
        F.col("language").alias("lang"),
        "content_length",
        F.md5("text").alias("digest"),
        F.col("corrupt").isNotNull().alias("corrupt"),
    )


WARC_HTML_SQL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || "
    "'</title></head><body><p>' || text || '</p></body></html>'"
)


def _q_warc_roundtrip(spark, sf_dir):
    """WARC-response archive ingestion (sources/archive.py write_warc /
    read_warc): documents wrapped as raw HTTP captures (status line, HTTP
    headers, octet-framed body — every 7th page a 404) and re-read
    through the same splittable record-boundary scan as WET.  The oracle
    rebuilds the HTTP block string in SQL and recomputes both octet
    Content-Lengths, so any framing or multi-byte miscount mismatches."""
    import tempfile

    from crawler_to_md_spark.sources import archive

    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "'https://archive.example.org/' || source || '/' "
        "|| CAST(doc_id AS STRING) AS url",
        "CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS status",
        f"{WARC_HTML_SQL} AS html",
    ).repartition(8)
    path = tempfile.mkdtemp(prefix="entry_warc_") + "/warc"
    archive.write_warc(docs, path, status_col="status", id_col="doc_id")
    return archive.read_warc(spark, path).select(
        F.col("record_id").cast("long").alias("doc_id"),
        "url", "kind",
        "status_code",
        "content_type",
        "content_length",
        F.md5("html").alias("digest"),
        F.col("corrupt").isNotNull().alias("corrupt"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corpus_class_histogram": _q_corpus_class_histogram,
        "corpus_host_pages": _q_corpus_host_pages,
        "corpus_edges": _q_corpus_edges,
        "crawl_seen_set": _q_crawl_seen_set,
        "crawl_wave_sizes": _q_crawl_wave_sizes,
        "crawl_retry_state": _q_crawl_retry_state,
        "crawl_docs_status": _q_crawl_docs_status,
        "crawl_visited_counts": _q_crawl_visited_counts,
        "crawl_metrics_totals": _q_crawl_metrics_totals,
        "page_markdown": _q_page_markdown,
        "page_titles": _q_page_titles,
        "url_filenames": _q_url_filenames,
        "export_relpaths": _q_export_relpaths,
        "seed_dedup": _q_seed_dedup,
        "text_stats": _q_text_stats,
        "decontam_report": _q_decontam_report,
        "repetition_stats": _q_repetition_stats,
        "line_dedup": _q_line_dedup,
        "pii_redact": _q_pii_redact,
        "mix_sample": _q_mix_sample,
        "mixture_report": _q_mixture_report,
        "lm_score": _q_lm_score,
        "exact_dedup": _q_exact_dedup,
        "minhash_near_dups": _q_minhash_near_dups,
        "embedding_topk": _q_embedding_topk,
        "embedding_ivf_topk": _q_embedding_ivf_topk,
        "simhash_near_pairs": _q_simhash_near_pairs,
        "media_stats": _q_media_stats,
        "media_features": _q_media_features,
        "video_frame_sample": _q_video_frame_sample,
        "media_resize": _q_media_resize,
        "ngram_jaccard_dups": _q_ngram_jaccard_dups,
        "embedding_near_dups": _q_embedding_near_dups,
        "stream_schedule": _q_stream_schedule,
        "stream_ingest": _q_stream_ingest,
        "stream_near_ingest": _q_stream_near_ingest,
        "stream_admission": _q_stream_admission,
        "host_windows": _q_host_windows,
        "robots_gate": _q_robots_gate,
        "priority_schedule": _q_priority_schedule,
        "pack_shards": _q_pack_shards,
        "crawl_training_shards": _q_crawl_training_shards,
        "crawl_clean_shards": _q_crawl_clean_shards,
        "quality_dedup_pipeline": _q_quality_dedup_pipeline,
        "near_dup_components": _q_near_dup_components,
        "cuckoo_purge_schedule": _q_cuckoo_purge_schedule,
        "media_manifest": _q_media_manifest,
        "span_stats": _q_span_stats,
        "pack_multimodal": _q_pack_multimodal,
        "host_quality_gate": _q_host_quality_gate,
        "host_pagerank": _q_host_pagerank,
        "media_context": _q_media_context,
        "section_chunks": _q_section_chunks,
        "adaptive_schedule": _q_adaptive_schedule,
        "anchor_index": _q_anchor_index,
        "dup_windows": _q_dup_windows,
        "exact_substr_cut": _q_exact_substr_cut,
        "crawl_report": _q_crawl_report,
        "soft404_report": _q_soft404_report,
        "trap_report": _q_trap_report,
        "mirror_hosts": _q_mirror_hosts,
        "shuffle_split": _q_shuffle_split,
        "snapshot_diff": _q_snapshot_diff,
        "semantic_decontam": _q_semantic_decontam,
        "curriculum": _q_curriculum,
        "dataset_card": _q_dataset_card,
        "multi_dedup": _q_multi_dedup,
        "wet_roundtrip": _q_wet_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "embedding_lsh_topk": _q_embedding_lsh_topk,
        "audio_window_sample": _q_audio_window_sample,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same fragments, independent recomputation)
# ---------------------------------------------------------------------------


def _sql_url(g: str) -> str:
    return corpus.URL_SQL.format(g=g)


def oracle_sql() -> dict[str, str]:
    g = "m.g"
    # markdown reconstruction mirrors spans_to_markdown_expr block by block
    paras = (
        "list_filter(list_transform(range(0, (m.g % 3) + 1), "
        "j -> trim(substr(m.text, 1 + j * 37, 60))), s -> s <> '')"
    )
    heading = "'# Doc ' || CAST(m.g AS STRING)"
    image = (
        f"CASE WHEN {corpus.HAS_IMAGE_SQL.format(g=g)} "
        f"THEN ['![](' || {corpus.IMAGE_REF_SQL.format(g=g)} || ')'] "
        "ELSE [] END"
    )
    code = (
        f"CASE WHEN {corpus.HAS_CODE_SQL.format(g=g)} "
        f"THEN ['```' || chr(10) || {corpus.CODE_SQL.format(g=g)} || chr(10) || '```'] "
        "ELSE [] END"
    )
    markdown = (
        f"array_to_string(list_concat(list_concat(list_concat([{heading}], "
        f"{paras}), {image}), {code}), chr(10) || chr(10))"
    )
    # interleaved span-structure fragments (operators/interleaved.py twins):
    # text spans = heading ('Doc g' = 2 tokens) + non-empty paras + code
    # ('print(g)' = 1 token); media = the image span; links only on 'ok'
    # pages (transient pages carry no link spans in the corpus)
    has_img = f"CASE WHEN {corpus.HAS_IMAGE_SQL.format(g=g)} THEN 1 ELSE 0 END"
    has_code = f"CASE WHEN {corpus.HAS_CODE_SQL.format(g=g)} THEN 1 ELSE 0 END"
    text_tokens = (
        f"2 + coalesce(list_sum(list_transform({paras}, "
        f"p -> len(string_split(p, ' ')))), 0) + {has_code}"
    )
    # link spans per 'ok' page: children 1..3 gated on < p_total, the cross
    # link always, one junk link for g%5 in (0,1,2,4), the duplicate
    # child-1 link for g%5 = 3 (again gated on child 1 existing)
    n_links = (
        "CAST((3*m.g+1 < m.p_total) AS BIGINT)"
        " + CAST((3*m.g+2 < m.p_total) AS BIGINT)"
        " + CAST((3*m.g+3 < m.p_total) AS BIGINT) + 1"
        " + CASE WHEN m.g % 5 = 3 THEN CAST((3*m.g+1 < m.p_total) AS BIGINT)"
        " ELSE 1 END"
    )

    return {
        "corpus_class_histogram": f"""
            {_meta_cte()}
            SELECT cls, CAST(count(*) AS BIGINT) AS n_pages
            FROM corpus_meta WHERE cls <> 'missing' GROUP BY cls
        """,
        "corpus_host_pages": f"""
            {_meta_cte()}
            SELECT host, CAST(count(*) AS BIGINT) AS n_pages
            FROM corpus_meta WHERE cls <> 'missing' GROUP BY host
        """,
        "corpus_edges": f"""
            {_meta_cte()}
            SELECT s.url AS src_url, {_sql_url('e.dst')} AS dst_url
            FROM corpus_edges e JOIN corpus_meta s ON s.g = e.src
        """,
        "crawl_seen_set": f"""
            {_reach_cte()}
            SELECT {_sql_url('r.g')} AS url, CAST(r.depth AS BIGINT) AS depth
            FROM corpus_reach r
        """,
        "crawl_wave_sizes": f"""
            {_reach_cte()}
            SELECT CAST(depth AS BIGINT) AS depth,
                   CAST(count(*) AS BIGINT) AS n_urls
            FROM corpus_reach GROUP BY depth
        """,
        "crawl_retry_state": f"""
            {_reach_cte()}
            SELECT {_sql_url('m.g')} AS url,
                   CAST({_RETRY_CASE} AS BIGINT) AS retry_count
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
        """,
        "crawl_docs_status": f"""
            {_reach_cte()}
            SELECT {_sql_url('m.g')} AS url, {_STATUS_CASE} AS status
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
            WHERE {_STATUS_CASE} IS NOT NULL
        """,
        "crawl_visited_counts": f"""
            {_reach_cte()}
            SELECT CAST(count(*) AS BIGINT) AS total_links,
                   CAST(count(*) AS BIGINT) AS visited_links
            FROM corpus_reach
        """,
        "crawl_metrics_totals": f"""
            {_reach_cte()}
            SELECT CAST(sum({_ATTEMPTS_CASE}) AS BIGINT) AS total_dequeued,
                   CAST(sum(CASE WHEN cls IN ('ok','transient') THEN 1 ELSE 0 END)
                        AS BIGINT) AS total_fetched_ok,
                   CAST(sum(CASE WHEN cls = 'transient' THEN 1
                            WHEN cls IN ('http500','http429','empty','missing')
                            THEN {MAX_RETRIES} ELSE 0 END) AS BIGINT)
                        AS total_failed,
                   CAST(sum(CASE WHEN cls IN ('http404','http403','pdf')
                            THEN 1 ELSE 0 END) AS BIGINT) AS total_skipped
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
        """,
        "page_markdown": f"""
            {_reach_cte()}
            SELECT m.url AS url, {markdown} AS markdown
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
            WHERE m.cls IN ('ok', 'transient')
        """,
        "page_titles": f"""
            {_reach_cte()}
            SELECT m.url AS url,
                   {corpus.TITLE_SQL.format(g='m.g', text='m.text')} AS title
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
            WHERE m.cls IN ('ok', 'transient')
        """,
        "url_filenames": f"""
            {_meta_cte()}
            SELECT url,
                   regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(url, '^[a-z]+://', ''),
                       '[/.]', '_', 'g'), '_+', '_', 'g'), '^_|_$', '', 'g')
                   AS filename
            FROM corpus_meta WHERE cls <> 'missing'
        """,
        "export_relpaths": f"""
            {_meta_cte()}
            SELECT url,
                   CASE WHEN regexp_replace(url, '^https?://', '') = ''
                             OR regexp_replace(url, '^https?://', '') LIKE '%/'
                        THEN regexp_replace(url, '^https?://', '') || 'index.md'
                        ELSE regexp_replace(url, '^https?://', '') || '.md' END
                   AS relpath
            FROM corpus_meta WHERE cls <> 'missing'
        """,
        "seed_dedup": f"""
            {_meta_cte()},
            seed_variants AS (
                SELECT m.g * 3 AS seed_seq, m.url AS raw FROM corpus_meta m
                WHERE m.g < 60 AND m.cls <> 'missing'
                UNION ALL
                SELECT m.g * 3 + 1, upper(m.url) || '#X' FROM corpus_meta m
                WHERE m.g < 60 AND m.cls <> 'missing'
                UNION ALL
                SELECT m.g * 3 + 2, m.url FROM corpus_meta m
                WHERE m.g < 60 AND m.cls <> 'missing'
            ),
            canon AS (
                -- canonicalize: defrag + lowercase scheme/host (urls here
                -- have no port/userinfo so lowercasing the whole authority
                -- and scheme is exact)
                SELECT seed_seq,
                       lower(split_part(split_part(raw, '#', 1), '://', 1))
                       || '://'
                       || lower(split_part(split_part(split_part(raw, '#', 1),
                                '://', 2), '/', 1))
                       || regexp_extract(split_part(raw, '#', 1),
                                         '^[^:]+://[^/]+(/.*)?$', 1)
                       AS url
                FROM seed_variants
            )
            SELECT CAST(min(seed_seq) AS BIGINT) AS first_seq, url
            FROM canon GROUP BY url
        """,
        "text_stats": textstats.duck_text_stats_sql(),
        "decontam_report": curation.duck_decontaminate_sql(
            "decontam_train", "decontam_bench", k=DECONTAM_K,
            prelude=f"""
            decontam_bench AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
                WHERE doc_id % {DECONTAM_BENCH_MOD} = {DECONTAM_BENCH_REM}
            ),
            decontam_train AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
                WHERE doc_id % {DECONTAM_BENCH_MOD} <> {DECONTAM_BENCH_REM}
                UNION ALL
                SELECT CAST(doc_id + 3000000 AS BIGINT), 'contam ' || text
                FROM documents
                WHERE doc_id % {DECONTAM_PLANT_MOD} = {DECONTAM_BENCH_REM}
            ),"""),
        "repetition_stats": curation.duck_repetition_sql(),
        "line_dedup": curation.duck_line_dedup_sql(
            "ml_docs",
            prelude=f"""
            ml_docs AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       '{BOILER}' || chr(10) || array_to_string(
                           list_transform(
                               range(0, CAST(ceil(
                                   len(string_split(trim(text), ' '))
                                   / {LINE_WIDTH}.0) AS BIGINT)),
                               j -> array_to_string(list_slice(
                                   string_split(trim(text), ' '),
                                   j * {LINE_WIDTH} + 1,
                                   j * {LINE_WIDTH} + {LINE_WIDTH}), ' ')),
                           chr(10)) AS text
                FROM documents
            ),"""),
        "pii_redact": privacy.pii_oracle_sql(
            f"({_PII_DOCS_DUCK})", other_cols=["doc_id"]),
        "mix_sample": f"""
            WITH ranked AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR))
                       ) AS rn,
                       CASE lang {' '.join(
                           f"WHEN '{lang}' THEN {cap}"
                           for lang, cap in sorted(MIX_CAPS.items()))}
                       END AS cap
                FROM documents
            )
            SELECT doc_id, lang FROM ranked WHERE rn <= cap
        """,
        "mixture_report": """
            WITH per AS (
                SELECT lang, source,
                       count(*) AS docs,
                       CAST(sum(len(string_split(trim(text), ' ')))
                            AS BIGINT) AS weight
                FROM documents GROUP BY 1, 2
            ),
            tot AS (SELECT sum(weight) AS total FROM per)
            SELECT lang, source, docs, weight,
                   round(weight / CAST(total AS DOUBLE), 6) AS share
            FROM per, tot
        """,
        "lm_score": textstats.duck_unigram_logprob_sql(),
        "exact_dedup": dedup.duck_exact_dups_sql(),
        "minhash_near_dups": dedup.duck_brute_force_near_dups_sql(threshold=0.5),
        "embedding_topk": similarity.duck_brute_force_topk_sql(n_queries=8, k=10),
        "embedding_lsh_topk": similarity.duck_lsh_topk_sql(
            EMB_DIM, n_queries=8, k=10, n_bands=8),
        "embedding_ivf_topk": similarity.duck_ivf_topk_sql(
            n_queries=8, k=10, n_centroids=16, n_probe=2),
        "simhash_near_pairs": similarity.duck_simhash_near_pairs_sql(
            EMB_DIM, max_hamming=8),
        "media_stats": multimodal.duck_media_stats_sql(),
        "media_features": multimodal.duck_media_features_sql(),
        "video_frame_sample": multimodal.duck_video_frames_sql(every_n=3),
        "audio_window_sample": multimodal.duck_audio_windows_sql(
            window_s=4, hop_s=2),
        "media_resize": multimodal.duck_resized_media_sql(224, 224),
        "ngram_jaccard_dups": dedup.duck_ngram_jaccard_sql(threshold=0.5),
        "embedding_near_dups": similarity.duck_embedding_near_dups_sql(
            EMB_DIM, threshold=0.9),
        "stream_schedule": f"""
            {_meta_cte()},
            first_seen AS (
                SELECT e.dst, CAST(min(e.src % {STREAM_GROUPS}) AS BIGINT)
                       AS epoch
                FROM corpus_edges e GROUP BY e.dst
            )
            SELECT {_sql_url('f.dst')} AS url,
                   {corpus.HOST_SQL.format(g='f.dst')} AS host,
                   f.epoch
            FROM first_seen f
        """,
        "robots_gate": f"""
            {_meta_cte()}
            SELECT url FROM corpus_meta
            WHERE cls <> 'missing'
              AND NOT (({corpus.HOST_ID_SQL.format(g='g')}) % 2 = 0
                       AND CAST(g AS VARCHAR) LIKE '2%'
                       AND CAST(g AS VARCHAR) NOT LIKE '21%')
        """,
        "quality_dedup_pipeline": dedup.duck_quality_dedup_sql(min_tokens=40),
        "near_dup_components": dedup.duck_near_dup_components_sql(threshold=0.5),
        "cuckoo_purge_schedule": f"""
            {_meta_cte()}
            SELECT url FROM corpus_meta
            WHERE cls <> 'missing'
              AND NOT (g % 2 = 0 AND g % 4 <> 0)
        """,
        "pack_shards": packing.duck_pack_shards_sql(budget=2048),
        "wet_roundtrip": """
            SELECT doc_id,
                   'https://archive.example.org/' || source || '/'
                       || CAST(doc_id AS VARCHAR) AS url,
                   lang,
                   CAST(octet_length(encode(text)) AS BIGINT)
                       AS content_length,
                   md5(text) AS digest,
                   false AS corrupt
            FROM documents
        """,
        "media_manifest": f"""
            {_reach_cte()}
            SELECT {corpus.IMAGE_REF_SQL.format(g=g)} AS media_ref,
                   'image' AS kind,
                   CAST(CASE WHEN m.g % {CLEAN_MOD} = 0 THEN 2 ELSE 1 END
                        AS BIGINT) AS n_refs,
                   m.url AS first_url
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
            WHERE m.cls IN ('ok', 'transient')
              AND {corpus.HAS_IMAGE_SQL.format(g=g)}
        """,
        "span_stats": f"""
            {_reach_cte()},
            pages AS (
                SELECT m.url AS url,
                       CAST(len({paras}) AS BIGINT) AS n_paras,
                       CAST({text_tokens} AS BIGINT) AS n_text_tokens,
                       CAST({has_img} AS BIGINT) AS n_media,
                       CAST({has_code} AS BIGINT) AS n_code,
                       CASE WHEN m.cls = 'ok'
                            THEN CAST({n_links} AS BIGINT)
                            ELSE 0 END AS n_links
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient')
            )
            SELECT url,
                   CAST(1 + n_paras + n_media + n_code + n_links AS BIGINT)
                       AS n_spans,
                   CAST(1 + n_paras + n_code AS BIGINT) AS n_text_spans,
                   n_media AS n_media_spans,
                   n_links AS n_link_spans,
                   n_text_tokens,
                   round(n_media * 100 / greatest(n_text_tokens, 1), 6)
                       AS media_per_100_tokens
            FROM pages
        """,
        "crawl_report": f"""
            {_reach_cte()}
            SELECT {corpus.HOST_SQL.format(g='m.g')} AS host,
                   CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(max(r.depth) AS BIGINT) AS max_depth,
                   CAST(count(*) FILTER (
                       WHERE m.cls IN ('ok', 'transient')) AS BIGINT) AS n_ok,
                   CAST(count(*) FILTER (
                       WHERE m.cls IN ('http500', 'http429', 'empty',
                                       'missing')) AS BIGINT) AS n_failed
            FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
            GROUP BY 1
        """,
        "soft404_report": crawlhealth.duck_soft404_sql(
            "pages", min_pages=3, share_num=1, share_den=5,
            prelude_ctes=f"""pages AS (
                SELECT {corpus.HOST_SQL.format(g='doc_id')} AS host,
                       {corpus.URL_SQL.format(g='doc_id')} AS url,
                       {SOFT404_TEXT_SQL} AS text
                FROM documents
            )"""),
        "trap_report": crawlhealth.duck_trap_sql(
            "urls", min_urls=50,
            prelude_ctes=f"""urls AS (
                SELECT {corpus.HOST_SQL.format(g='doc_id')} AS host,
                       {corpus.URL_SQL.format(g='doc_id')} AS url
                FROM documents
                UNION ALL
                SELECT host, {TRAP_URL_SQL} AS url
                FROM (SELECT {corpus.HOST_SQL.format(g='doc_id')} AS host,
                             doc_id
                      FROM documents WHERE doc_id % 2 = 0) s,
                     range(0, 20) t(d)
            )"""),
        "shuffle_split": sampling.duck_split_shuffle_sql(
            "documents", "doc_id", SPLITS),
        "mirror_hosts": f"""
            WITH RECURSIVE pages AS (
                SELECT {corpus.HOST_SQL.format(g='doc_id')} AS host, text
                FROM documents
                UNION ALL
                SELECT 'mirror-' || {corpus.HOST_SQL.format(g='doc_id')}
                           AS host, text
                FROM documents WHERE doc_id % 2 = 0
            ),
            hd AS (SELECT DISTINCT host, md5(text) AS digest FROM pages),
            pd AS (SELECT digest, count(*) AS nh FROM hd GROUP BY 1),
            common AS (
                SELECT hd.host, hd.digest FROM hd
                JOIN pd USING (digest) WHERE nh <= 20
            ),
            raw_pairs AS (
                SELECT a.host AS host_a, b.host AS host_b,
                       count(*) AS n_shared
                FROM common a JOIN common b USING (digest)
                WHERE a.host < b.host
                GROUP BY 1, 2
            ),
            sizes AS (SELECT host, count(*) AS nd FROM hd GROUP BY 1),
            pairs AS (
                SELECT host_a, host_b, n_shared
                FROM raw_pairs
                JOIN sizes sa ON sa.host = raw_pairs.host_a
                JOIN sizes sb ON sb.host = raw_pairs.host_b
                WHERE n_shared >= 3
                  AND n_shared * 2 >= 1 * least(sa.nd, sb.nd)
            ),
            edges AS (
                SELECT host_a AS u, host_b AS v FROM pairs
                UNION
                SELECT host_b, host_a FROM pairs
            ),
            reach(node, comp) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
            )
            SELECT node AS host, min(comp) AS mirror_group
            FROM reach GROUP BY node
        """,
        "multi_dedup": f"""
            WITH {dedup._duck_pairs_ctes("documents", 0.5, 3)},
            tcorp AS (
                SELECT CAST(doc_id AS BIGINT) AS id, text FROM dup_corpus
            ),
            keep AS (
                SELECT md5(text) AS digest, count(*) AS n,
                       min(id) AS keeper
                FROM tcorp GROUP BY 1
            ),
            tlose AS (
                SELECT t.id FROM tcorp t
                JOIN keep k ON md5(t.text) = k.digest
                WHERE k.n > 1 AND t.id != k.keeper
            ),
            nlose AS (
                SELECT DISTINCT doc_b AS id FROM nd_pairs
            ),
            ecorp AS (
                SELECT CAST(vec_id AS BIGINT) AS id,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
                UNION ALL
                SELECT CAST(vec_id AS BIGINT) + 1000000,
                       list_transform(
                           range(1, len(CAST(embedding AS DOUBLE[])) + 1),
                           i -> CAST(embedding AS DOUBLE[])[i]
                                * (1.0 + 0.05 * (((i - 1) % 3) - 1)))
                FROM embeddings WHERE vec_id % 9 = 0
            ),
            elose AS (
                SELECT DISTINCT b.id FROM ecorp a JOIN ecorp b
                  ON a.id < b.id
                WHERE round(list_cosine_similarity(a.emb, b.emb), 6) >= 0.9
            ),
            ids AS (
                SELECT id FROM tcorp UNION SELECT id FROM ecorp
            )
            SELECT i.id,
                   i.id IN (SELECT id FROM tlose) AS text_dup,
                   i.id IN (SELECT id FROM nlose) AS near_dup,
                   i.id IN (SELECT id FROM elose) AS emb_dup,
                   (i.id IN (SELECT id FROM tlose)
                    OR i.id IN (SELECT id FROM nlose)
                    OR i.id IN (SELECT id FROM elose)) AS dropped
            FROM ids i
        """,
        "dataset_card": f"""
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum({textstats.DUCK_TOKEN_COUNT.format(t='text')})
                        AS BIGINT) AS n_tokens,
                   CAST(sum(length(text)) AS BIGINT) AS n_chars,
                   CAST(count(DISTINCT md5(text)) AS BIGINT)
                       AS n_unique_digests,
                   CAST(min(length(text)) AS BIGINT) AS min_chars,
                   CAST(max(length(text)) AS BIGINT) AS max_chars
            FROM documents GROUP BY 1, 2
        """,
        "curriculum": f"""
            WITH scored AS ({textstats.duck_unigram_logprob_sql()})
            SELECT doc_id,
                   CAST(((row_number() OVER (ORDER BY lm_logprob, doc_id)
                          - 1) * 8) // t.cnt AS BIGINT) AS bucket
            FROM scored, (SELECT count(*) AS cnt FROM scored) t
        """,
        "warc_roundtrip": f"""
            WITH pages AS (
                SELECT doc_id,
                       'https://archive.example.org/' || source || '/'
                           || CAST(doc_id AS VARCHAR) AS url,
                       CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END
                           AS status,
                       {WARC_HTML_SQL} AS html
                FROM documents
            ),
            blocks AS (
                SELECT *,
                       'HTTP/1.1 ' || CAST(status AS VARCHAR) || ' ' ||
                       CASE WHEN status = 200 THEN 'OK'
                            ELSE 'Not Found' END ||
                       chr(13) || chr(10) ||
                       'Content-Type: text/html' || chr(13) || chr(10) ||
                       'Content-Length: ' ||
                       CAST(octet_length(encode(html)) AS VARCHAR) ||
                       chr(13) || chr(10) || chr(13) || chr(10) || html
                           AS block
                FROM pages
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
                   'response' AS kind,
                   CAST(status AS BIGINT) AS status_code,
                   'text/html' AS content_type,
                   CAST(octet_length(encode(block)) AS BIGINT)
                       AS content_length,
                   md5(html) AS digest,
                   false AS corrupt
            FROM blocks
        """,
        "snapshot_diff": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN doc_id % 10 = 5 THEN 'added'
                        WHEN doc_id % 10 = 4 THEN 'removed'
                        WHEN doc_id % 6 = 0 THEN 'changed' END AS change
            FROM documents
            WHERE doc_id % 10 = 5
               OR (doc_id % 2 = 0 AND (doc_id % 10 = 4 OR doc_id % 6 = 0))
        """,
        "semantic_decontam": curation.duck_semantic_decontam_sql(
            "train", "ev", threshold=0.98,
            prelude_ctes="""train AS (
                SELECT CAST(vec_id AS BIGINT) AS vec_id,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
            ),
            ev AS (
                SELECT CAST(vec_id AS BIGINT) + 5000000 AS eval_id,
                       CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings WHERE vec_id % 25 = 0
            )"""),
        "dup_windows": curation.duck_dup_window_sql(
            docs_rel="train", n=10,
            prelude_ctes="""train AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 7 = 0
            )"""),
        "exact_substr_cut": curation.duck_exact_substr_sql(
            docs_rel="train", n=10,
            prelude_ctes="""train AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id, text
                FROM documents WHERE doc_id % 7 = 0
            )"""),
        "anchor_index": f"""
            {_meta_cte()},
            parsed AS (
                SELECT g, p_total FROM corpus_meta
                WHERE cls IN ('ok', 'empty')
            ),
            anchor_edges AS (
                SELECT g AS src, 3*g+1 AS dst, 'child 1' AS anchor
                FROM parsed WHERE 3*g+1 < p_total
                UNION ALL SELECT g, 3*g+2, 'child 2'
                FROM parsed WHERE 3*g+2 < p_total
                UNION ALL SELECT g, 3*g+3, 'child 3'
                FROM parsed WHERE 3*g+3 < p_total
                UNION ALL SELECT g, (7*g+11) % p_total, 'cross' FROM parsed
                UNION ALL SELECT g, 3*g+1, 'dup of child 1'
                FROM parsed WHERE g % 5 = 3 AND 3*g+1 < p_total
            ),
            cites AS (SELECT DISTINCT src, dst, anchor FROM anchor_edges),
            anchor_counts AS (
                SELECT dst, anchor, CAST(count(*) AS BIGINT) AS n_refs
                FROM cites GROUP BY dst, anchor
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY dst ORDER BY n_refs DESC, anchor) AS rn
                FROM anchor_counts
            )
            SELECT {_sql_url('dst')} AS url, anchor, n_refs
            FROM ranked WHERE rn <= 3
        """,
        "adaptive_schedule": f"""
            {_reach_cte()},
            failed_hosts AS (
                SELECT {corpus.HOST_SQL.format(g='m.g')} AS host,
                       count(*) AS nf
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('http500', 'http429', 'empty', 'missing')
                GROUP BY 1
            ),
            budgets AS (
                SELECT host,
                       GREATEST(1, 8 // CAST(pow(2, LEAST(nf, 5)) AS BIGINT))
                           AS b
                FROM failed_hosts
            ),
            frontier AS (
                SELECT url, host,
                       CAST(g % 3 AS BIGINT) AS priority,
                       CAST(g % 5 AS BIGINT) AS depth
                FROM corpus_meta WHERE cls <> 'missing'
            ),
            ranked AS (
                SELECT f.*, COALESCE(b.b, 8) AS b,
                       row_number() OVER (
                           PARTITION BY f.host
                           ORDER BY priority, depth, url) AS rn
                FROM frontier f LEFT JOIN budgets b USING (host)
            )
            SELECT url, host, priority, depth FROM ranked
            WHERE rn <= b
            ORDER BY priority, depth, url
            LIMIT 80
        """,
        "media_context": f"""
            {_reach_cte()},
            ctx_pages AS (
                SELECT m.url AS url, m.g AS g, m.text AS text
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient') AND m.g % 2 = 0
            )
            SELECT url,
                   {corpus.IMAGE_REF_SQL.format(g='g')} AS media_ref,
                   'image' AS kind,
                   COALESCE(
                     CASE WHEN g % 3 >= 2
                          AND {corpus.PARA_SQL.format(text='text', j=2)} <> ''
                          THEN {corpus.PARA_SQL.format(text='text', j=2)} END,
                     CASE WHEN g % 3 >= 1
                          AND {corpus.PARA_SQL.format(text='text', j=1)} <> ''
                          THEN {corpus.PARA_SQL.format(text='text', j=1)} END,
                     CASE WHEN {corpus.PARA_SQL.format(text='text', j=0)} <> ''
                          THEN {corpus.PARA_SQL.format(text='text', j=0)} END,
                     'Doc ' || CAST(g AS STRING)) AS context_before,
                   CASE WHEN g % 7 = 3
                        THEN {corpus.CODE_SQL.format(g='g')} END
                       AS context_after
            FROM ctx_pages
        """,
        "section_chunks": """
            WITH d AS (
                SELECT doc_id, string_split(trim(text), ' ') AS toks
                FROM documents
            ),
            fan AS (
                SELECT doc_id, toks,
                       CAST(unnest(range(0, (len(toks) + 7) // 8)) AS BIGINT)
                           AS i
                FROM d
            ),
            ch AS (
                SELECT doc_id, i,
                       array_to_string(
                         toks[CAST(8*i+1 AS BIGINT) : CAST(8*i+8 AS BIGINT)],
                         ' ') AS chunk
                FROM fan
            ),
            grouped AS (
                SELECT doc_id, i // 4 AS grp,
                       CAST(count(*) + count(*) FILTER (WHERE i % 5 = 2)
                            AS BIGINT) AS n_spans,
                       min(CASE WHEN i % 4 = 0 THEN chunk END) AS heading,
                       string_agg(chunk, chr(10) ORDER BY i) AS text
                FROM ch GROUP BY doc_id, grp
            )
            SELECT doc_id, CAST(grp + 1 AS BIGINT) AS section_id,
                   heading, n_spans, text
            FROM grouped
        """,
        "host_pagerank": f"""
            {_meta_cte()},
            pr_hedges AS (
                SELECT DISTINCT {corpus.HOST_SQL.format(g='e.src')} AS src,
                                {corpus.HOST_SQL.format(g='e.dst')} AS dst
                FROM corpus_edges e
                WHERE ({corpus.HOST_ID_SQL.format(g='e.src')})
                      <> ({corpus.HOST_ID_SQL.format(g='e.dst')})
            ),
            pr_nodes AS (
                SELECT src AS node FROM pr_hedges
                UNION SELECT dst FROM pr_hedges
            ),
            pr_deg AS (
                SELECT src, CAST(count(*) AS BIGINT) AS deg
                FROM pr_hedges GROUP BY src
            ),
            pr_e AS (
                SELECT h.src, h.dst, d.deg
                FROM pr_hedges h JOIN pr_deg d USING (src)
            ),
            {_pagerank_ctes(iters=3)}
            SELECT node AS host, r AS rank_units FROM pr3
        """,
        "host_quality_gate": f"""
            {_reach_cte()},
            pages AS (
                SELECT m.url AS url, m.host AS host,
                       CAST({text_tokens} AS BIGINT) AS score
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient')
            ),
            kept_hosts AS (
                SELECT host FROM pages GROUP BY host
                HAVING sum(score) >= 24 * count(*)
            )
            SELECT p.url AS url, p.host AS host
            FROM pages p JOIN kept_hosts USING (host)
        """,
        "pack_multimodal": f"""
            {_reach_cte()},
            weighted AS (
                SELECT m.url AS url,
                       CAST({text_tokens} AS BIGINT) AS n_text_tokens,
                       CAST({has_img} AS BIGINT) AS n_media
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient')
            ),
            costed AS (
                SELECT url, n_text_tokens, n_media,
                       CAST(n_text_tokens + 64 * n_media AS BIGINT) AS cost
                FROM weighted
            ),
            summed AS (
                SELECT *, SUM(cost) OVER (
                    ORDER BY url
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - cost AS start_tok
                FROM costed
            )
            SELECT url, n_text_tokens, n_media, cost,
                   CAST(floor(start_tok / 512) AS BIGINT) AS shard_id,
                   CAST(start_tok % 512 AS BIGINT) AS shard_offset
            FROM summed
        """,
        "crawl_training_shards": f"""
            {_reach_cte()},
            crawled AS (
                SELECT m.url AS url, {markdown} AS md
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient')
            ),
            gated AS (
                SELECT url,
                       CAST(len(string_split(trim(md), ' ')) AS BIGINT)
                           AS n_tokens
                FROM crawled
                WHERE CAST(len(string_split(trim(md), ' ')) AS BIGINT) >= 10
            ),
            summed AS (
                SELECT *, SUM(n_tokens) OVER (
                    ORDER BY url
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens AS start_tok
                FROM gated
            )
            SELECT url, n_tokens,
                   CAST(floor(start_tok / 512) AS BIGINT) AS shard_id,
                   CAST(start_tok % 512 AS BIGINT) AS shard_offset
            FROM summed
        """,
        "crawl_clean_shards": f"""
            {_reach_cte()},
            crawled AS (
                SELECT m.url AS url, m.g AS did, {markdown} AS md
                FROM corpus_reach r JOIN corpus_meta m ON m.g = r.g
                WHERE m.cls IN ('ok', 'transient')
            ),
            planted AS (
                SELECT url, did, md FROM crawled
                UNION ALL
                SELECT url || '?mirror=1', did + 10000000, md
                FROM crawled WHERE did % {CLEAN_MOD} = 0
                UNION ALL
                SELECT url || '?near=1', did + 20000000,
                       md || '{CLEAN_NEAR_SUFFIX}'
                FROM crawled WHERE did % {CLEAN_MOD} = {CLEAN_NEAR_REM}
            ),
            gated AS (
                SELECT url, did, md,
                       CAST(len(string_split(trim(md), ' ')) AS BIGINT)
                           AS n_tokens
                FROM planted
                WHERE len(string_split(trim(md), ' ')) >= 10
            ),
            dg_keepers AS (
                SELECT md5(md) AS dg, min(did) AS kdid FROM gated GROUP BY 1
            ),
            exact_kept AS (
                SELECT g.* FROM gated g JOIN dg_keepers k
                ON md5(g.md) = k.dg AND g.did = k.kdid
            ),
            clean_sh AS (
                SELECT did,
                       list_distinct(list_transform(
                           range(0, greatest(
                               len(string_split(trim(md), ' ')) - 3, 0) + 1),
                           i -> array_to_string(list_slice(
                               string_split(trim(md), ' '), i + 1, i + 3),
                               ' '))) AS s
                FROM exact_kept
            ),
            clean_pairs AS (
                SELECT a.did AS u, b.did AS v
                FROM clean_sh a JOIN clean_sh b ON a.did < b.did
                WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                            / len(list_distinct(list_concat(a.s, b.s))), 6)
                      >= 0.5
            ),
            clean_edges AS (
                SELECT u, v FROM clean_pairs
                UNION SELECT v, u FROM clean_pairs
            ),
            clean_reach(node, comp) AS (
                SELECT u, u FROM clean_edges
                UNION
                SELECT e.v, r.comp
                FROM clean_reach r JOIN clean_edges e ON e.u = r.node
            ),
            clean_losers AS (
                SELECT node FROM (
                    SELECT node, min(comp) AS comp FROM clean_reach
                    GROUP BY node
                ) WHERE node <> comp
            ),
            cleaned AS (
                SELECT k.url, k.n_tokens FROM exact_kept k
                LEFT JOIN clean_losers l ON k.did = l.node
                WHERE l.node IS NULL
            ),
            clean_summed AS (
                SELECT url, n_tokens, SUM(n_tokens) OVER (
                    ORDER BY url
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) - n_tokens AS start_tok
                FROM cleaned
            )
            SELECT url, n_tokens,
                   CAST(floor(start_tok / 512) AS BIGINT) AS shard_id,
                   CAST(start_tok % 512 AS BIGINT) AS shard_offset
            FROM clean_summed
        """,
        "priority_schedule": f"""
            {_meta_cte()},
            frontier AS (
                SELECT url, host,
                       CAST(g % 3 AS BIGINT) AS priority,
                       CAST(g % 5 AS BIGINT) AS depth
                FROM corpus_meta WHERE cls <> 'missing'
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY host ORDER BY priority, depth, url) AS rn
                FROM frontier
            )
            SELECT url, host, priority, depth FROM ranked
            WHERE rn <= 3
            ORDER BY priority, depth, url
            LIMIT 50
        """,
        "stream_ingest": """
            WITH docs AS (
                SELECT CAST(doc_id % 3 AS INT) AS grp,
                       'doc://' || CAST(doc_id AS VARCHAR) AS url, text,
                       CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                           AS n_tokens
                FROM documents
            ),
            gated AS (SELECT * FROM docs WHERE n_tokens >= 40),
            firsts AS (
                SELECT md5(text) AS digest, CAST(min(grp) AS BIGINT) AS epoch
                FROM gated GROUP BY 1
            )
            SELECT f.digest, min(d.url) AS url, min(d.n_tokens) AS n_tokens,
                   f.epoch
            FROM firsts f
            JOIN gated d ON md5(d.text) = f.digest AND d.grp = f.epoch
            GROUP BY f.digest, f.epoch
        """,
        "stream_near_ingest": f"""
            WITH near_docs AS (
                SELECT doc_id % {NEAR_FAMS} AS fam,
                       CAST(doc_id % 3 AS BIGINT) AS epoch,
                       'doc://' || CAST(doc_id AS VARCHAR) AS url,
                       array_to_string(list_transform(
                           range(1, {NEAR_BASE_TOKENS} + 1),
                           i -> 'w' || CAST(doc_id % {NEAR_FAMS} AS VARCHAR)
                                || 'x' || CAST(i AS VARCHAR)), ' ')
                         || ' u' || CAST(doc_id AS VARCHAR) AS text
                FROM documents
            ),
            near_gated AS (
                SELECT fam, epoch, url,
                       CAST(len(string_split(trim(text), ' ')) AS BIGINT)
                           AS n_tokens
                FROM near_docs
                WHERE len(string_split(trim(text), ' ')) >= 10
            ),
            near_ranked AS (
                SELECT fam, epoch, url, n_tokens,
                       row_number() OVER (
                           PARTITION BY fam ORDER BY epoch, url) AS rn
                FROM near_gated
            )
            SELECT url, n_tokens, epoch FROM near_ranked WHERE rn = 1
        """,
        "stream_admission": f"""
            WITH reqs AS (
                SELECT CAST(doc_id AS BIGINT) AS i,
                       'h' || CAST(CAST(doc_id AS BIGINT) % {ADMIT_HOSTS}
                                   AS VARCHAR) AS host,
                       'u' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR) AS url,
                       (CAST(doc_id AS BIGINT) // {ADMIT_HOSTS})
                           % {ADMIT_BURSTS} AS burst,
                       (CAST(doc_id AS BIGINT) // {ADMIT_HOSTS})
                           // {ADMIT_BURSTS} AS seq
                FROM documents
            )
            SELECT host, url,
                   row_number() OVER (
                       PARTITION BY host, burst ORDER BY seq
                   ) <= {ADMIT_RATE} AS admitted
            FROM reqs
        """,
        "host_windows": """
            SELECT strftime(time_bucket(INTERVAL 1 minute, ts),
                            '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(time_bucket(INTERVAL 1 minute, ts)
                            + INTERVAL 1 minute,
                            '%Y-%m-%d %H:%M:%S') AS window_end,
                   'h' || CAST(user_id % 20 AS VARCHAR) || '.example.com'
                       AS host,
                   COUNT(*) AS requests
            FROM events
            GROUP BY 1, 2, 3
        """,
    }
