"""Text analysis for training-data pipelines: token counts, quality
scores, language-ID heuristic, document fingerprints.

All native Spark SQL expressions (whole-stage codegen; no Python in the
hot path).  Every function has an exact DuckDB-SQL twin used by the
driver's oracle harness; hash material is md5 hex prefixes (identical
byte-for-byte in Spark and DuckDB) so fingerprints compare exactly.

These generalize the reference's document handling (it stores raw markdown
TEXT and computes nothing over it) to the corpus-curation operations a
100 TB crawl feeds: filtering by quality/language and near-dup removal are
the first stages after extraction in any web-scale training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small multilingual stopword lists for the language heuristic — scoring is
# hit-count per list; the winner is the guess (ties -> lexicographic first)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
}

EN_STOPWORDS = STOPWORDS["en"]

# word-or-single-punct tokenization, BPE-ish granularity: identical regex
# accepted by Java (Spark rlike/regexp_count) and RE2-style DuckDB
BPE_TOKEN_RE = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (documents are single-spaced)."""
    return F.split(F.trim(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count: alnum runs + individual punct marks."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def stopword_hits(text: Column, words: list[str]) -> Column:
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: F.array_contains(lst, t))
    ).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword features for quality filtering."""
    n_chars = F.length(text).cast("long")
    n_tok = token_count(text)
    punct = F.regexp_count(text, F.lit("[^A-Za-z0-9 ]")).cast("long")
    stop = stopword_hits(text, EN_STOPWORDS)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": F.round((n_chars - n_tok + 1) / n_tok.cast("double"), 6),
        "punct_ratio": F.round(punct / n_chars.cast("double"), 6),
        "stopword_ratio": F.round(stop / n_tok.cast("double"), 6),
    }


def lang_guess(text: Column) -> Column:
    """Argmax stopword-hit language guess (n-gram-free heuristic; ties ->
    first language in sorted order).

    Single ``array_max`` over (hits, reverse-rank) structs rather than
    chained ``when(hits > best, ...)`` folds: the chain embeds each
    language's stopword-filter subtree in BOTH the running guess and the
    running best, doubling the tree per language — with interpreted
    higher-order functions (no CSE) the last language's document filter
    re-executed ~2^(N-1) times per row.  Here each language's hit count is
    evaluated exactly once.  Struct comparison orders by hits first, then
    reverse rank, so equal hit counts pick the highest reverse rank = the
    lexicographically FIRST language — the same tie-break as the strict
    ``>`` chain."""
    langs = sorted(STOPWORDS)
    entries = [
        F.struct(
            stopword_hits(text, STOPWORDS[lang]).alias("hits"),
            F.lit(len(langs) - 1 - i).alias("rev_rank"),
        )
        for i, lang in enumerate(langs)
    ]
    best = F.array_max(F.array(*entries))
    names_by_rev_rank = F.array(*[F.lit(lang) for lang in reversed(langs)])
    return F.element_at(names_by_rev_rank, best["rev_rank"] + 1)


def shingle_windows(text: Column, k: int = 3) -> Column:
    """ALL k-word shingles in document order (NON-distinct), each rendered
    as a space-joined string; ``max(T-k+1, 1)`` windows per document (the
    single trailing partial window survives for T < k, matching the
    reference ``slice`` behavior).

    Built by zipping the token array with its k-1 shifted suffixes rather
    than ``transform(sequence(...), i -> slice(toks, i+1, k))``: higher-order
    functions run interpreted (no codegen, no common-subexpression
    elimination), so a free ``split`` subtree inside the lambda re-tokenizes
    the document once PER SHINGLE INDEX — O(T^2) characters scanned per doc.
    Here every ``split`` sits in argument position (evaluated once per row,
    k+1 times total) and the lambdas touch only their element variables:
    O(T*k).  Measured on 2k docs x 1000 tokens: 9.5 s -> 0.55 s, identical
    arrays (``zip_with`` pads the shorter side with null and ``concat_ws``
    skips nulls)."""
    if k <= 1:
        # degenerate window: 1-word shingles are the tokens themselves
        # (the shifted-suffix zip below would index shifts[0] of an empty
        # list); matches the transform/slice form for k=1 exactly
        return tokens(text)
    toks = tokens(text)
    n = F.size(tokens(text))
    shifts = [
        F.slice(toks, i + 2, F.greatest(n - (i + 1), F.lit(1)))
        for i in range(k - 1)
    ]
    z = F.zip_with(tokens(text), shifts[0], lambda x, y: F.concat_ws(" ", x, y))
    for s in shifts[1:]:
        z = F.zip_with(z, s, lambda x, y: F.concat_ws(" ", x, y))
    return F.slice(z, 1, F.greatest(n - k + 1, F.lit(1)))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (set semantics — the dedup/fingerprint
    grain); see ``shingle_windows`` for the ordered non-distinct form and
    the re-execution-safe construction both share."""
    return F.array_distinct(shingle_windows(text, k))


def fingerprint(text: Column, k: int = 3, keep: int = 4) -> Column:
    """Winnowing-style document fingerprint: the ``keep`` lexicographically
    smallest md5-prefixes of the k-word shingles, joined.  Equal for equal
    token streams, robust to formatting; md5 hex compares identically in
    Spark and DuckDB."""
    hashes = F.transform(shingles(text, k), lambda s: F.substring(F.md5(s), 1, 16))
    return F.array_join(F.slice(F.array_sort(hashes), 1, keep), "|")


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the full feature set."""
    t = F.col(text_col)
    feats = quality_features(t)
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in feats.items()],
        bpe_token_count(t).alias("n_bpe_tokens"),
        lang_guess(t).alias("lang_guess"),
        fingerprint(t).alias("fingerprint"),
    )


def unigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """KenLM-lite corpus-intrinsic quality score: per-document mean
    unigram log-probability under the corpus's own empirical unigram
    distribution (the CCNet quality signal with the external LM replaced
    by the corpus itself — fully self-contained, no model artifact).

    Two-pass shape, each pass partial-aggregated so only distinct keys
    shuffle: pass 1 folds the exploded token stream to (doc, token, c)
    then (token, cnt) — map-side combine collapses within-document and
    within-partition repeats before either exchange; pass 2 joins the
    (doc, token, c) pairs back to the vocabulary (dozens-of-MB against a
    10^10-doc corpus — AQE picks the broadcast at runtime; at a 10^8-type
    vocabulary it degrades to a shuffle join on the same key the
    vocabulary aggregation just produced, so the exchange is reused) and
    rolls up per document.

    Cross-engine determinism: per-token log-probs are QUANTIZED to
    integer micro-nats (round(ln(cnt/total)·1e6)) before the per-document
    summation, so the compared aggregate is an exact integer sum —
    immune to float summation order across partitions and engines; the
    single final division is one deterministic float op.  ``logp_micro``
    twin: ``duck_unigram_logprob_sql``.
    """
    dt = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = dt.groupBy("token").agg(F.sum("c").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("__total"))
    logp_u = F.round(
        (F.log(F.col("cnt").cast("double"))
         - F.log(F.col("__total").cast("double"))) * 1e6
    ).cast("long")
    scored = (
        dt.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .withColumn("__lpu", logp_u)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("__lpu"))
                / (F.sum("c") * F.lit(1e6)),
                6,
            ).alias("lm_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB twins (oracle SQL fragments; {t} = text expression)
# ---------------------------------------------------------------------------

DUCK_TOKENS = "string_split(trim({t}), ' ')"
DUCK_TOKEN_COUNT = f"CAST(len({DUCK_TOKENS}) AS BIGINT)"
DUCK_BPE_COUNT = (
    "CAST(len(regexp_extract_all({t}, '[A-Za-z0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)"
)
DUCK_PUNCT = "CAST(len(regexp_extract_all({t}, '[^A-Za-z0-9 ]')) AS BIGINT)"


def duck_stop_hits(t: str, words: list[str]) -> str:
    lst = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return (
        f"CAST(len(list_filter(string_split(trim(lower({t})), ' '), "
        f"x -> list_contains({lst}, x))) AS BIGINT)"
    )


def duck_lang_guess(t: str) -> str:
    langs = sorted(STOPWORDS)
    expr = f"'{langs[0]}'"
    best = duck_stop_hits(t, STOPWORDS[langs[0]])
    for lang in langs[1:]:
        hits = duck_stop_hits(t, STOPWORDS[lang])
        expr = f"CASE WHEN {hits} > {best} THEN '{lang}' ELSE {expr} END"
        best = f"CASE WHEN {hits} > {best} THEN {hits} ELSE {best} END"
    return expr


def duck_shingle_windows(t: str, k: int = 3) -> str:
    """DuckDB twin of ``shingle_windows``: all k-word shingles in order,
    non-distinct, trailing partial window kept for T < k."""
    toks = DUCK_TOKENS.format(t=t)
    return (
        f"list_transform(range(0, greatest(len({toks}) - {k}, 0) + 1), "
        f"i -> array_to_string(list_slice({toks}, i + 1, i + {k}), ' '))"
    )


def duck_shingles(t: str, k: int = 3) -> str:
    """DuckDB twin of ``shingles`` (distinct k-word shingles)."""
    return f"list_distinct({duck_shingle_windows(t, k)})"


def duck_fingerprint(t: str, k: int = 3, keep: int = 4) -> str:
    hashes = f"list_transform({duck_shingles(t, k)}, s -> substr(md5(s), 1, 16))"
    return f"array_to_string(list_slice(list_sort({hashes}), 1, {keep}), '|')"


def duck_unigram_logprob_sql(docs_rel: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """Readable twin of ``unigram_logprob`` — unnest + GROUP BY with the
    identical micro-nat quantization, so the compared per-document sum is
    an exact integer in both engines."""
    toks = DUCK_TOKENS.format(t=text_col)
    return f"""
        WITH dt AS (
            SELECT {id_col} AS doc_id, unnest({toks}) AS token
            FROM {docs_rel}
        ),
        dtc AS (
            SELECT doc_id, token, count(*) AS c FROM dt GROUP BY 1, 2
        ),
        vocab AS (
            SELECT token, sum(c) AS cnt FROM dtc GROUP BY 1
        ),
        tot AS (SELECT sum(cnt) AS total FROM vocab)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               round(sum(c * CAST(round((ln(CAST(cnt AS DOUBLE))
                                         - ln(CAST(total AS DOUBLE))) * 1e6)
                                  AS BIGINT))
                     / (sum(c) * 1e6), 6) AS lm_logprob
        FROM dtc JOIN vocab USING (token), tot
        GROUP BY doc_id
    """


def duck_text_stats_sql(docs_rel: str = "documents") -> str:
    t = "text"
    stop = duck_stop_hits(t, EN_STOPWORDS)
    ntok = DUCK_TOKEN_COUNT.format(t=t)
    return f"""
        SELECT doc_id,
               CAST(length({t}) AS BIGINT) AS n_chars,
               {ntok} AS n_tokens,
               round((length({t}) - {ntok} + 1) / CAST({ntok} AS DOUBLE), 6)
                   AS mean_token_len,
               round({DUCK_PUNCT.format(t=t)} / CAST(length({t}) AS DOUBLE), 6)
                   AS punct_ratio,
               round({stop} / CAST({ntok} AS DOUBLE), 6) AS stopword_ratio,
               {DUCK_BPE_COUNT.format(t=t)} AS n_bpe_tokens,
               {duck_lang_guess(t)} AS lang_guess,
               {duck_fingerprint(t)} AS fingerprint
        FROM {docs_rel}
    """


def dataset_card(docs: DataFrame, text_col: str = "text",
                 strata_cols: list[str] | None = None) -> DataFrame:
    """The "data card" rollup a corpus release ships: per-stratum document
    count, token mass, unique-digest count (exact-dup signal), char mass,
    and min/max document length — every column an exact integer (no
    percentiles/means, which drift across engines), one partial-aggregated
    shuffle on the stratum key.  ``strata_cols=None`` gives the one-row
    whole-corpus card."""
    t = F.col(text_col)
    strata = strata_cols or []
    grouped = docs.groupBy(*strata) if strata else docs.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count(t).cast("long")).cast("long").alias("n_tokens"),
        F.sum(F.length(t).cast("long")).cast("long").alias("n_chars"),
        F.countDistinct(F.md5(t)).cast("long").alias("n_unique_digests"),
        F.min(F.length(t)).cast("long").alias("min_chars"),
        F.max(F.length(t)).cast("long").alias("max_chars"),
    )
