"""Deterministic synthetic web corpus of interleaved text+media documents.

The sandbox has no network, so the fetch stage is simulated: the crawler
equi-joins its frontier batch against this corpus table on ``url``
(reference fetch: scraper.py:491; the real deployment swaps the join for an
HTTP ``mapInPandas`` stage).  The corpus is derived **arithmetically** from
the driver's ``documents.parquet`` (seeded, read-only), so the DuckDB oracle
in ``__spark_entry__.py`` can re-derive the exact same graph from the same
parquet with plain SQL — every scalar rule below is written once as a SQL
fragment shared by the Spark generator and the oracle.

Graph shape (FIXTURES.md §1): a ternary BFS tree over page ids
``g = doc_id * replicas + r`` with children ``{3g+1, 3g+2, 3g+3}`` plus a
cross link ``(7g+11) % P`` — ≥4 waves deep, fully reachable from page 0.
Failure taxonomy rows (reference scraper.py:496-528, tests/test_scraper.py):

========  =======================  ========================================
class     rule                     crawl behavior (reference semantics)
========  =======================  ========================================
http404   g % 53 = 7               visited, no page row, no retry
http500   g % 53 = 11              retry++, NULL page row (HTTPError)
http403   g % 53 = 17              visited, no page row, no retry
http429   g % 53 = 23              retry++, NULL page row (HTTPError)
pdf       g % 97 = 13              non-HTML: visited, no page row, no retry
empty     g % 89 = 5               fetch OK, no content spans -> retry++,
                                   NULL page (NoContentError); links still
                                   discovered (one-parse, scraper.py:551-558)
transient g % 101 = 19             503 on first attempt, success on retry;
                                   carries no out-links (keeps BFS depth
                                   arithmetic exact across resume runs)
missing   g % 131 = 29             absent from corpus = connection error ->
                                   retry++, NULL page (RequestException)
ok        otherwise                page row + links + retry reset
========  =======================  ========================================

Hosts are deliberately skewed: ~50% of pages live on ``h0.example.com``
(hot-host politeness/skew case), the rest spread over ``h1..h19``.
Link spans embed every filter edge case: relative hrefs, uppercase
scheme/host, ``#fragment``, duplicates, ``mailto:``/``javascript:``/
``tel:``, and out-of-scope hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPLICAS_DEFAULT = 4

# ---------------------------------------------------------------------------
# Shared SQL fragments (valid in BOTH Spark SQL and DuckDB).
# Each is a format template over the page-id expression.
# ---------------------------------------------------------------------------

CLS_SQL = (
    "CASE WHEN ({g}) % 53 = 7 THEN 'http404' "
    "WHEN ({g}) % 53 = 11 THEN 'http500' "
    "WHEN ({g}) % 53 = 17 THEN 'http403' "
    "WHEN ({g}) % 53 = 23 THEN 'http429' "
    "WHEN ({g}) % 97 = 13 THEN 'pdf' "
    "WHEN ({g}) % 89 = 5 THEN 'empty' "
    "WHEN ({g}) % 101 = 19 THEN 'transient' "
    "WHEN ({g}) % 131 = 29 THEN 'missing' "
    "ELSE 'ok' END"
)

HOST_ID_SQL = "CASE WHEN ({g}) % 4 < 2 THEN 0 ELSE 1 + (({g}) % 19) END"

# CAST(x AS STRING) works in both Spark and DuckDB (DuckDB aliases STRING->VARCHAR)
HOST_SQL = "'h' || CAST(" + HOST_ID_SQL + " AS STRING) || '.example.com'"

URL_SQL = "'https://' || " + HOST_SQL + " || '/docs/p' || CAST({g} AS STRING)"

STATUS_SQL = (
    "CASE WHEN ({g}) % 53 = 7 THEN 404 "
    "WHEN ({g}) % 53 = 11 THEN 500 "
    "WHEN ({g}) % 53 = 17 THEN 403 "
    "WHEN ({g}) % 53 = 23 THEN 429 "
    "ELSE 200 END"
)

CONTENT_TYPE_SQL = (
    "CASE WHEN ({g}) % 97 = 13 AND NOT (({g}) % 53 IN (7, 11, 17, 23)) "
    "THEN 'application/pdf' ELSE 'text/html; charset=utf-8' END"
)

TITLE_SQL = "'Doc ' || CAST({g} AS STRING) || ': ' || trim(substr({text}, 1, 24))"

# paragraph spans per page: j in 0 .. g % 3, paragraph j = substr(text, 1+j*37, 60).
# trimmed so spans are whitespace-normal (extraction collapses whitespace the
# way markdownify does, so canonical spans must carry none at the edges);
# short documents can yield empty substrings -> filtered out of the span list
PARA_SQL = "trim(substr({text}, 1 + ({j}) * 37, 60))"

HAS_IMAGE_SQL = "(({g}) % 2 = 0)"
IMAGE_REF_SQL = "'https://' || " + HOST_SQL + " || '/img/' || CAST({g} AS STRING) || '.png'"
HAS_CODE_SQL = "(({g}) % 7 = 3)"
CODE_SQL = "'print(' || CAST({g} AS STRING) || ')'"

# classes whose pages get parsed for links when fetched (reference parses any
# 200+HTML body — including empty-content pages, scraper.py:551-558)
PARSED_CLASSES = ("ok", "empty")

SPANS_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
EMPTY_SPANS = f"CAST(array() AS {SPANS_DDL})"


def _span(kind: str, text: str, ref: str) -> str:
    """One span struct literal (offset renumbered later)."""
    return (
        f"named_struct('kind', CAST({kind} AS STRING), 'text', CAST({text} AS STRING), "
        f"'media_ref', CAST({ref} AS STRING), 'offset', CAST(0 AS INT))"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle CTE builders
# ---------------------------------------------------------------------------


def edges_sql_duck(m: int, docs_rel: str = "documents") -> str:
    """DuckDB CTE text: pages, classes, and the canonical edge list — the
    links that survive resolve->canonicalize->validate->dedup in the engine;
    sources restricted to parsed classes."""
    return f"""
corpus_pages AS (
    SELECT d.doc_id * {m} + r.r AS g, d.text
    FROM {docs_rel} d
    CROSS JOIN (SELECT unnest(range({m})) AS r) r
),
corpus_meta AS (
    SELECT g, text,
           {CLS_SQL.format(g='g')} AS cls,
           {URL_SQL.format(g='g')} AS url,
           {HOST_SQL.format(g='g')} AS host,
           (SELECT count(*) * {m} FROM {docs_rel}) AS p_total
    FROM corpus_pages
),
corpus_edges AS (
    SELECT DISTINCT s.g AS src,
           CASE WHEN k.k = 0 THEN (7 * s.g + 11) % s.p_total
                ELSE 3 * s.g + k.k END AS dst
    FROM corpus_meta s
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    WHERE s.cls IN ('ok', 'empty')
      AND (k.k = 0 OR 3 * s.g + k.k < s.p_total)
)
""".strip()


def reach_sql_duck(m: int, max_depth: int = 60, docs_rel: str = "documents") -> str:
    """DuckDB recursive-CTE text computing the discovered set with min BFS
    depth (the engine's (depth, url)-ordered dequeue makes first-discovery
    depth equal min depth — see operators/crawl.py)."""
    return f"""
{edges_sql_duck(m, docs_rel)},
corpus_reach_raw(g, depth) AS (
    SELECT CAST(0 AS BIGINT) AS g, 0 AS depth
    UNION
    SELECT e.dst, r.depth + 1
    FROM corpus_reach_raw r
    JOIN corpus_edges e ON e.src = r.g
    WHERE r.depth < {max_depth}
),
corpus_reach AS (
    SELECT g, MIN(depth) AS depth FROM corpus_reach_raw GROUP BY g
)
""".strip()


# ---------------------------------------------------------------------------
# Spark generator (fully native expressions — generation never leaves the JVM)
# ---------------------------------------------------------------------------


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def synth_corpus(
    spark: SparkSession, sf_dir: str, replicas: int = REPLICAS_DEFAULT
) -> DataFrame:
    """Build the corpus DataFrame: one row per *fetchable* page.

    Columns: ``page_id, url, host, cls, status_code, content_type,
    transient_failures_remaining, title, spans`` where ``spans`` is the
    interleaved array<struct<kind,text,media_ref,offset>> (content spans
    followed by link spans, document order).  Pages of class ``missing`` are
    excluded (simulated connection error).
    """
    docs = load_documents(spark, sf_dir)
    n_docs = docs.count()
    p_total = n_docs * replicas
    return _corpus_from_docs(docs, replicas, p_total)


def _corpus_from_docs(docs: DataFrame, replicas: int, p_total: int) -> DataFrame:
    g = "page_id"
    # documents.parquet is a single file -> a single scan partition; fan the
    # rows out BEFORE the explode or every downstream narrow stage (span
    # construction, regex canonicalization, extraction UDFs) runs in one
    # task no matter how many cores the session has
    par = docs.sparkSession.sparkContext.defaultParallelism
    pages = (
        docs.select("doc_id", "text")
        .repartition(par)
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
        .selectExpr(f"doc_id * {replicas} + r AS page_id", "text")
    )
    base = pages.selectExpr(
        "page_id",
        "text",
        f"{CLS_SQL.format(g=g)} AS cls",
        f"{URL_SQL.format(g=g)} AS url",
        f"{HOST_SQL.format(g=g)} AS host",
        f"{STATUS_SQL.format(g=g)} AS status_code",
        f"{CONTENT_TYPE_SQL.format(g=g)} AS content_type",
        f"CAST(CASE WHEN {CLS_SQL.format(g=g)} = 'transient' THEN 1 ELSE 0 END AS INT)"
        " AS transient_failures_remaining",
        f"{TITLE_SQL.format(g=g, text='text')} AS title",
    )

    heading = _span("'heading1'", "'Doc ' || CAST(page_id AS STRING)", "NULL")
    para = _span("'paragraph'", PARA_SQL.format(text="text", j="j"), "NULL")
    image = _span("'image'", "NULL", IMAGE_REF_SQL.format(g=g))
    code = _span("'code'", CODE_SQL.format(g=g), "NULL")

    content_spans = f"""
    CASE WHEN cls = 'empty' THEN {EMPTY_SPANS} ELSE concat(
      array({heading}),
      filter(transform(sequence(0, {g} % 3), j -> {para}), s -> s.text <> ''),
      CASE WHEN {HAS_IMAGE_SQL.format(g=g)} THEN array({image}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {HAS_CODE_SQL.format(g=g)} THEN array({code}) ELSE {EMPTY_SPANS} END
    ) END
    """

    def child_url(c_expr: str, upper: bool = False, frag: bool = False) -> str:
        host = HOST_SQL.format(g=c_expr)
        if upper:
            u = f"'HTTPS://' || upper({host}) || '/docs/p' || CAST({c_expr} AS STRING)"
        else:
            u = f"'https://' || {host} || '/docs/p' || CAST({c_expr} AS STRING)"
        if frag:
            u += " || '#frag'"
        return u

    def link(text: str, ref: str) -> str:
        return _span("'link'", text, ref)

    c1, c2, c3 = f"(3 * {g} + 1)", f"(3 * {g} + 2)", f"(3 * {g} + 3)"
    cross = f"((7 * {g} + 11) % {p_total})"
    # the relative-href case (reference tests/test_scraper.py:77-83) is only
    # correct when parent and child share a host — a relative link resolves
    # against the page's own host (scraper.py:203 urljoin), so cross-host
    # children must be absolute or the crawl would fetch a nonexistent URL
    same_host = f"(({HOST_ID_SQL.format(g=c1)}) = ({HOST_ID_SQL.format(g=g)}))"
    child1_href = (
        f"CASE WHEN {same_host} THEN 'p' || CAST({c1} AS STRING) "
        f"ELSE {child_url(c1)} END"
    )
    link_spans = f"""
    CASE WHEN cls = 'transient' THEN {EMPTY_SPANS} ELSE concat(
      CASE WHEN {c1} < {p_total} THEN array(
        {link("'child 1'", child1_href)}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {c2} < {p_total} THEN array(
        {link("'child 2'", child_url(c2))}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {c3} < {p_total} THEN array(
        {link("'child 3'", child_url(c3, upper=True, frag=True))}) ELSE {EMPTY_SPANS} END,
      array({link("'cross'", child_url(cross))}),
      CASE WHEN {g} % 5 = 0 THEN array(
        {link("'junk'", "'mailto:user@example.com'")}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {g} % 5 = 1 THEN array(
        {link("'junk'", "'javascript:void(0)'")}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {g} % 5 = 2 THEN array(
        {link("'junk'", "'https://outside.org/x'")}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {g} % 5 = 3 AND {c1} < {p_total} THEN array(
        {link("'dup of child 1'", child_url(c1))}) ELSE {EMPTY_SPANS} END,
      CASE WHEN {g} % 5 = 4 THEN array(
        {link("'junk'", "'tel:+15550001111'")}) ELSE {EMPTY_SPANS} END
    ) END
    """

    keep = [
        "page_id",
        "url",
        "host",
        "cls",
        "status_code",
        "content_type",
        "transient_failures_remaining",
        "title",
    ]
    with_spans = base.selectExpr(
        *keep,
        f"({content_spans}) AS content_spans",
        f"({link_spans}) AS link_spans",
    ).selectExpr(
        *keep,
        # renumber offsets over the concatenated sequence (document order)
        "transform(concat(content_spans, link_spans), (s, i) -> "
        "named_struct('kind', s.kind, 'text', s.text, 'media_ref', s.media_ref, "
        "'offset', CAST(i AS INT))) AS spans",
    )

    return with_spans.filter(F.col("cls") != "missing")


def seed_url() -> str:
    return "https://h0.example.com/docs/p0"


# ---------------------------------------------------------------------------
# Pure-Python golden model (independent oracle for unit tests)
# ---------------------------------------------------------------------------


def python_cls(g: int) -> str:
    if g % 53 == 7:
        return "http404"
    if g % 53 == 11:
        return "http500"
    if g % 53 == 17:
        return "http403"
    if g % 53 == 23:
        return "http429"
    if g % 97 == 13:
        return "pdf"
    if g % 89 == 5:
        return "empty"
    if g % 101 == 19:
        return "transient"
    if g % 131 == 29:
        return "missing"
    return "ok"


def python_host(g: int) -> str:
    hid = 0 if g % 4 < 2 else 1 + (g % 19)
    return f"h{hid}.example.com"


def python_url(g: int) -> str:
    return f"https://{python_host(g)}/docs/p{g}"


def python_edges(g: int, p_total: int) -> list[int]:
    if python_cls(g) not in PARSED_CLASSES:
        return []
    out = [c for c in (3 * g + 1, 3 * g + 2, 3 * g + 3) if c < p_total]
    out.append((7 * g + 11) % p_total)
    return sorted(set(out))


def python_golden_crawl(p_total: int, max_retries: int = 3) -> dict:
    """Tiny independent BFS over the arithmetic graph — used by pytest to
    validate the Spark crawl end state on small corpora. Returns
    {g: {cls, depth, retry_count, doc_status}} for every discovered page."""
    depth = {0: 0}
    frontier = [0]
    while frontier:
        nxt = []
        for g in frontier:
            for c in python_edges(g, p_total):
                if c not in depth:
                    depth[c] = depth[g] + 1
                    nxt.append(c)
        frontier = nxt

    state = {}
    for g, d in depth.items():
        c = python_cls(g)
        if c == "ok":
            retry, status = 0, "ok"
        elif c == "transient":
            retry, status = 0, "ok"  # succeeds on the retry run, retry reset
        elif c in ("http404", "http403", "pdf"):
            retry, status = 0, None  # visited, no page row
        else:  # http500/http429/empty/missing -> retriable until cap
            retry, status = max_retries, "failed"
        state[g] = {"cls": c, "depth": d, "retry_count": retry, "doc_status": status}
    return state
