"""Table schemas for the crawl warehouse.

Mirrors the reference's SQLite DDL (database_manager.py:46-60) lifted to a
columnar, partition-friendly layout (SURVEY.md §1.4):

* ``links``  — the frontier + URL-seen set.  The reference's
  ``url TEXT PRIMARY KEY`` becomes ``(url_hash, url)``: a 64-bit xxhash64
  join/bucket key backed by the exact string (hash collisions never merge
  URLs because every seen-set join also checks ``url`` equality).
* ``docs``   — the fetched-document store.  The reference's markdown TEXT
  blob (``pages.content``) becomes a real
  ``array<struct<kind,text,media_ref,offset>>`` span column; markdown is a
  projection (functions/markdown.py).  ``spans IS NULL`` still encodes
  "fetch/extract failed" (database_manager.py:282-292).
* ``metrics`` — one row per wave (reference tqdm counters, scraper.py:421-426,
  589-595, made durable).  All values are deterministic counts — no
  wall-clock — so snapshot state is reproducible bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

SPANS_TYPE = ArrayType(SPAN_TYPE)

# array<struct<...>> DDL string shared with corpus generation / SQL paths
SPANS_DDL = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"

LINKS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType()),
        StructField("visited", BooleanType(), False),
        StructField("retry_count", IntegerType(), False),
        # BFS wave in which the URL was first discovered (seed = 0)
        StructField("depth", IntegerType(), False),
        # wave whose commit inserted the row (== depth when politeness
        # budgets don't defer expansion)
        StructField("batch_id", LongType(), False),
        # canonical intra-wave order: dense rank of url within batch_id
        StructField("seq", LongType(), False),
    ]
)

DOCS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("spans", SPANS_TYPE),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField("status", StringType()),
        StructField("batch_id", LongType()),
    ]
)

# robots coverage table: one row per host whose robots.txt has been fetched
# (or supplied manually).  ``disallow IS NULL`` = covered but no reachable
# rules (= fully allowed, politeness.robots_allowed NULL semantics).  This
# table IS the engine's covered-host set — new hosts are found with an
# anti-join against it, never a driver-side set (a domain-unbounded crawl
# sees 10^7-10^8 hosts).
ROBOTS_SCHEMA = StructType(
    [
        StructField("host", StringType(), False),
        StructField("disallow", ArrayType(StringType())),
        # RFC 9309 Allow prefixes; the gate applies longest-match
        # precedence between the two lists (allow wins length ties)
        StructField("allow", ArrayType(StringType())),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("batch_id", LongType(), False),
        StructField("run_id", IntegerType(), False),
        StructField("dequeued", LongType()),
        StructField("fetched_ok", LongType()),
        StructField("failed_retriable", LongType()),
        StructField("skipped", LongType()),
        StructField("links_discovered", LongType()),
        StructField("links_inserted", LongType()),
    ]
)
