"""crawler_to_md_spark — a PySpark-native crawl-frontier + document-pipeline engine.

A from-scratch re-implementation of the capabilities of msneto/crawler-to-md
(reference snapshot at /root/reference) on Apache Spark DataFrames:

- URL canonicalization + 64-bit hashing (native column expressions with a
  pandas-UDF parity path), scope/include/exclude predicates
  (reference: crawler_to_md/utils.py, crawler_to_md/scraper.py:287-314)
- a snapshot-committed frontier store with exact anti-join dedup behind a
  partitioned bloom pre-filter (reference: database_manager.py:146-172) —
  or a deletable cuckoo filter (functions/cuckoo.py) for TTL-recrawl /
  purge lifecycles (operators/crawl.py reopen/purge)
- robots.txt gating (sources/robots.py fetch+parse -> politeness gate) and
  sitemap seeding (sources/sitemap.py)
- a BFS wave scheduler with per-host politeness budgets and skew-safe
  two-phase ranking (reference: scraper.py:433-598)
- interleaved text+media span extraction and markdown projection
  (reference: scraper.py:217-285)
- compiled markdown / JSON / per-page exports incl. the minifier state
  machine (reference: export_manager.py)
- training-data pipeline operators: dedup (exact / minhash-LSH / simhash /
  n-gram jaccard / embedding-cosine), near-dup cluster collapse via
  large-star/small-star connected components with keeper selection
  (operators/dedup.py drop_near_dups), a composed quality-gate -> dedup
  cleaning pipeline, ANN similarity search, text quality stats, multimodal
  column plumbing.

Everything is DataFrame-first: native pyspark.sql.functions wherever the
semantics allow, vectorized pandas/Arrow UDFs only for urllib-exact URL
handling and the stateful markdown minifier. No row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"
