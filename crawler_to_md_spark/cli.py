"""Command-line entry point — mirrors the reference CLI surface
(/root/reference/crawler_to_md/cli.py:20-299) over the Spark engine.

Flag-for-flag parity where semantics carry over:

  --url/-u, --urls-file (file or ``-`` = stdin)   seeds (S1/S2; cli.py:34-39,181-190)
  --output-folder/-o, --cache-folder/-c           layout (cli.py:40-53,200-214)
  --overwrite-cache/-w                            S13 (cli.py:54-60,225-231)
  --base-url/-b, --title/-t                       scope + export title (cli.py:61-70)
  --include-url/-I, --exclude-url/-e              P3/P4 (cli.py:71-84)
  --export-individual/-ei                         S12 (cli.py:85-91)
  --rate-limit/-rl, --delay/-d                    O3/O4 (cli.py:92-105)
  --proxy/-p, --timeout                           transport knobs (cli.py:106-117)
  --no-markdown, --no-json, --minify/-m           exports (cli.py:118-139)
  --include/-i, --exclude/-x                      P6/P7 CSS filters (cli.py:140-159)
  --max-retries                                   O5 (cli.py:160-165)

Differences forced by the engine being distributed + sandboxed:
  * the cache folder holds a snapshot warehouse per seed (not a sqlite
    file); ``--overwrite-cache`` removes the warehouse dir.
  * fetch is simulated: ``--corpus-parquet`` points at a pre-fetched page
    store (url, status_code, content_type, spans, ...); a production
    deployment swaps this for the HTTP ``mapInPandas`` stage
    (``sources/fetch.py``), where ``--proxy``/``--timeout`` apply.
  * ``--master`` picks the Spark master (default ``local[*]``).

Engine-side additions beyond the reference surface:
  * ``--sitemap-file`` seeds from a local sitemap.xml (sources/sitemap.py).
  * ``--robots-parquet`` / ``--respect-robots`` gate the frontier on
    per-host robots.txt rules (sources/robots.py + politeness.robots_filter
    — the north rule's robots gating; the reference has none).

As in the reference, seeding from ``--urls-file`` disables link discovery
(static frontier, O9 — scraper.py:553-555,589) and leaves ``--base-url``
unset unless given; ``--url`` crawls its site with base_url defaulting to
the URL's directory (cli.py:244-252).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="crawler-to-md-spark", description="Web Scraper to Markdown (Spark)"
    )
    p.add_argument("--url", "-u", help="Base URL to start scraping")
    p.add_argument("--urls-file",
                   help="File with URLs, one per line; '-' reads stdin")
    p.add_argument("--output-folder", "--output-dir", "-o", default="./output")
    p.add_argument("--cache-folder", "--cache-dir", "-c",
                   default="~/.cache/crawler-to-md-spark")
    p.add_argument("--overwrite-cache", "-w", action="store_true", default=False)
    p.add_argument("--base-url", "-b",
                   help="Base URL for link scope; defaults to the URL base")
    p.add_argument("--title", "-t", help="Markdown title; defaults to the URL")
    p.add_argument("--exclude-url", "-e", action="append", default=[])
    p.add_argument("--include-url", "-I", action="append", default=[])
    p.add_argument("--export-individual", "-ei", action="store_true", default=False)
    p.add_argument("--rate-limit", "-rl", type=int, default=0,
                   help="Max requests per minute (0 = off)")
    p.add_argument("--delay", "-d", type=float, default=0)
    p.add_argument("--proxy", "-p", default=None)
    p.add_argument("--timeout", type=float, default=10)
    p.add_argument("--no-markdown", action="store_true", default=False)
    p.add_argument("--no-json", action="store_true", default=False)
    p.add_argument("--minify", "-m", action="store_true", default=False)
    p.add_argument("--include", "-i", action="append", default=[],
                   help="CSS-like selector to include before conversion")
    p.add_argument("--exclude", "-x", action="append", default=[],
                   help="CSS-like selector to exclude before conversion")
    p.add_argument("--max-retries", type=int, default=3)
    # Spark-engine specifics
    p.add_argument("--corpus-parquet",
                   help="Parquet page store standing in for HTTP fetch")
    p.add_argument("--sitemap-file",
                   help="Local sitemap.xml (urlset) to seed from; like "
                        "--urls-file this crawls a static frontier.  A "
                        "sitemapindex file is rejected — fetch its child "
                        "sitemaps and pass those")
    p.add_argument("--robots-parquet",
                   help="Pre-built robots rules table "
                        "(host, disallow array<string>[, allow array<string>]) to gate the "
                        "frontier on (politeness.robots_filter)")
    p.add_argument("--respect-robots", action="store_true", default=False,
                   help="Fetch robots.txt over HTTP for every crawled host "
                        "— seed hosts at run start, newly-discovered hosts "
                        "after each wave — and gate the frontier on the "
                        "rules at both discovery and dequeue "
                        "(sources/robots.py); needs network + requests")
    p.add_argument("--seen-filter", choices=("bloom", "cuckoo"),
                   default="bloom",
                   help="URL-seen pre-filter backend: bloom (default) or "
                        "cuckoo (supports deletion for TTL-recrawl/purge); "
                        "a cache must be resumed with the backend it was "
                        "created with")
    p.add_argument("--host-budgets-parquet", default=None,
                   help="parquet of per-host adaptive wave budgets "
                        "(host string, budget int) — e.g. "
                        "politeness.crawl_delay_budgets output; hosts "
                        "absent from the table keep the uniform budget")
    p.add_argument("--rank-hosts", action="store_true", default=False,
                   help="on resume, PageRank the already-crawled host "
                        "graph and dequeue high-authority hosts first "
                        "(operators/linkgraph.py); no effect on a fresh "
                        "crawl (no graph yet)")
    p.add_argument("--master", default=None, help="Spark master override")
    p.add_argument("--training-shards-dir", default=None,
                   help="Also materialize the crawled corpus as token-"
                        "budget-packed training shards (markdown text, "
                        "url order) under this directory — the crawl -> "
                        "training-data pipeline's terminal sink "
                        "(exports.export_training_shards)")
    p.add_argument("--token-budget", type=int, default=2048,
                   help="Tokens per training shard for "
                        "--training-shards-dir (default 2048)")
    p.add_argument("--clean", action="store_true", default=False,
                   help="Run the full cleaning pipeline before the "
                        "--training-shards-dir packing: token quality "
                        "gate -> exact dedup -> MinHash-LSH near-dup "
                        "cluster collapse -> drop (operators/dedup."
                        "clean_pipeline, the composition the certified "
                        "crawl_clean_shards query pins exactly)")
    p.add_argument("--clean-min-tokens", type=int, default=10,
                   help="--clean quality gate: minimum whitespace tokens "
                        "per page (default 10)")
    p.add_argument("--clean-threshold", type=float, default=0.5,
                   help="--clean near-dup Jaccard threshold (default 0.5)")
    p.add_argument("--clean-dup-window", type=float, default=None,
                   help="with --clean: also drop documents whose "
                        "corpus-wide duplicated-10-token-window fraction "
                        "exceeds this (ExactSubstr document-level stage)")
    p.add_argument("--clean-dup-window-mode", choices=("drop", "cut"),
                   default="drop",
                   help="--clean-dup-window form: 'drop' removes whole "
                        "over-threshold documents; 'cut' surgically "
                        "removes the duplicated windows from every "
                        "eligible document, first corpus-wide occurrence "
                        "keeping its text (Lee et al. ExactSubstr)")
    p.add_argument("--decontaminate-bench", default=None,
                   help="Parquet of benchmark documents (a 'text' column); "
                        "with --clean, training docs sharing any "
                        "--decontaminate-k-gram with the benchmark are "
                        "dropped before dedup (GPT-3 overlap rule, "
                        "operators/curation.decontaminate)")
    p.add_argument("--decontaminate-k", type=int, default=13,
                   help="k-gram size for --decontaminate-bench "
                        "(default 13)")
    p.add_argument("--sitemap-discover", action="store_true", default=False,
                   help="Seed from the --url host's robots.txt Sitemap: "
                        "directives (distributed fetch + index expansion) "
                        "instead of crawling out from --url; static "
                        "frontier like --urls-file")
    p.add_argument("--wet-input", default=None,
                   help="Skip crawling: ingest a WET-style text archive "
                        "(sources/archive.py) as the document corpus and "
                        "run the cleaning/packing path; requires "
                        "--training-shards-dir. Corrupt (unframeable) "
                        "records are dropped with a logged count")
    p.add_argument("--warc-input", default=None,
                   help="Skip crawling: ingest a WARC-response archive "
                        "(raw HTTP captures, sources/archive.read_warc), "
                        "extract clean 200 text/html pages to markdown, "
                        "and run the cleaning/packing path; requires "
                        "--training-shards-dir. --include/--exclude CSS "
                        "filters apply to the extraction")
    p.add_argument("--export-wet-dir", default=None,
                   help="Also export the crawled ok-pages (markdown text) "
                        "as a WET-style archive at this directory — the "
                        "bulk handoff format for downstream pipelines")
    p.add_argument("--revalidate", action="store_true", default=False,
                   help="Conditional refetch: store each ok page's "
                        "ETag/Last-Modified and send "
                        "If-None-Match/If-Modified-Since on refetch; 304 "
                        "keeps the cached page (pays on TTL-recrawl "
                        "workloads; live HTTP stage only)")
    p.add_argument("--health-report", action="store_true", default=False,
                   help="After the crawl, print the per-host "
                        "coverage/health rollup plus soft-404 and "
                        "crawl-trap candidates (top 20 rows each)")
    p.add_argument("--training-jsonl-dir", default=None,
                   help="Also export the (optionally cleaned) ok-page "
                        "markdown as JSONL — one {text, url} object per "
                        "line (exports.export_training_jsonl, "
                        "executor-written, 32 files)")
    p.add_argument("--trap-threshold", type=int, default=None,
                   help="Crawl-trap guard: each wave drops pending URLs "
                        "whose (host, template) family has at least this "
                        "many distinct URLs (digit runs and query values "
                        "masked — calendar/session-id/facet explosions "
                        "never reach the dequeue; "
                        "operators/crawlhealth.drop_trap_urls)")
    p.add_argument("--drop-soft404", action="store_true", default=False,
                   help="Before --training-shards-dir packing/cleaning, "
                        "drop pages whose body digest dominates its host "
                        "(>= 3 pages and >= half the host's OK pages — "
                        "soft-404 placeholder bodies; "
                        "operators/crawlhealth.drop_soft404)")
    p.add_argument("--small-export", action="store_true", default=False,
                   help="Assemble compiled exports on the driver (collect) "
                        "instead of the default executor-written sharded "
                        "path; only for corpora that fit in driver memory")
    return p


def _clean_docs(spark, args, ok_docs):
    """``--clean`` stage shared by the crawl and ``--wet-input`` paths:
    the LSH-form cleaning pipeline over ``(url, text)`` rows."""
    from pyspark.sql import functions as F

    from crawler_to_md_spark.operators.dedup import clean_pipeline

    bench = (
        spark.read.parquet(args.decontaminate_bench)
        if args.decontaminate_bench else None
    )
    # numeric keeper id: xxhash64(url) is deterministic across runs and
    # cluster sizes (the keeper is min id per cluster — arbitrary but
    # stable); collision odds at 10^10 docs are ~1e-3 over the whole
    # corpus, each costing one spurious merge
    return clean_pipeline(
        ok_docs.withColumn("__did", F.xxhash64("url")),
        text_col="text", id_col="__did",
        min_tokens=args.clean_min_tokens,
        threshold=args.clean_threshold,
        pairs="lsh",   # the probabilistic 10^10-doc scale path;
                       # the exact form backs the oracle query
        bench=bench, decontam_k=args.decontaminate_k,
        max_dup_window=args.clean_dup_window,
        dup_window_mode=args.clean_dup_window_mode,
    ).drop("__did")


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    """Parse args, crawl, export.  ``spark`` is injectable for tests."""
    from crawler_to_md_spark import exports
    from crawler_to_md_spark.functions import urlkit as _  # noqa: F401 (parity)
    from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
    from crawler_to_md_spark.sources import seeds as seed_src
    from crawler_to_md_spark.session import get_spark

    parser = build_parser()
    args = parser.parse_args(argv)
    args.cache_folder = os.path.expanduser(args.cache_folder)

    from crawler_to_md_spark.progress import setup_logging

    setup_logging()

    if spark is None:
        spark = get_spark(app_name="crawler-to-md-spark", master=args.master)

    # ---- archive ingestion: WARC -> extract -> clean -> shards -----------
    if args.warc_input:
        if not args.training_shards_dir:
            parser.error("--warc-input requires --training-shards-dir")
        from pyspark.sql import functions as F

        from crawler_to_md_spark.functions.extraction import (
            make_extract_udf,
        )
        from crawler_to_md_spark.functions.markdown import (
            spans_to_markdown_expr,
        )
        from crawler_to_md_spark.sources import archive

        recs = archive.read_warc(spark, args.warc_input)
        keep = (
            F.col("corrupt").isNull()
            & (F.col("kind") == "response")
            & (F.col("status_code") == 200)
            & (F.col("content_type").isNull()
               | F.col("content_type").startswith("text/html"))
        )
        # ONE aggregation scan for the drop count — the earlier
        # recs.count() - pages.count() form ran TWO full archive scans
        # (each re-running the pandas parse) for a log line
        n_dropped = int(
            recs.agg(
                F.sum(F.when(keep, 0).otherwise(1)).alias("d")
            ).collect()[0]["d"] or 0)
        if n_dropped:
            print(f"Dropped {n_dropped} non-page/corrupt WARC records")
        pages = recs.filter(keep)
        extract = make_extract_udf(args.include, args.exclude)
        ok_docs = pages.select(
            "url", extract(F.col("html")).alias("doc")
        ).select(
            "url",
            F.expr(spans_to_markdown_expr("doc.spans")).alias("text"))
        if args.clean:
            ok_docs = _clean_docs(spark, args, ok_docs)
        exports.export_training_shards(
            ok_docs, budget=args.token_budget,
            out_dir=args.training_shards_dir, order_cols=["url"])
        print("Training shards exported to:", args.training_shards_dir)
        return 0

    # ---- archive ingestion: WET -> clean -> shards, no crawl -------------
    if args.wet_input:
        if not args.training_shards_dir:
            parser.error("--wet-input requires --training-shards-dir")
        from crawler_to_md_spark.sources import archive

        from pyspark.sql import functions as F

        recs = archive.read_wet(spark, args.wet_input)
        # ONE aggregation scan for the corrupt count (not two counts)
        n_corrupt = int(
            recs.agg(
                F.sum(F.when(F.col("corrupt").isNull(), 0).otherwise(1))
                .alias("d")
            ).collect()[0]["d"] or 0)
        if n_corrupt:
            print(f"Dropped {n_corrupt} corrupt archive records")
        ok_docs = recs.filter("corrupt IS NULL").select("url", "text")
        if args.clean:
            ok_docs = _clean_docs(spark, args, ok_docs)
        exports.export_training_shards(
            ok_docs, budget=args.token_budget,
            out_dir=args.training_shards_dir, order_cols=["url"])
        print("Training shards exported to:", args.training_shards_dir)
        return 0

    # ---- seeds (cli.py:181-199): file/stdin beats --url ------------------
    seed_df = None
    urls_list_mode = False
    if args.urls_file:
        seed_df = seed_src.seed_frame(spark, args.urls_file)
        urls_list_mode = True
        first = seed_df.orderBy("seed_seq").select("raw").first()
        if first is None or not first["raw"]:
            parser.error("urls file is empty")
        first_url = first["raw"]
    elif args.sitemap_file:
        from crawler_to_md_spark.sources import sitemap as sitemap_src

        with open(args.sitemap_file, encoding="utf-8") as f:
            xml = f.read()
        if sitemap_src.is_sitemap_index(xml):
            parser.error("--sitemap-file is a sitemap index; fetch its "
                         "child sitemaps and pass those instead")
        seed_df = sitemap_src.sitemap_seed_frame(
            spark.createDataFrame([(0, xml)], "file_seq long, xml string"))
        urls_list_mode = True                    # sitemap = static frontier
        first = seed_df.orderBy("seed_seq").select("raw").first()
        if first is None or not first["raw"]:
            parser.error("sitemap has no <loc> entries")
        first_url = first["raw"]
    elif args.url and args.sitemap_discover:
        from pyspark.sql import functions as F

        from crawler_to_md_spark.functions import urlkit as _uk
        from crawler_to_md_spark.sources import sitemap as sitemap_src
        from crawler_to_md_spark.sources.robots import requests_text_transport

        host = (
            spark.createDataFrame([(args.url,)], "u string")
            .select(_uk.url_host(F.col("u")).alias("host")).first()["host"]
        )
        seed_df = sitemap_src.seeds_from_robots(
            spark.createDataFrame([(host,)], "host string"),
            requests_text_transport)
        urls_list_mode = True                    # discovered = static frontier
        first = seed_df.orderBy("seed_seq").select("raw").first()
        if first is None or not first["raw"]:
            parser.error("no sitemap seeds discovered from robots.txt")
        first_url = args.url
    elif args.url:
        seed_df = seed_src.single_seed_frame(spark, args.url)
        first_url = args.url
    else:
        parser.error("No URL provided. Please provide either --url or --urls-file.")

    # ---- layout (cli.py:200-214) ----------------------------------------
    from pyspark.sql import functions as F

    fname = (
        spark.createDataFrame([(first_url,)], "u string")
        .select(_.url_to_filename_expr(F.col("u"))).first()[0]
    )
    output = os.path.join(args.output_folder, fname)
    os.makedirs(output, exist_ok=True)
    os.makedirs(args.cache_folder, exist_ok=True)

    if not args.base_url and not args.urls_file:
        args.base_url = (
            spark.createDataFrame([(first_url,)], "u string")
            .select(_.url_dirname_expr(F.col("u"))).first()[0]
        )
    if not args.title:
        args.title = first_url

    # ---- cache lifecycle (S13, cli.py:222-231) ---------------------------
    warehouse = os.path.join(args.cache_folder, fname)
    if args.overwrite_cache and os.path.exists(warehouse):
        shutil.rmtree(warehouse, ignore_errors=True)

    corpus_df = (
        spark.read.parquet(args.corpus_parquet) if args.corpus_parquet else None
    )
    config = CrawlConfig(
        scope_base_url=args.base_url,
        include_patterns=args.include_url,
        exclude_patterns=args.exclude_url,
        max_retries=args.max_retries,
        discover_links=not urls_list_mode,      # O9 (scraper.py:553-555,589)
        rate_limit=args.rate_limit,
        delay=args.delay,
        timeout=args.timeout,
        proxy=args.proxy,
        css_include=args.include,
        css_exclude=args.exclude,
        seen_filter=args.seen_filter,
        trap_min_urls=args.trap_threshold,
        revalidate=args.revalidate,
    )
    # ---- robots gate (north-rule robots.txt gating) ----------------------
    robots_df = None
    robots_factory = None
    if args.robots_parquet:
        robots_df = spark.read.parquet(args.robots_parquet)
    if args.respect_robots:
        # per-wave auto-robots: the engine fetches rules for seed hosts at
        # run start and for each wave's newly-discovered hosts before the
        # next wave dequeues them; a manual --robots-parquet table is
        # honored as pre-covered hosts (fresh rules only for the rest)
        from crawler_to_md_spark.sources.robots import requests_text_transport

        robots_factory = requests_text_transport

    engine = CrawlEngine(spark, warehouse, corpus=corpus_df, config=config,
                         robots=robots_df,
                         robots_transport_factory=robots_factory,
                         robots_agent="crawler-to-md-spark")
    if args.host_budgets_parquet:
        engine.set_host_budgets(spark.read.parquet(args.host_budgets_parquet))
    resume = engine.store.exists()
    if resume and args.rank_hosts:
        from crawler_to_md_spark.operators import linkgraph

        ranks = linkgraph.pagerank(
            linkgraph.host_edges(
                linkgraph.doc_edges(engine.docs().filter("status = 'ok'"))
            ),
            iterations=3,
        )
        engine.set_host_priority(linkgraph.rank_to_priority(ranks))
    if not resume:
        engine.seed(seed_df)
        engine.run_to_completion()
    else:
        if args.respect_robots:
            # a resumed frontier usually holds hosts discovered after the
            # last run's rules fetches — refresh rules for ALL frontier
            # hosts before requeuing (CrawlEngine.refresh_robots keeps
            # manual --robots-parquet rules for hosts the fetch misses)
            engine.refresh_robots(agent="crawler-to-md-spark")
        engine.run(resume=True)                  # O6 requeue path

    # ---- exports (cli.py:262-295) ----------------------------------------
    out_name = (
        spark.createDataFrame([(args.title,)], "t string")
        .select(_.randomstring_to_filename_expr(F.col("t"))).first()[0]
    )
    docs, links = engine.docs(), engine.links()
    if args.health_report:
        from crawler_to_md_spark.functions.markdown import (
            spans_to_markdown_expr,
        )
        from crawler_to_md_spark.operators import crawlhealth

        print("== per-host crawl health ==")
        engine.crawl_report().orderBy(F.desc("n_urls")).show(
            20, truncate=False)
        pages = docs.filter(F.col("status") == "ok").select(
            "url", F.expr(spans_to_markdown_expr("spans")).alias("text")
        ).join(links.select("url", "host"), "url")
        print("== soft-404 candidates (dominant digests) ==")
        crawlhealth.soft404_report(pages).orderBy(
            F.desc("n_pages")).show(20, truncate=False)
        print("== crawl-trap candidates (exploding URL templates) ==")
        crawlhealth.trap_report(links.select("host", "url")).orderBy(
            F.desc("n_urls")).show(20, truncate=False)
        print("== mirror-host candidates (shared-content pairs) ==")
        crawlhealth.host_mirror_pairs(pages).orderBy(
            F.desc("n_shared")).show(20, truncate=False)
    md_path = os.path.join(output, f"{out_name}.md")
    json_path = os.path.join(output, f"{out_name}.json")
    # sharded (executor-written, O(chunk) driver memory) is the default —
    # byte-identical to the collect path (proven in tests/test_exports.py);
    # --small-export keeps the reference-shaped driver assembly for tiny runs
    if not args.no_markdown:
        if args.small_export:
            exports.export_compiled_markdown(
                docs, links, title=args.title, path=md_path,
                minify=args.minify)
        else:
            exports.export_compiled_markdown_sharded(
                docs, links, title=args.title, path=md_path,
                minify=args.minify)
        print("Markdown file generated at:", md_path)
    if not args.no_json:
        if args.small_export:
            exports.export_compiled_json(
                docs, links, path=json_path, minify=args.minify)
        else:
            exports.export_compiled_json_sharded(
                docs, links, path=json_path, minify=args.minify)
        print("JSON file generated at:", json_path)
    if args.export_individual:
        folder = exports.export_individual_markdown(
            docs, links, output_folder=output, base_url=args.base_url,
            minify=args.minify)
        print("Individual Markdown files exported to:", folder)
    if args.export_wet_dir:
        from crawler_to_md_spark.functions.markdown import (
            spans_to_markdown_expr,
        )
        from crawler_to_md_spark.sources import archive

        archive.write_wet(
            docs.filter(F.col("status") == "ok").select(
                "url", F.expr(spans_to_markdown_expr("spans")).alias("text")),
            args.export_wet_dir)
        print("WET archive exported to:", args.export_wet_dir)
    if args.training_shards_dir or args.training_jsonl_dir:
        from crawler_to_md_spark.functions.markdown import (
            spans_to_markdown_expr,
        )

        ok_docs = docs.filter(F.col("status") == "ok").select(
            "url", F.expr(spans_to_markdown_expr("spans")).alias("text"))
        if args.drop_soft404:
            from crawler_to_md_spark.operators.crawlhealth import (
                drop_soft404,
            )

            ok_docs = drop_soft404(
                ok_docs.join(links.select("url", "host"), "url")
            ).select("url", "text")
        if args.clean:
            ok_docs = _clean_docs(spark, args, ok_docs)
        if args.training_shards_dir:
            exports.export_training_shards(
                ok_docs, budget=args.token_budget,
                out_dir=args.training_shards_dir, order_cols=["url"])
            print("Training shards exported to:",
                  args.training_shards_dir)
        if args.training_jsonl_dir:
            exports.export_training_jsonl(
                ok_docs, args.training_jsonl_dir, files=32,
                order_cols=["url"])
            print("Training JSONL exported to:", args.training_jsonl_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
