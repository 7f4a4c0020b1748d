"""CLI tests — mirror the reference tests/test_cli.py shapes: flag
plumbing, urls-file/stdin seeds, overwrite-cache, export toggles."""

from __future__ import annotations

import io
import json
import os

import pytest

from crawler_to_md_spark import cli
from crawler_to_md_spark.sources import corpus, seeds


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli_corpus") / "corpus.parquet")
    corpus.synth_corpus(spark, "/root/testdata/sf0.001", replicas=1) \
        .write.mode("overwrite").parquet(p)
    return p


def _run(spark, tmp_path, *argv, name="run"):
    out = str(tmp_path / f"out_{name}")
    cache = str(tmp_path / f"cache_{name}")
    rc = cli.main(
        ["--output-folder", out, "--cache-folder", cache, *argv], spark=spark)
    return rc, out, cache


def test_requires_url_or_file(spark, tmp_path, corpus_path):
    with pytest.raises(SystemExit):
        _run(spark, tmp_path, "--corpus-parquet", corpus_path)


def test_url_crawl_and_exports(spark, tmp_path, corpus_path):
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path, "--title", "My Site",
    )
    assert rc == 0
    # output dir derived from url_to_filename(first_url) (cli.py:200-207)
    sub = os.listdir(out)
    assert len(sub) == 1 and "example_com" in sub[0]
    files = os.listdir(os.path.join(out, sub[0]))
    # title -> randomstring_to_filename (cli.py:264)
    assert "My_Site.md" in files and "My_Site.json" in files
    md = open(os.path.join(out, sub[0], "My_Site.md"), encoding="utf-8").read()
    assert md.startswith("# My Site\n")
    data = json.loads(
        open(os.path.join(out, sub[0], "My_Site.json"), encoding="utf-8").read())
    assert data and {"url", "content", "metadata"} <= set(data[0])


def test_default_sharded_export_byte_identical_to_small(spark, tmp_path,
                                                        corpus_path):
    """The CLI default is the executor-written sharded export path;
    --small-export keeps the driver-collect assembly.  Same crawl cache,
    byte-identical files both ways."""
    common = ["--url", corpus.seed_url(),
              "--base-url", "https://h0.example.com/",
              "--corpus-parquet", corpus_path, "--title", "Parity"]
    rc1, out1, cache = _run(spark, tmp_path, *common, name="sharded")
    # reuse the cache (resume path) so both exports render the same crawl
    out2 = str(tmp_path / "out_small")
    rc2 = cli.main(["--output-folder", out2, "--cache-folder", cache,
                    *common, "--small-export"], spark=spark)
    assert rc1 == 0 and rc2 == 0

    def _read(base):
        sub = os.listdir(base)[0]
        d = os.path.join(base, sub)
        return (open(os.path.join(d, "Parity.md"), "rb").read(),
                open(os.path.join(d, "Parity.json"), "rb").read())

    md1, js1 = _read(out1)
    md2, js2 = _read(out2)
    assert md1 == md2 and js1 == js2
    # and no shard temp dirs left behind next to the outputs
    sub = os.listdir(out1)[0]
    assert not [f for f in os.listdir(os.path.join(out1, sub))
                if f.startswith(("md_shards_", "json_shards_"))]


def test_no_markdown_no_json_flags(spark, tmp_path, corpus_path):
    rc, out, _ = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--no-markdown", "--no-json", name="noexp",
    )
    sub = os.listdir(out)[0]
    assert os.listdir(os.path.join(out, sub)) == []


def test_urls_file_static_frontier(spark, tmp_path, corpus_path):
    # seeding from a file disables link discovery (O9)
    seeds_path = tmp_path / "seeds.txt"
    url0 = corpus.seed_url()
    seeds_path.write_text(f"{url0}\n{url0}#dup\nhttps://h0.example.com/docs/p1\n")
    rc, out, cache = _run(
        spark, tmp_path, "--urls-file", str(seeds_path),
        "--corpus-parquet", corpus_path, name="file",
    )
    assert rc == 0
    # only the deduped seeds were crawled — no BFS expansion
    from crawler_to_md_spark.operators.crawl import CrawlEngine

    eng = CrawlEngine(spark, os.path.join(cache, os.listdir(cache)[0]))
    assert eng.total_link_count() == 2


def test_overwrite_cache(spark, tmp_path, corpus_path):
    args = ["--url", corpus.seed_url(), "--base-url", "https://h0.example.com/",
            "--corpus-parquet", corpus_path]
    rc, out, cache = _run(spark, tmp_path, *args, name="ow")
    wh = os.path.join(cache, os.listdir(cache)[0])
    marker = os.path.join(wh, "MARKER")
    open(marker, "w").write("x")
    # rerun without -w resumes the existing warehouse (marker survives)
    cli.main(["--output-folder", out, "--cache-folder", cache, *args], spark=spark)
    assert os.path.exists(marker)
    # -w destroys and recrawls (S13, cli.py:225-231)
    cli.main(["--output-folder", out, "--cache-folder", cache,
              "--overwrite-cache", *args], spark=spark)
    assert not os.path.exists(marker)
    assert os.path.exists(os.path.join(wh, "manifest.json"))


def test_flag_plumbing_into_config(spark, tmp_path, corpus_path, monkeypatch):
    captured = {}
    from crawler_to_md_spark.operators import crawl as crawl_mod

    real_engine = crawl_mod.CrawlEngine

    class Spy(real_engine):
        def __init__(self, spark_, wh, corpus=None, config=None, **kw):
            captured["config"] = config
            super().__init__(spark_, wh, corpus=corpus, config=config, **kw)

    monkeypatch.setattr(cli, "main", cli.main)  # keep ref importable
    import crawler_to_md_spark.operators.crawl as cm
    monkeypatch.setattr(cm, "CrawlEngine", Spy)
    _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--include-url", "docs", "--exclude-url", "private",
        "--rate-limit", "30", "--delay", "0.5", "--timeout", "7",
        "--proxy", "http://proxy:1", "--max-retries", "2",
        "--include", "#main", "--exclude", ".nav",
        "--trap-threshold", "123", "--revalidate", name="plumb",
    )
    c = captured["config"]
    assert c.trap_min_urls == 123
    assert c.revalidate is True
    assert c.include_patterns == ["docs"] and c.exclude_patterns == ["private"]
    assert c.rate_limit == 30 and c.delay == 0.5 and c.timeout == 7
    assert c.proxy == "http://proxy:1" and c.max_retries == 2
    assert c.css_include == ["#main"] and c.css_exclude == [".nav"]
    assert c.scope_base_url == "https://h0.example.com/"


def test_seed_frame_stdin(spark, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("https://a.com/x\nhttps://b.com/y\n"))
    rows = seeds.seed_frame(spark, "-").orderBy("seed_seq").collect()
    assert [r["raw"] for r in rows] == ["https://a.com/x", "https://b.com/y"]


def test_seed_frame_file_order(spark, tmp_path):
    p = tmp_path / "s.txt"
    urls = [f"https://h.com/p{i}" for i in range(50)]
    p.write_text("\n".join(urls) + "\n")
    rows = seeds.seed_frame(spark, str(p)).orderBy("seed_seq").collect()
    assert [r["raw"] for r in rows] == urls


def test_seen_filter_cuckoo_flag(spark, tmp_path, corpus_path):
    """--seen-filter cuckoo crawls to the same end state as the default."""
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path, "--title", "CK",
        "--seen-filter", "cuckoo", name="ck",
    )
    assert rc == 0
    sub = os.listdir(out)[0]
    data = json.loads(
        open(os.path.join(out, sub, "CK.json"), encoding="utf-8").read())
    assert data                        # ok pages exported
    # the warehouse really used the cuckoo backend (npz shards, not npy)
    import glob
    wh = os.path.join(cache, os.listdir(cache)[0])
    assert glob.glob(os.path.join(wh, "bloom", "shard-*.npz"))
    assert not glob.glob(os.path.join(wh, "bloom", "shard-*.npy"))


def test_respect_robots_refreshes_on_resume(spark, tmp_path, corpus_path,
                                            monkeypatch):
    """--respect-robots fetches seed-host rules on a fresh run and calls
    CrawlEngine.refresh_robots (all FRONTIER hosts, incl. discovered ones)
    before a resumed run — cli.py resume branch."""
    from pyspark.sql import functions as F

    import crawler_to_md_spark.sources.robots as robots_src
    from crawler_to_md_spark.operators import crawl as crawl_mod

    def fake_fetch(hosts, policy, transport_factory=None, agent="",
                   emit_all=False):
        return hosts.select("host").distinct().withColumn(
            "disallow", F.array().cast("array<string>"))

    monkeypatch.setattr(robots_src, "fetch_robots", fake_fetch)

    calls: list[str] = []

    def spy_refresh(self, transport_factory=None, agent="?"):
        calls.append(agent)
        return 0

    monkeypatch.setattr(crawl_mod.CrawlEngine, "refresh_robots", spy_refresh)

    args = ("--url", corpus.seed_url(),
            "--base-url", "https://h0.example.com/",
            "--corpus-parquet", corpus_path, "--respect-robots")
    rc, out, cache = _run(spark, tmp_path, *args, name="rr")
    assert rc == 0
    assert calls == []                       # fresh run: seed fetch only
    rc2, _, _ = _run(spark, tmp_path, *args, name="rr")   # same cache dir
    assert rc2 == 0
    assert calls == ["crawler-to-md-spark"]  # resume refreshed frontier hosts


def test_training_shards_export(spark, tmp_path, corpus_path):
    """--training-shards-dir materializes the crawl -> shards pipeline:
    bounded parquet layout, every ok page present exactly once, shard
    assignment consistent with the stream arithmetic."""
    import glob

    shards = str(tmp_path / "tshards")
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--training-shards-dir", shards, "--token-budget", "64",
        "--drop-soft404", name="ts",
    )
    assert rc == 0  # synthetic pages have unique bodies: nothing dropped
    dirs = glob.glob(os.path.join(shards, "file_id=*"))
    assert dirs
    back = spark.read.parquet(shards)
    rows = sorted(back.collect(), key=lambda r: r["url"])
    assert len(rows) == len({r["url"] for r in rows})       # one row/page
    stream = 0
    for r in rows:                                           # url order
        assert r["shard_id"] == stream // 64
        assert r["shard_offset"] == stream % 64
        stream += r["n_tokens"]
    assert rows[-1]["shard_id"] > 0


def test_clean_training_shards_export(spark, tmp_path, corpus_path):
    """--clean --training-shards-dir runs the FULL cleaning pipeline
    (quality gate -> exact dedup -> LSH near-dup collapse -> drop) before
    packing: the output is a subset of the unclean export, carries no two
    identical texts, every page clears the token gate, and the shard
    stream arithmetic still holds over the cleaned order."""
    import glob

    base = str(tmp_path / "tshards_base")
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--training-shards-dir", base, "--token-budget", "64",
        name="tsbase",
    )
    assert rc == 0
    shards = str(tmp_path / "tshards_clean")
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--training-shards-dir", shards, "--token-budget", "64",
        "--clean", "--clean-min-tokens", "5",
        name="tsclean",
    )
    assert rc == 0
    assert glob.glob(os.path.join(shards, "file_id=*"))
    base_rows = {r["url"]: r for r in spark.read.parquet(base).collect()}
    rows = sorted(spark.read.parquet(shards).collect(),
                  key=lambda r: r["url"])
    assert rows and set(r["url"] for r in rows) <= set(base_rows)
    texts = [r["text"] for r in rows]
    assert len(texts) == len(set(texts))          # exact dedup held
    assert all(r["n_tokens"] >= 5 for r in rows)  # quality gate held
    stream = 0
    for r in rows:                                # url order, cleaned set
        assert r["shard_id"] == stream // 64
        assert r["shard_offset"] == stream % 64
        stream += r["n_tokens"]


def test_clean_decontaminate_bench(spark, tmp_path, corpus_path):
    """--decontaminate-bench drops training pages sharing a k-gram with
    the benchmark parquet from the cleaned shard export."""
    shards = str(tmp_path / "dshards_base")
    args = ("--url", corpus.seed_url(),
            "--base-url", "https://h0.example.com/",
            "--corpus-parquet", corpus_path,
            "--token-budget", "64", "--clean", "--clean-min-tokens", "5")
    rc, out, cache = _run(spark, tmp_path, *args,
                          "--training-shards-dir", shards, name="dbase")
    assert rc == 0
    base_rows = {r["url"]: r["text"]
                 for r in spark.read.parquet(shards).collect()}
    victim_url = sorted(base_rows)[0]
    bench_pq = str(tmp_path / "bench.parquet")
    spark.createDataFrame([(base_rows[victim_url],)],
                          "text string").write.parquet(bench_pq)
    shards2 = str(tmp_path / "dshards_decontam")
    rc, out, cache = _run(spark, tmp_path, *args,
                          "--training-shards-dir", shards2,
                          "--decontaminate-bench", bench_pq,
                          "--decontaminate-k", "8", name="ddecon")
    assert rc == 0
    kept = {r["url"] for r in spark.read.parquet(shards2).collect()}
    assert victim_url not in kept                # contaminated page gone
    assert kept and kept <= set(base_rows)       # still a clean subset


def test_host_budgets_and_rank_hosts_flags(spark, tmp_path, corpus_path):
    """--host-budgets-parquet throttles h0 on the fresh run; --rank-hosts
    installs the authority priority on resume (smoke: both paths run to
    completion and the exports still render)."""
    budgets_path = str(tmp_path / "budgets.parquet")
    spark.createDataFrame(
        [("h0.example.com", 2)], "host string, budget int"
    ).write.parquet(budgets_path)
    common = ["--url", corpus.seed_url(),
              "--base-url", "https://h0.example.com/",
              "--corpus-parquet", corpus_path, "--title", "Ranked",
              "--host-budgets-parquet", budgets_path]
    rc1, out, cache = _run(spark, tmp_path, *common, name="budg")
    assert rc1 == 0
    # resume with authority ranking over the crawled graph
    out2 = str(tmp_path / "out_budg2")
    rc2 = cli.main(["--output-folder", out2, "--cache-folder", cache,
                    *common, "--rank-hosts"], spark=spark)
    assert rc2 == 0
    sub = os.listdir(out)
    files = os.listdir(os.path.join(out, sub[0]))
    assert "Ranked.md" in files


def test_export_wet_dir(spark, tmp_path, corpus_path):
    """--export-wet-dir writes the ok pages as a WET archive whose records
    round-trip (urls and markdown payloads) through the archive reader."""
    from crawler_to_md_spark.sources import archive

    wet = str(tmp_path / "wet_out")
    rc, out, cache = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--export-wet-dir", wet, name="wet",
    )
    assert rc == 0
    back = archive.read_wet(spark, wet)
    assert back.filter("corrupt IS NOT NULL").count() == 0
    rows = back.collect()
    urls = {r["url"] for r in rows}
    assert len(rows) == len(urls)                       # one record/page
    assert all(r["text"] for r in rows)                 # markdown payloads
    assert any("# Doc" in r["text"] for r in rows)


def test_wet_input_training_shards(spark, tmp_path):
    """--wet-input skips the crawl: archive records (minus corrupt ones)
    flow straight into the packing path."""
    from crawler_to_md_spark.sources import archive

    docs = spark.createDataFrame(
        [(f"https://a/{i}", f"tok{i} " * (i % 5 + 4)) for i in range(30)],
        "url string, text string")
    wet = str(tmp_path / "wet_in")
    archive.write_wet(docs, wet)
    # append one unframeable record: must be dropped, not crash the run
    with open(os.path.join(wet, "part-zz.txt"), "w", newline="") as f:
        f.write("WARC/1.0\r\nWARC-Target-URI: bad\r\n\r\nno length\r\n\r\n")
    shards = str(tmp_path / "wet_shards")
    rc = cli.main(["--wet-input", wet, "--training-shards-dir", shards,
                   "--token-budget", "32"], spark=spark)
    assert rc == 0
    back = spark.read.parquet(shards)
    assert back.count() == 30
    assert {r["url"] for r in back.collect()} == {r["url"] for r in docs.collect()}


def test_wet_input_requires_shards_dir(spark, tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["--wet-input", str(tmp_path / "nope")], spark=spark)


def test_sitemap_discover_seeds_from_robots(spark, tmp_path, corpus_path,
                                            monkeypatch):
    """--sitemap-discover: seeds come from the --url host's robots.txt
    Sitemap: directives (static frontier), fetched via the (patched)
    robots transport."""
    from crawler_to_md_spark.sources import robots as robots_mod

    site = corpus.seed_url()                       # https://h0.example.com/...
    urlset = ("<urlset><url><loc>" + site + "</loc></url></urlset>")
    bodies = {
        "https://h0.example.com/robots.txt":
            (200, b"User-agent: *\nSitemap: https://h0.example.com/sm.xml\n"),
        "https://h0.example.com/sm.xml": (200, urlset.encode()),
    }

    def fake_factory():
        def transport(url, timeout, proxy, want_body):
            status, body = bodies.get(url, (0, None))
            if status == 0:
                raise ConnectionError("unreachable")
            return status, "text/plain", body if want_body else None, None
        return transport

    monkeypatch.setattr(robots_mod, "requests_text_transport", fake_factory)
    rc, out, cache = _run(
        spark, tmp_path, "--url", site,
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path, "--sitemap-discover",
        name="smdisc",
    )
    assert rc == 0
    sub = os.listdir(out)
    files = os.listdir(os.path.join(out, sub[0]))
    assert any(f.endswith(".md") for f in files)


def test_clean_dup_window_cut_mode(spark, tmp_path):
    """--wet-input --clean --clean-dup-window-mode cut: documents keep
    their rows but lose corpus-wide duplicated windows before packing."""
    from crawler_to_md_spark.sources import archive

    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [("https://h/1", shared + " original tail with plenty words"),
         ("https://h/2", shared + " second doc keeps only this part"),
         ("https://h/3", "fresh standalone row of entirely new words")],
        "url string, text string")
    wet = str(tmp_path / "cut_wet")
    archive.write_wet(docs, wet)
    shards = str(tmp_path / "cut_shards")
    rc = cli.main(["--wet-input", wet, "--training-shards-dir", shards,
                   "--clean", "--clean-threshold", "0.95",
                   "--clean-min-tokens", "3",
                   "--clean-dup-window", "1.0",
                   "--clean-dup-window-mode", "cut",
                   "--token-budget", "64"], spark=spark)
    assert rc == 0
    back = {r["url"]: r["n_tokens"]
            for r in spark.read.parquet(shards).collect()}
    assert len(back) == 3                      # cut, not dropped
    # doc 2 lost the 12 shared tokens; doc 1 (first occurrence) did not
    assert back["https://h/1"] > back["https://h/2"]


def test_health_report_prints_sections(spark, tmp_path, corpus_path, capsys):
    rc, _, _ = _run(
        spark, tmp_path, "--url", corpus.seed_url(),
        "--base-url", "https://h0.example.com/",
        "--corpus-parquet", corpus_path,
        "--health-report", "--no-markdown", "--no-json", name="health",
    )
    assert rc == 0
    got = capsys.readouterr().out
    assert "per-host crawl health" in got
    assert "soft-404 candidates" in got
    assert "crawl-trap candidates" in got
    assert "mirror-host candidates" in got
    assert "h0.example.com" in got          # the report has real rows
