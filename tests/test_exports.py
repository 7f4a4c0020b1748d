"""Export parity tests (reference tests/test_export_manager.py shapes)."""

from __future__ import annotations

import json
import os

import pytest

from crawler_to_md_spark.exports import (
    export_compiled_json,
    export_compiled_json_sharded,
    export_compiled_markdown,
    export_compiled_markdown_sharded,
    export_individual_markdown,
)
from crawler_to_md_spark.functions.markdown import minify_markdown_str
from crawler_to_md_spark.store.schemas import DOCS_SCHEMA, LINKS_SCHEMA


def _spans(*blocks):
    out = []
    for i, (kind, text, ref) in enumerate(blocks):
        out.append({"kind": kind, "text": text, "media_ref": ref, "offset": i})
    return out


@pytest.fixture(scope="module")
def tables(spark):
    docs_rows = [
        ("https://h/docs/a", _spans(("heading1", "Page A", None),
                                    ("paragraph", "alpha body", None)),
         {"title": "A"}, "ok", 1),
        ("https://h/docs/b/", _spans(("heading2", "Page B", None),
                                     ("code", "x = 1", None),
                                     ("image", None, "https://h/i.png")),
         {"title": "B", "junk": None}, "ok", 1),
        ("https://h/docs/c", None,
         {"scrape_status": "failed", "error_type": "HTTPError",
          "error_message": "HTTP 500"}, "failed", 2),
    ]
    docs = spark.createDataFrame(
        [tuple(r) for r in docs_rows], DOCS_SCHEMA
    )
    links_rows = [
        ("https://h/docs/a", 1, "h", True, 0, 0, 0, 0),
        ("https://h/docs/b/", 2, "h", True, 0, 1, 1, 0),
        ("https://h/docs/c", 3, "h", True, 3, 1, 1, 1),
    ]
    links = spark.createDataFrame(links_rows, LINKS_SCHEMA)
    return docs, links


def test_compiled_markdown_structure(tables):
    docs, links = tables
    out = export_compiled_markdown(docs, links, title="My Crawl")
    assert out.startswith("# My Crawl\n")
    # headers shifted one level (F10): h1 -> ##, h2 -> ###
    assert "\n## Page A\n" in out
    assert "\n### Page B\n" in out
    # URL metadata comment blocks (export_manager.py:193-198)
    assert "<!--\nURL: https://h/docs/a\ntitle: A\n-->" in out
    # NULL-valued metadata keys dropped (P11)
    assert "junk" not in out
    # failed page skipped entirely (P10)
    assert "https://h/docs/c" not in out
    # page separator
    assert "\n---" in out
    # A precedes B (discovery order batch_id, seq)
    assert out.index("Page A") < out.index("Page B")
    # cleanup: no triple newlines anywhere (F11)
    assert "\n\n\n" not in out


def test_compiled_markdown_minify(tables):
    docs, links = tables
    out = export_compiled_markdown(docs, links, title="T", minify=True)
    assert "<!--" not in out            # comments stripped
    assert "\n\n" not in out            # no blank lines outside fences
    assert minify_markdown_str(out) == out  # idempotent
    assert "x = 1" in out               # fenced code preserved


def test_compiled_json_pretty_and_compact(tables):
    docs, links = tables
    pretty = export_compiled_json(docs, links, minify=False)
    compact = export_compiled_json(docs, links, minify=True)
    assert json.loads(pretty) == json.loads(compact)
    data = json.loads(pretty)
    assert [d["url"] for d in data] == ["https://h/docs/a", "https://h/docs/b/"]
    assert data[0]["metadata"] == {"title": "A"}
    assert data[1]["metadata"] == {"title": "B"}  # null value dropped
    assert "alpha body" in data[0]["content"]
    assert pretty.startswith("[\n    {")          # indent=4
    assert "\n" not in compact
    assert '","' in compact or '":"' in compact   # compact separators


def test_individual_export_paths(tables, tmp_path):
    docs, links = tables
    root = export_individual_markdown(docs, links, str(tmp_path))
    assert root == str(tmp_path / "files")
    assert os.path.isfile(tmp_path / "files" / "h" / "docs" / "a.md")
    # trailing slash -> index.md (export_manager.py:287-290)
    assert os.path.isfile(tmp_path / "files" / "h" / "docs" / "b" / "index.md")
    # failed page not exported
    assert not os.path.exists(tmp_path / "files" / "h" / "docs" / "c.md")
    content = (tmp_path / "files" / "h" / "docs" / "a.md").read_text()
    assert "# Page A" in content and "alpha body" in content


def test_individual_export_base_url_strip(tables, tmp_path):
    docs, links = tables
    export_individual_markdown(
        docs, links, str(tmp_path), base_url="https://h/docs/"
    )
    assert os.path.isfile(tmp_path / "files" / "a.md")


@pytest.mark.parametrize("minify", [False, True])
def test_sharded_markdown_byte_parity(tables, tmp_path, minify):
    """The executor-shard path must reproduce the driver-collect output
    byte for byte (VERDICT round 1: driver collect OOMs at scale)."""
    docs, links = tables
    want = export_compiled_markdown(docs, links, title="My Crawl", minify=minify)
    p = str(tmp_path / f"sharded_{minify}.md")
    export_compiled_markdown_sharded(
        docs, links, title="My Crawl", path=p, minify=minify, shards=4)
    assert open(p, encoding="utf-8").read() == want


@pytest.mark.parametrize("minify", [False, True])
def test_sharded_json_byte_parity(tables, tmp_path, minify):
    docs, links = tables
    want = export_compiled_json(docs, links, minify=minify)
    p = str(tmp_path / f"sharded_{minify}.json")
    export_compiled_json_sharded(docs, links, path=p, minify=minify, shards=4)
    assert open(p, encoding="utf-8").read() == want


def test_sharded_exports_empty_corpus(spark, tmp_path):
    docs = spark.createDataFrame([], DOCS_SCHEMA)
    links = spark.createDataFrame([], LINKS_SCHEMA)
    mdp = str(tmp_path / "empty.md")
    export_compiled_markdown_sharded(docs, links, title="T", path=mdp, shards=2)
    assert open(mdp).read() == export_compiled_markdown(docs, links, title="T")
    jp = str(tmp_path / "empty.json")
    export_compiled_json_sharded(docs, links, path=jp, shards=2)
    assert open(jp).read() == "[]"


def test_end_to_end_crawl_export(spark, tmp_path):
    """Crawl a small corpus and export everything — the full §3.2 lifecycle."""
    from crawler_to_md_spark.operators.crawl import CrawlConfig, CrawlEngine
    from crawler_to_md_spark.sources import corpus

    eng = CrawlEngine(
        spark, str(tmp_path / "wh"),
        corpus=corpus.synth_corpus(spark, "/root/testdata/sf0.001", replicas=1),
        config=CrawlConfig(scope_domain="example.com", max_retries=1),
    )
    eng.seed([corpus.seed_url()])
    eng.run()
    md = export_compiled_markdown(eng.docs(), eng.links(), title="Corpus")
    assert md.startswith("# Corpus\n")
    assert md.count("URL: https://") > 100
    data = json.loads(export_compiled_json(eng.docs(), eng.links()))
    ok_count = eng.docs().filter("status = 'ok'").count()
    assert len(data) == ok_count
    # shard path reproduces both compiled files on a real crawl corpus
    mdp = str(tmp_path / "crawl.md")
    export_compiled_markdown_sharded(
        eng.docs(), eng.links(), title="Corpus", path=mdp, shards=8)
    assert open(mdp, encoding="utf-8").read() == md
    jp = str(tmp_path / "crawl.json")
    export_compiled_json_sharded(eng.docs(), eng.links(), path=jp, shards=8)
    assert json.loads(open(jp, encoding="utf-8").read()) == data


class TestTrainingShardSink:
    def test_layout_order_and_content(self, spark, tmp_path):
        """One parquet part per file_id dir; rows inside sorted by
        (shard_id, shard_offset); read-back == pack_shards + text."""
        import glob
        import os

        from crawler_to_md_spark.exports import export_training_shards
        from crawler_to_md_spark.operators.packing import pack_shards

        rows = [(i, " ".join(["w"] * ((i * 29) % 70 + 1)))
                for i in range(300)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = str(tmp_path / "shards")
        export_training_shards(docs, budget=64, out_dir=out,
                               shards_per_file=4)

        dirs = sorted(glob.glob(os.path.join(out, "file_id=*")))
        assert len(dirs) > 1                       # layout actually split
        expect = {
            (r["doc_id"], r["n_tokens"], r["shard_id"], r["shard_offset"])
            for r in pack_shards(docs, 64).collect()
        }
        got = set()
        for d in dirs:
            parts = glob.glob(os.path.join(d, "*.parquet"))
            assert len(parts) == 1                 # exactly one part/dir
            back = spark.read.parquet(parts[0]).collect()
            keys = [(r["shard_id"], r["shard_offset"]) for r in back]
            assert keys == sorted(keys)            # in-file order
            fid = int(d.rsplit("=", 1)[1])
            assert all(r["shard_id"] // 4 == fid for r in back)
            got |= {(r["doc_id"], r["n_tokens"], r["shard_id"],
                     r["shard_offset"]) for r in back}
        assert got == expect


class TestTrainingJsonl:
    def test_jsonl_roundtrip_and_file_bound(self, spark, tmp_path):
        from crawler_to_md_spark.exports import export_training_jsonl

        docs = spark.createDataFrame(
            [(f"https://a/p{i}", f"text body {i}", i) for i in range(50)],
            "url string, text string, n long").repartition(7)
        out = str(tmp_path / "jsonl")
        export_training_jsonl(docs, out, meta_cols=["url", "n"], files=4,
                              order_cols=["url"])
        import glob
        parts = glob.glob(out + "/part-*")
        assert len(parts) == 4
        back = spark.read.json(out)
        assert sorted(back.columns) == ["n", "text", "url"]
        rows = {r["url"]: (r["text"], r["n"]) for r in back.collect()}
        assert len(rows) == 50
        assert rows["https://a/p7"] == ("text body 7", 7)

    def test_lines_are_json_objects_in_order(self, spark, tmp_path):
        import glob
        import json as _json

        from crawler_to_md_spark.exports import export_training_jsonl

        docs = spark.createDataFrame(
            [(f"https://a/p{i:02d}", f"t{i}") for i in range(20)],
            "url string, text string")
        out = str(tmp_path / "jsonl2")
        export_training_jsonl(docs, out, files=1, order_cols=["url"])
        [part] = glob.glob(out + "/part-*")
        lines = [l for l in open(part).read().splitlines() if l]
        objs = [_json.loads(l) for l in lines]
        assert [o["url"] for o in objs] == sorted(o["url"] for o in objs)
        assert objs[0]["text"] == "t0"
