"""WET-lite archive source (sources/archive.py): write → splittable read
round trip, octet-exact Content-Length semantics, and quarantine behavior
for records the splittable fast path cannot frame."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_to_md_spark.sources import archive


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, lang string, text string")


ROWS = [
    (1, "https://a.example.com/x", "en", "plain single line"),
    (2, "https://a.example.com/y", "de",
     "multi\nline\npayload with\ttabs and  double spaces"),
    (3, "https://b.example.com/", "fr", ""),                  # empty payload
    (4, "https://b.example.com/u", "en", "unicode: héllo wörld — 你好 ✓"),
    (5, "https://b.example.com/crlf", "en",
     "payload with\r\nCRLF line breaks\r\nbut no record boundary"),
]


def _roundtrip(spark, tmp_path, rows, partitions=None):
    df = _docs(spark, rows)
    if partitions:
        df = df.repartition(partitions)
    path = os.path.join(str(tmp_path), "wet")
    archive.write_wet(df, path, id_col="doc_id", lang_col="lang")
    return archive.read_wet(spark, path)


class TestRoundTrip:
    def test_all_fields_and_payloads(self, spark, tmp_path):
        got = {int(r["record_id"]): r
               for r in _roundtrip(spark, tmp_path, ROWS).collect()}
        assert len(got) == len(ROWS)
        for doc_id, url, lang, text in ROWS:
            r = got[doc_id]
            assert r["corrupt"] is None
            assert r["url"] == url
            assert r["language"] == lang
            assert r["text"] == text
            assert r["content_length"] == len(text.encode("utf-8"))

    def test_unicode_content_length_is_octets(self, spark, tmp_path):
        [r] = _roundtrip(spark, tmp_path, [ROWS[3]]).collect()
        assert r["content_length"] > len(ROWS[3][3])  # octets > chars
        assert r["text"] == ROWS[3][3]

    def test_multiple_partitions_multiple_files(self, spark, tmp_path):
        rows = [(i, f"https://h{i % 3}.example.com/{i}", "en",
                 f"payload number {i} " * (i % 5 + 1)) for i in range(40)]
        out = _roundtrip(spark, tmp_path, rows, partitions=7)
        got = out.filter("corrupt IS NULL").count()
        assert got == 40
        # every file head keeps a version line the parser must skip
        path = os.path.join(str(tmp_path), "wet")
        files = [f for f in os.listdir(path) if f.startswith("part-")]
        assert len(files) > 1

    def test_read_is_distributed_not_single_task(self, spark, tmp_path):
        out = _roundtrip(spark, tmp_path,
                         [(i, f"https://x/{i}", "en", "t " * 10)
                          for i in range(20)], partitions=5)
        # scan parallelism follows the file layout, not a driver loop
        assert out.rdd.getNumPartitions() >= 1
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan or "Python" in plan  # vectorized UDF
        assert "Exchange" not in plan  # pure scan+project: no shuffle


class TestQuarantine:
    def test_payload_embedding_record_boundary_is_quarantined(
            self, spark, tmp_path):
        evil = "before\r\n\r\nWARC/1.0\r\nafter pretending to be a record"
        rows = [ROWS[0], (9, "https://evil/", "en", evil), ROWS[1]]
        out = _roundtrip(spark, tmp_path, rows, partitions=1).collect()
        clean = [r for r in out if r["corrupt"] is None]
        bad = [r for r in out if r["corrupt"] is not None]
        # the two framing halves of the evil record are quarantined;
        # every other record still parses clean
        assert {int(r["record_id"]) for r in clean} == {1, 2}
        assert len(bad) == 2
        assert any("short" in r["corrupt"] for r in bad)

    def test_hand_built_corruption_reasons(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "wet")
        os.makedirs(path)
        recs = [
            "WARC/1.0\r\nWARC-Target-URI: u1\r\nContent-Length: 2\r\n\r\nok",
            "WARC/1.0\r\nWARC-Target-URI: u2\r\n\r\nno content length",
            "WARC/1.0\r\nWARC-Target-URI: u3\r\nContent-Length: 1\r\n\r\nzz",
            "WARC/1.0\r\nbroken header line no colon\r\n"
            "Content-Length: 1\r\n\r\nx",
        ]
        with open(os.path.join(path, "part-00000.txt"), "w", newline="") as f:
            f.write("\r\n\r\n".join(recs) + "\r\n\r\n")
        out = {r["url"]: r for r in archive.read_wet(spark, path).collect()}
        assert out["u1"]["corrupt"] is None and out["u1"]["text"] == "ok"
        assert "Content-Length" in out["u2"]["corrupt"]
        assert "trailing" in out["u3"]["corrupt"]
        bad_header = [r for u, r in out.items() if u is None]
        assert len(bad_header) == 1
        assert "header" in bad_header[0]["corrupt"]

    def test_content_length_splitting_utf8_sequence(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "wet")
        os.makedirs(path)
        payload = "é"  # 2 octets
        rec = (f"WARC/1.0\r\nWARC-Target-URI: u\r\nContent-Length: 1\r\n"
               f"\r\n{payload}")
        # 1 octet of a 2-octet sequence + 1 trailing octet: the trailing
        # check fires first (tail is neither empty nor the terminator)
        with open(os.path.join(path, "part-00000.txt"), "w", newline="",
                  encoding="utf-8") as f:
            f.write(rec + "\r\n\r\n")
        [r] = archive.read_wet(spark, path).collect()
        assert r["corrupt"] is not None


class TestWriterShape:
    def test_records_are_pure_projection(self, spark):
        df = _docs(spark, ROWS)
        recs = archive.wet_records(df, id_col="doc_id", lang_col="lang")
        plan = recs._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan  # native string build, no UDF

    def test_octet_length_header(self, spark):
        df = _docs(spark, [ROWS[3]])
        [rec] = archive.wet_records(df).collect()
        text = ROWS[3][3]
        assert f"Content-Length: {len(text.encode('utf-8'))}\r\n" in rec[0]


class TestGzippedArchive:
    def test_gz_files_parse_transparently(self, spark, tmp_path):
        """Real WET archives ship as .wet.gz: Spark's text source
        decompresses them transparently (one whole file per task — gzip
        is not splittable, which is why Common Crawl shards its corpus
        into ~1 GB files; many files still fan out across executors)."""
        import gzip

        df = _docs(spark, ROWS)
        plain = os.path.join(str(tmp_path), "plain")
        archive.write_wet(df, plain, id_col="doc_id", lang_col="lang")
        gzdir = os.path.join(str(tmp_path), "gz")
        os.makedirs(gzdir)
        for i, f in enumerate(sorted(os.listdir(plain))):
            if not f.startswith("part-"):
                continue
            with open(os.path.join(plain, f), "rb") as src, \
                    gzip.open(os.path.join(gzdir, f"part-{i}.txt.gz"),
                              "wb") as dst:
                dst.write(src.read())
        out = archive.read_wet(spark, gzdir)
        got = {int(r["record_id"]): r["text"]
               for r in out.filter("corrupt IS NULL").collect()}
        assert got == {doc_id: text for doc_id, _, _, text in ROWS}


class TestFramingProperty:
    def test_arbitrary_payloads_roundtrip_or_quarantine(self):
        """Property: for ANY payload set, simulating the full write →
        lineSep-split → parse pipeline yields, per record, either the
        exact original payload or a corrupt flag — never silently wrong
        text.  Pure-Python twin of the Spark path: the writer emits the
        same record strings (wet_records' concat formula) and the reader
        splits on the same lineSep."""
        from hypothesis import given, settings, strategies as st

        payload = st.text(
            alphabet=st.characters(codec="utf-8",
                                   exclude_characters=["\x00"]),
            max_size=200)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(payload, min_size=1, max_size=6))
        def run(texts):
            recs = []
            for i, t in enumerate(texts):
                recs.append(
                    f"WARC/1.0\r\n{archive.H_ID}: {i}\r\n"
                    f"{archive.H_URI}: u{i}\r\n"
                    f"{archive.H_LEN}: {len(t.encode('utf-8'))}\r\n\r\n{t}")
            stream = archive._SEP.join(recs) + archive._SEP
            frags = [f for f in
                     stream.split(archive._SEP + archive.MARKER + "\r\n")
                     if f.strip()]
            parsed = [archive._parse_fragment(f) for f in frags]
            by_id = {p["record_id"]: p for p in parsed
                     if p["record_id"] is not None and p["corrupt"] is None}
            for i, t in enumerate(texts):
                p = by_id.get(str(i))
                if p is not None:            # parsed clean -> must be exact
                    assert p["text"] == t
            # a payload with no embedded record boundary MUST parse clean
            for i, t in enumerate(texts):
                if archive._SEP + archive.MARKER + "\r\n" not in t \
                        and not t.endswith("\r\n\r\nWARC/1.0") \
                        and str(i) not in by_id:
                    raise AssertionError(
                        f"clean payload {t!r} failed to parse")

        run()


# ---------------------------------------------------------------------------
# WARC-response dialect
# ---------------------------------------------------------------------------

class TestWarc:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "https://a/x", 200, "<html><p>héllo→ page</p></html>"),
             (2, "https://a/y", 404, "<html>not here</html>"),
             (3, "https://a/z", 200, "")],
            "id long, url string, status int, html string")

    def test_roundtrip_status_and_octet_framing(self, spark, tmp_path):
        p = str(tmp_path / "warc")
        archive.write_warc(self._docs(spark), p,
                           status_col="status", id_col="id")
        rows = {r["record_id"]: r
                for r in archive.read_warc(spark, p).collect()}
        assert all(r["corrupt"] is None for r in rows.values())
        assert rows["1"]["html"] == "<html><p>héllo→ page</p></html>"
        assert rows["1"]["status_code"] == 200
        assert rows["2"]["status_code"] == 404
        assert rows["3"]["html"] == ""
        assert all(r["kind"] == "response" and
                   r["content_type"] == "text/html" for r in rows.values())

    def test_non_response_records_parse_clean_with_null_html(
            self, spark, tmp_path):
        rec = ("WARC/1.0\r\nWARC-Type: warcinfo\r\n"
               "Content-Length: 9\r\n\r\nrobots: x")
        f = tmp_path / "w" ; f.mkdir()
        (f / "a.warc").write_text(rec, newline="")
        rows = archive.read_warc(spark, str(f)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["kind"] == "warcinfo" and r["corrupt"] is None
        assert r["html"] is None and r["status_code"] is None

    def test_http_content_length_mismatch_quarantined(self, spark, tmp_path):
        body = "<html>x</html>"
        block = (f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                 f"Content-Length: 999\r\n\r\n{body}")
        rec = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"WARC-Target-URI: https://a/b\r\n"
               f"Content-Length: {len(block.encode())}\r\n\r\n{block}")
        f = tmp_path / "w2" ; f.mkdir()
        (f / "a.warc").write_text(rec, newline="")
        r = archive.read_warc(spark, str(f)).collect()[0]
        assert r["corrupt"] is not None and "Content-Length" in r["corrupt"]

    def test_malformed_status_line_quarantined(self, spark, tmp_path):
        block = "NOT-HTTP nope\r\n\r\nbody"
        rec = (f"WARC/1.0\r\nWARC-Type: response\r\n"
               f"Content-Length: {len(block.encode())}\r\n\r\n{block}")
        f = tmp_path / "w3" ; f.mkdir()
        (f / "a.warc").write_text(rec, newline="")
        r = archive.read_warc(spark, str(f)).collect()[0]
        assert r["corrupt"] is not None and "status line" in r["corrupt"]

    def test_writer_is_pure_projection(self, spark):
        plan = (archive.warc_records(self._docs(spark), status_col="status")
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan and "Exchange" not in plan


class TestWarcCli:
    def test_warc_input_to_training_shards(self, spark, tmp_path):
        from crawler_to_md_spark import cli

        docs = spark.createDataFrame(
            [(i, f"https://w/p{i}", 200,
              f"<html><head><title>T{i}</title></head><body>"
              f"<h1>Doc {i}</h1><p>{'tok ' * 30}body {i}</p></body></html>")
             for i in range(8)]
            + [(99, "https://w/gone", 404, "<html>missing</html>")],
            "id long, url string, status int, html string")
        warc = str(tmp_path / "in.warc")
        archive.write_warc(docs, warc, status_col="status", id_col="id")
        shards = str(tmp_path / "shards")
        rc = cli.main(["--warc-input", warc,
                       "--training-shards-dir", shards,
                       "--token-budget", "64"], spark=spark)
        assert rc == 0
        back = spark.read.parquet(shards)
        rows = {r["url"]: r["text"] for r in back.collect()}
        assert len(rows) == 8                      # 404 dropped
        assert "https://w/gone" not in rows
        assert rows["https://w/p0"].startswith("# Doc 0")


# ---------------------------------------------------------------------------
# Exact per-file recovery path
# ---------------------------------------------------------------------------

class TestExactScan:
    def test_recovers_payload_embedding_record_boundary(
            self, spark, tmp_path):
        """The case the splittable reader MUST quarantine parses
        byte-identically through the exact Content-Length scan."""
        evil = "before\r\n\r\nWARC/1.0\r\nafter pretending to be a record"
        rows = [ROWS[0], (9, "https://evil/", "en", evil), ROWS[1]]
        path = os.path.join(str(tmp_path), "wet")
        archive.write_wet(_docs(spark, rows).repartition(1), path,
                          id_col="doc_id", lang_col="lang")
        split = archive.read_wet(spark, path).collect()
        assert any(r["corrupt"] is not None for r in split)  # the trade
        exact = {r["record_id"]: r
                 for r in archive.read_wet_exact(spark, path).collect()}
        assert all(r["corrupt"] is None for r in exact.values())
        assert exact["9"]["text"] == evil

    def test_matches_splittable_reader_on_clean_archives(
            self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "wet2")
        archive.write_wet(_docs(spark, ROWS).repartition(2), path,
                          id_col="doc_id", lang_col="lang")
        a = {(r["record_id"], r["text"], r["corrupt"])
             for r in archive.read_wet(spark, path).collect()}
        b = {(r["record_id"], r["text"], r["corrupt"])
             for r in archive.read_wet_exact(spark, path).collect()}
        assert a == b

    def test_unframeable_record_resyncs_not_fatal(self, spark, tmp_path):
        path = os.path.join(str(tmp_path), "wet3")
        os.makedirs(path)
        recs = [
            "WARC/1.0\r\nWARC-Record-ID: 1\r\nContent-Length: 2\r\n\r\nok",
            "WARC/1.0\r\nWARC-Record-ID: 2\r\n\r\nno content length",
            "WARC/1.0\r\nWARC-Record-ID: 3\r\nContent-Length: 3\r\n\r\nfin",
        ]
        with open(os.path.join(path, "a.txt"), "w", newline="") as f:
            f.write("\r\n\r\n".join(recs) + "\r\n\r\n")
        out = archive.read_wet_exact(spark, path).collect()
        by_id = {r["record_id"]: r for r in out}
        assert by_id["1"]["corrupt"] is None and by_id["1"]["text"] == "ok"
        assert by_id["3"]["corrupt"] is None and by_id["3"]["text"] == "fin"
        assert by_id["2"]["corrupt"] is not None  # quarantined, not fatal

    def test_warc_exact_recovers_embedded_boundary_body(
            self, spark, tmp_path):
        body = "<html>x\r\n\r\nWARC/1.0\r\ny</html>"
        docs = spark.createDataFrame(
            [(1, "https://a/x", 200, body)],
            "id long, url string, status int, html string")
        path = os.path.join(str(tmp_path), "warc")
        archive.write_warc(docs, path, status_col="status", id_col="id")
        split = archive.read_warc(spark, path).collect()
        assert any(r["corrupt"] is not None for r in split)
        [r] = archive.read_warc_exact(spark, path).collect()
        assert r["corrupt"] is None and r["html"] == body

    def test_gz_files_scan_transparently(self, spark, tmp_path):
        import gzip

        path = os.path.join(str(tmp_path), "wetgz")
        os.makedirs(path)
        rec = "WARC/1.0\r\nWARC-Record-ID: 7\r\nContent-Length: 5\r\n\r\nhello"
        with gzip.open(os.path.join(path, "a.wet.gz"), "wt",
                       encoding="utf-8", newline="") as f:
            f.write(rec + "\r\n\r\n")
        [r] = archive.read_wet_exact(spark, path).collect()
        assert r["corrupt"] is None and r["text"] == "hello"


class TestExactScanProperty:
    def test_exact_scan_recovers_every_wellformed_payload(self):
        """Property: the exact Content-Length scanner recovers EVERY
        payload byte-identically for ANY payload set — including payloads
        embedding the record boundary — with zero quarantines.  This is
        the guarantee the splittable reader trades away; the pair of
        properties documents the trade precisely."""
        from hypothesis import given, settings, strategies as st

        payload = st.text(
            alphabet=st.characters(codec="utf-8",
                                   exclude_characters=["\x00"]),
            max_size=200)

        @settings(max_examples=200, deadline=None)
        @given(st.lists(payload, min_size=1, max_size=6))
        def run(texts):
            recs = []
            for i, t in enumerate(texts):
                recs.append(
                    f"WARC/1.0\r\n{archive.H_ID}: {i}\r\n"
                    f"{archive.H_URI}: u{i}\r\n"
                    f"{archive.H_LEN}: {len(t.encode('utf-8'))}\r\n\r\n{t}")
            stream = archive._SEP.join(recs) + archive._SEP
            frags = archive._scan_file_exact(stream)
            parsed = [archive._parse_fragment(f) for f in frags]
            assert len(parsed) == len(texts)
            for i, (t, p) in enumerate(zip(texts, parsed)):
                assert p["corrupt"] is None, (t, p)
                assert p["text"] == t
                assert p["record_id"] == str(i)

        run()

    def test_incremental_scan_is_chunk_size_invariant(self):
        """The streaming scanner (bounded-memory refill) must produce the
        same fragments at ANY chunk size — including chunks that split
        headers, payloads, separators, and multi-byte UTF-8 sequences."""
        import io

        from hypothesis import given, settings, strategies as st

        payload = st.text(
            alphabet=st.characters(codec="utf-8",
                                   exclude_characters=["\x00"]),
            max_size=80)

        @settings(max_examples=100, deadline=None)
        @given(st.lists(payload, min_size=1, max_size=5),
               st.integers(min_value=1, max_value=7),
               st.booleans())
        def run(texts, chunk, corrupt_first):
            recs = []
            for i, t in enumerate(texts):
                recs.append(
                    f"WARC/1.0\r\n{archive.H_ID}: {i}\r\n"
                    f"{archive.H_URI}: u{i}\r\n"
                    f"{archive.H_LEN}: {len(t.encode('utf-8'))}\r\n\r\n{t}")
            stream = archive._SEP.join(recs) + archive._SEP
            if corrupt_first:
                # headerless garbage prefix: exercises the resync branch
                stream = "no content length here" + archive._SEP + stream
            whole = [f for f in archive._iter_file_exact(
                io.StringIO(stream), chunk_chars=1 << 20) if f.strip()]
            tiny = [f for f in archive._iter_file_exact(
                io.StringIO(stream), chunk_chars=chunk) if f.strip()]
            assert tiny == whole

        run()
