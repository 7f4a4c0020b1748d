"""WET-style text-archive source: bulk ingestion of crawled page text.

A 100 TB training corpus rarely arrives as a live crawl — it arrives as
WARC/WET-style archives (Common Crawl's distribution format: a text file of
concatenated records, each a small header block plus an extracted-text
payload).  This module reads and writes a WET-lite dialect with Spark's
``text`` source, so ingestion is fully distributed and SPLITTABLE:

- **Read**: ``spark.read.text(path, lineSep="\\r\\n\\r\\nWARC/1.0\\r\\n")``
  — Spark splits archive files at arbitrary byte offsets and scans forward
  to the next record boundary, so ONE multi-gigabyte archive file fans out
  across executors (the classic Hadoop-WARC input-format trick expressed
  with a built-in reader, no custom InputFormat).  Each row is then one
  record: header block, blank line, payload.
- **Parse**: an Arrow-batched pandas UDF (UDF discipline, SURVEY §7) maps
  each record fragment to a typed struct.  ``Content-Length`` is the
  ground truth for the payload boundary, counted in OCTETS of the UTF-8
  encoding (the WARC rule): the parser encodes, slices ``clen`` bytes,
  and validates that exactly the record terminator (or end-of-file)
  remains.
- **Quarantine, not silence**: a payload that itself contains the record
  separator splits the fragment mid-record — the halves fail
  Content-Length / header validation and surface as ``corrupt = true``
  rows (count them, inspect them, re-route them through a non-splittable
  path) instead of being silently merged or dropped.  This is the
  documented trade of the splittable fast path; extracted-TEXT payloads
  (WET) practically never embed a bare ``WARC/1.0`` line, which is why
  the ecosystem's splittable WET readers make the same trade.

Reference parity note: the reference engine (msneto/crawler-to-md) has no
archive source — it fetches live pages one requests.get at a time
(scraper.py).  This source exists for the mission's scale shape: the same
downstream pipeline (extraction → cleaning → shards) fed from archived
crawls instead of sockets.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

#: record marker; the read-side lineSep.  A record is MARKER, CRLF header
#: lines, a blank line, then the payload.
MARKER = "WARC/1.0"
_SEP = "\r\n\r\n"

#: headers the writer emits and the parser types.  Unknown headers are
#: preserved-by-skip (the parser reads what it knows, ignores the rest),
#: so real WET records with their fuller header set parse unchanged.
H_URI = "WARC-Target-URI"
H_ID = "WARC-Record-ID"
H_LANG = "WARC-Identified-Content-Language"
H_LEN = "Content-Length"

_PARSED = StructType([
    StructField("record_id", StringType()),
    StructField("url", StringType()),
    StructField("language", StringType()),
    StructField("content_length", LongType()),
    StructField("text", StringType()),
    StructField("corrupt", StringType()),   # NULL = clean, else reason
])


def wet_records(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
) -> DataFrame:
    """One ``record`` string column per input row — marker, headers, blank
    line, payload.  ``Content-Length`` is ``octet_length`` of the payload
    (WARC counts octets, not characters — the unicode tests pin this).
    Built entirely from native string functions: the writer is a pure
    projection, no Python on the write path."""
    parts = [F.lit(MARKER + "\r\n")]
    if id_col is not None:
        parts.append(F.concat(F.lit(H_ID + ": "),
                              F.col(id_col).cast("string"), F.lit("\r\n")))
    parts.append(F.concat(F.lit(H_URI + ": "),
                          F.col(url_col).cast("string"), F.lit("\r\n")))
    if lang_col is not None:
        parts.append(F.concat(F.lit(H_LANG + ": "),
                              F.col(lang_col).cast("string"), F.lit("\r\n")))
    parts.append(F.concat(F.lit(H_LEN + ": "),
                          F.octet_length(F.col(text_col)).cast("string"),
                          F.lit("\r\n")))
    parts.append(F.lit("\r\n"))
    parts.append(F.col(text_col))
    return docs.select(F.concat(*parts).alias("record"))


def write_wet(
    docs: DataFrame,
    path: str,
    url_col: str = "url",
    text_col: str = "text",
    id_col: str | None = None,
    lang_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a WET-lite archive: one text file per partition, records
    separated by the blank-line terminator (the writer's ``lineSep``), so
    the archive byte stream is ``rec \\r\\n\\r\\n rec \\r\\n\\r\\n ...`` —
    exactly what :func:`read_wet` splits.  Partitioning is preserved:
    a 10^9-record corpus writes as that many-way parallel files."""
    recs = wet_records(docs, url_col=url_col, text_col=text_col,
                       id_col=id_col, lang_col=lang_col)
    recs.write.mode(mode).option("lineSep", _SEP).text(path)


def _parse_fragment(frag: str) -> dict:
    """One lineSep-split fragment -> parsed record dict (see _PARSED)."""
    out = {"record_id": None, "url": None, "language": None,
           "content_length": None, "text": None, "corrupt": None}
    head, sep, rest = frag.partition(_SEP)
    if not sep:
        out["corrupt"] = "no header/payload separator"
        return out
    headers: dict[str, str] = {}
    for line in head.split("\r\n"):
        if not line or line == MARKER:
            # the file-head fragment keeps its leading version line (only
            # INTERIOR record boundaries are consumed by the lineSep);
            # real WET version lines are skipped the same way
            continue
        k, colon, v = line.partition(":")
        if not colon:
            out["corrupt"] = f"malformed header line: {line[:40]!r}"
            return out
        headers[k.strip()] = v.strip()
    out["record_id"] = headers.get(H_ID)
    out["url"] = headers.get(H_URI)
    out["language"] = headers.get(H_LANG)
    clen_s = headers.get(H_LEN)
    if clen_s is None or not clen_s.isdigit():
        out["corrupt"] = "missing/invalid Content-Length"
        return out
    clen = int(clen_s)
    out["content_length"] = clen
    raw = rest.encode("utf-8")
    if len(raw) < clen:
        # the payload embedded the record separator+marker and the reader
        # split mid-record — quarantine, never silently truncate
        out["corrupt"] = f"payload short: {len(raw)} of {clen} octets"
        return out
    tail = raw[clen:]
    if tail not in (b"", _SEP.encode()):
        out["corrupt"] = f"unexpected {len(tail)} trailing octets"
        return out
    try:
        out["text"] = raw[:clen].decode("utf-8")
    except UnicodeDecodeError:
        # Content-Length landed inside a multi-byte sequence: the header
        # lies about the payload it frames
        out["corrupt"] = "Content-Length splits a UTF-8 sequence"
    return out


@F.pandas_udf(_PARSED)
def _parse_wet_udf(frags: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for batch in frags:
        yield pd.DataFrame([_parse_fragment(f) for f in batch],
                           columns=_PARSED.fieldNames())


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET-archive scan -> one typed row per record:
    ``(record_id, url, language, content_length, text, corrupt)``.

    ``corrupt IS NULL`` rows are clean; non-null rows carry the reason and
    whatever headers did parse (quarantine table semantics).  The
    ``lineSep`` is the full record boundary — blank line THEN marker — so
    a payload only mis-splits if it embeds that exact four-line shape
    (quarantined when it does); each file's first fragment keeps its
    leading version line, which the header parser skips."""
    frags = spark.read.option("lineSep", _SEP + MARKER + "\r\n").text(path)
    return _parse_fragments(frags)


def _parse_fragments(frags: DataFrame) -> DataFrame:
    return (
        frags.filter(F.length(F.rtrim(F.col("value"))) > 0)
        .select(_parse_wet_udf(F.col("value")).alias("r"))
        .select("r.*")
    )


def read_wet_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming WET source: archive files landing in ``path`` (a fetch
    fleet dropping ``.wet``/``.wet.gz`` shards on object storage) stream
    through the same record-boundary split + Arrow parse as
    :func:`read_wet` — files are the replayable offsets, so epochs are
    deterministic.  Emits clean ``(url, text)`` rows, the
    ``StreamingCorpusIngest`` input contract (streaming/ingest.py);
    corrupt records are dropped here — quarantine auditing belongs to a
    batch :func:`read_wet` pass over the same immutable files."""
    reader = spark.readStream.option("lineSep", _SEP + MARKER + "\r\n")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    return (
        _parse_fragments(reader.text(path))
        .filter(F.col("corrupt").isNull())
        .select("url", "text")
    )


# ---------------------------------------------------------------------------
# WARC-response dialect (raw HTTP captures, the Common Crawl WARC shape)
# ---------------------------------------------------------------------------

H_TYPE = "WARC-Type"

_CRLF = "\r\n"

_STATUS_RE = re.compile(r"^HTTP/\d\.\d (\d{3})")

#: minimal reason phrases the writer emits; the parser never needs them
#: (it reads the numeric code), so unknown codes write a generic phrase
_REASONS = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
            429: "Too Many Requests", 500: "Internal Server Error"}

_WARC_PARSED = StructType([
    StructField("record_id", StringType()),
    StructField("url", StringType()),
    StructField("kind", StringType()),            # WARC-Type
    StructField("status_code", LongType()),
    StructField("content_type", StringType()),    # HTTP-level
    StructField("content_length", LongType()),    # WARC block octets
    StructField("html", StringType()),            # HTTP body
    StructField("corrupt", StringType()),         # NULL = clean
])


def warc_records(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    status_col: str | None = None,
    ctype_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """One WARC ``response`` record string per row: WARC headers framing
    an HTTP/1.1 response block (status line, Content-Type,
    Content-Length in octets, blank line, body).  Pure native projection
    like :func:`wet_records` — both Content-Lengths are
    ``octet_length`` so multi-byte payloads frame correctly."""
    status = (F.col(status_col).cast("int") if status_col
              else F.lit(200))
    reason = F.lit("Status")
    for code, phrase in _REASONS.items():
        reason = F.when(status == code, F.lit(phrase)).otherwise(reason)
    ctype = F.col(ctype_col) if ctype_col else F.lit("text/html")
    body = F.coalesce(F.col(html_col), F.lit(""))
    block = F.concat(
        F.lit("HTTP/1.1 "), status.cast("string"), F.lit(" "), reason,
        F.lit(_CRLF), F.lit("Content-Type: "), ctype,
        F.lit(_CRLF), F.lit("Content-Length: "),
        F.octet_length(body).cast("string"),
        F.lit(_SEP), body,
    )
    headers = [
        F.lit(MARKER), F.lit(_CRLF),
        F.lit(f"{H_TYPE}: response"), F.lit(_CRLF),
    ]
    if id_col is not None:
        headers += [F.lit(f"{H_ID}: "), F.col(id_col).cast("string"),
                    F.lit(_CRLF)]
    headers += [
        F.lit(f"{H_URI}: "), F.col(url_col), F.lit(_CRLF),
        F.lit("Content-Type: application/http;msgtype=response"),
        F.lit(_CRLF),
        F.lit(f"{H_LEN}: "), F.octet_length(block).cast("string"),
        F.lit(_SEP), block,
    ]
    return docs.select(F.concat(*headers).alias("record"))


def write_warc(
    docs: DataFrame,
    path: str,
    url_col: str = "url",
    html_col: str = "html",
    status_col: str | None = None,
    ctype_col: str | None = None,
    id_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a WARC-response archive with the same record-terminator
    layout as :func:`write_wet` (so :func:`read_warc` splits it)."""
    recs = warc_records(docs, url_col=url_col, html_col=html_col,
                        status_col=status_col, ctype_col=ctype_col,
                        id_col=id_col)
    recs.write.mode(mode).option("lineSep", _SEP).text(path)


def _parse_warc_fragment(frag: str) -> dict:
    """One lineSep-split fragment -> parsed WARC-response dict."""
    out = {"record_id": None, "url": None, "kind": None,
           "status_code": None, "content_type": None,
           "content_length": None, "html": None, "corrupt": None}
    head, sep, rest = frag.partition(_SEP)
    if not sep:
        out["corrupt"] = "no header/payload separator"
        return out
    headers: dict[str, str] = {}
    for line in head.split("\r\n"):
        if not line or line == MARKER:
            continue
        k, colon, v = line.partition(":")
        if not colon:
            out["corrupt"] = f"malformed header line: {line[:40]!r}"
            return out
        headers[k.strip()] = v.strip()
    out["record_id"] = headers.get(H_ID)
    out["url"] = headers.get(H_URI)
    out["kind"] = headers.get(H_TYPE)
    clen_s = headers.get(H_LEN)
    if clen_s is None or not clen_s.isdigit():
        out["corrupt"] = "missing/invalid Content-Length"
        return out
    clen = int(clen_s)
    out["content_length"] = clen
    raw = rest.encode("utf-8")
    if len(raw) < clen:
        out["corrupt"] = f"payload short: {len(raw)} of {clen} octets"
        return out
    tail = raw[clen:]
    if tail not in (b"", _SEP.encode()):
        out["corrupt"] = f"unexpected {len(tail)} trailing octets"
        return out
    if out["kind"] != "response":
        # request/metadata/warcinfo records are valid, just not pages
        return out
    block = raw[:clen]
    http_head, hsep, body = block.partition(_SEP.encode())
    if not hsep:
        out["corrupt"] = "http block missing header terminator"
        return out
    try:
        head_text = http_head.decode("utf-8")
        out["html"] = body.decode("utf-8")
    except UnicodeDecodeError:
        out["corrupt"] = "Content-Length splits a UTF-8 sequence"
        return out
    lines = head_text.split("\r\n")
    m = _STATUS_RE.match(lines[0])
    if not m:
        out["corrupt"] = f"malformed status line: {lines[0][:40]!r}"
        return out
    out["status_code"] = int(m.group(1))
    http_headers: dict[str, str] = {}
    for line in lines[1:]:
        k, colon, v = line.partition(":")
        if colon:
            http_headers[k.strip().lower()] = v.strip()
    out["content_type"] = http_headers.get("content-type")
    blen_s = http_headers.get("content-length")
    if blen_s is not None and blen_s.isdigit() and int(blen_s) != len(body):
        out["corrupt"] = (
            f"http Content-Length {blen_s} != body {len(body)} octets")
    return out


@F.pandas_udf(_WARC_PARSED)
def _parse_warc_udf(frags: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    for batch in frags:
        yield pd.DataFrame([_parse_warc_fragment(f) for f in batch],
                           columns=_WARC_PARSED.fieldNames())


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC-response scan -> one typed row per record:
    ``(record_id, url, kind, status_code, content_type, content_length,
    html, corrupt)``.  Same splittable record-boundary ``lineSep`` scan
    and quarantine semantics as :func:`read_wet`; non-``response``
    records (request/metadata/warcinfo) parse as clean rows with NULL
    html so callers can filter by ``kind``."""
    frags = spark.read.option("lineSep", _SEP + MARKER + "\r\n").text(path)
    return (
        frags.filter(F.length(F.rtrim(F.col("value"))) > 0)
        .select(_parse_warc_udf(F.col("value")).alias("r"))
        .select("r.*")
    )


# ---------------------------------------------------------------------------
# Exact per-file scan: the quarantine recovery path
# ---------------------------------------------------------------------------

_SEP_B = _SEP.encode()
_MARKER_B = (_SEP + MARKER + _CRLF).encode()


def _iter_file_exact(fh, chunk_chars: int = 1 << 20) -> Iterator[str]:
    """Sequentially scan ONE archive stream into record fragments using
    Content-Length as the authoritative frame — a payload that embeds the
    record separator (the case the splittable lineSep reader must
    quarantine) is carried intact because nothing is split by pattern.
    A record whose header is unparseable can't be skipped reliably; the
    scanner emits it as-is (it will parse as corrupt) and resyncs at the
    next record boundary.

    INCREMENTAL: reads ``fh`` (text mode) in bounded chunks and keeps
    only the current record in the buffer, so a multi-GB archive shard
    costs one-record memory per executor instead of whole-file (the
    earlier form read ``fh.read()`` — an OOM hazard exactly on the
    recovery path that targets oversized/odd shards).  Worst case is one
    unframeable region with no later record marker, which is emitted as
    a single fragment and therefore must be held whole regardless."""
    buf = b""
    eof = False

    def _fill() -> bool:
        nonlocal buf, eof
        if eof:
            return False
        chunk = fh.read(chunk_chars)
        if not chunk:
            eof = True
            return False
        # per-chunk encode concatenates to exactly the whole-file encode:
        # text chunks split at code-point boundaries
        buf += chunk.encode("utf-8")
        return True

    def _find(pat: bytes, start: int) -> int:
        # find pat from start, refilling until found or EOF; resume each
        # retry with a pattern-length overlap so a separator spanning a
        # refill boundary is still seen
        nonlocal buf
        while True:
            k = buf.find(pat, start)
            if k >= 0:
                return k
            start = max(start, len(buf) - len(pat) + 1)
            if not _fill():
                return -1

    while True:
        if not buf and not _fill():
            return
        j = _find(_SEP_B, 0)
        if j < 0:
            yield buf.decode("utf-8", errors="replace")
            return
        head = buf[:j].decode("utf-8", errors="replace")
        clen = None
        for line in head.split("\r\n"):
            k, colon, v = line.partition(":")
            if colon and k.strip() == H_LEN and v.strip().isdigit():
                clen = int(v.strip())
        if clen is not None:
            # frame end + one separator of lookahead
            need = j + len(_SEP_B) + clen + len(_SEP_B)
            while len(buf) < need and _fill():
                pass
        if clen is None or j + len(_SEP_B) + clen > len(buf):
            # unframeable: emit to the next record boundary (corrupt row)
            # and resync there
            k = _find(_MARKER_B, 0)
            if k < 0:
                yield buf.decode("utf-8", errors="replace")
                return
            yield buf[:k].decode("utf-8", errors="replace")
            buf = buf[k + len(_SEP_B):]
            continue
        start = j + len(_SEP_B)
        end = start + clen
        yield buf[:end].decode("utf-8", errors="replace")
        if buf[end:end + len(_SEP_B)] == _SEP_B:
            end += len(_SEP_B)
        buf = buf[end:]


def _scan_file_exact(data: str) -> list[str]:
    """Whole-string form of :func:`_iter_file_exact` (tests / small
    inputs)."""
    import io

    return [f for f in _iter_file_exact(io.StringIO(data)) if f.strip()]


def _read_exact(spark: SparkSession, path: str, parse_fragment, schema):
    import glob as _glob
    import gzip as _gzip
    import os as _os

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for fname in batch["file"]:
                # newline="" preserves the \r\n record framing (universal
                # newline translation would erase every separator); the
                # incremental scanner holds one record, not the file
                opener = _gzip.open if fname.endswith(".gz") else open
                with opener(fname, "rt", encoding="utf-8",
                            newline="") as fh:
                    rows += [parse_fragment(f)
                             for f in _iter_file_exact(fh) if f.strip()]
            yield pd.DataFrame(rows, columns=schema.fieldNames())

    pattern = path if _os.path.isfile(path) else _os.path.join(path, "*")
    files = sorted(
        f for f in _glob.glob(pattern)
        if _os.path.isfile(f) and not _os.path.basename(f).startswith(
            ("_", ".")))
    files_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(max(len(files), 1))
    return files_df.mapInPandas(scan, schema=schema)


def read_wet_exact(spark: SparkSession, path: str) -> DataFrame:
    """EXACT WET scan: one task per archive file, records framed by
    sequential Content-Length arithmetic instead of the lineSep pattern —
    recovers payloads that embed the record boundary byte-identically
    (the splittable :func:`read_wet`'s documented quarantine case).
    Parallelism is per-FILE, so this is the recovery path you point at
    quarantined shards, not the default 100 TB scan."""
    return _read_exact(spark, path, _parse_fragment, _PARSED)


def read_warc_exact(spark: SparkSession, path: str) -> DataFrame:
    """EXACT WARC-response scan (see :func:`read_wet_exact`): the
    recovery path for HTML bodies that embed the record boundary."""
    return _read_exact(spark, path, _parse_warc_fragment, _WARC_PARSED)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    """Streaming WARC source: raw HTTP capture shards landing in ``path``
    stream through the same record-boundary split + Arrow parse as
    :func:`read_warc`, then clean 200 text/html pages run the SAME fused
    span extraction as the crawl engine (CSS ``include``/``exclude``
    apply) and serialize to markdown — emitting ``(url, text)`` rows, the
    ``StreamingCorpusIngest`` input contract.  Files are the replayable
    offsets, so epochs are deterministic; corrupt/non-page records drop
    on the stream (quarantine auditing = a batch :func:`read_warc` pass
    over the same immutable files)."""
    from crawler_to_md_spark.functions.extraction import make_extract_udf
    from crawler_to_md_spark.functions.markdown import (
        spans_to_markdown_expr,
    )

    reader = spark.readStream.option("lineSep", _SEP + MARKER + "\r\n")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               int(max_files_per_trigger))
    parsed = (
        reader.text(path)
        .filter(F.length(F.rtrim(F.col("value"))) > 0)
        .select(_parse_warc_udf(F.col("value")).alias("r"))
        .select("r.*")
    )
    pages = parsed.filter(
        "corrupt IS NULL AND kind = 'response' AND status_code = 200 "
        "AND (content_type IS NULL OR content_type LIKE 'text/html%')")
    extract = make_extract_udf(include, exclude)
    return pages.select(
        "url", extract(F.col("html")).alias("doc")
    ).select(
        "url", F.expr(spans_to_markdown_expr("doc.spans")).alias("text"))
