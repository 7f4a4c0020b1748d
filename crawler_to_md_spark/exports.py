"""Exports: compiled Markdown, compiled JSON, and per-page file trees.

Reference: export_manager.py (S10-S12).  The reference streams SQLite rows
through a single Python loop; here every per-page transformation — span ->
markdown projection, header adjustment, metadata comment block, minify —
runs distributed, and only the final ordered concatenation happens on the
driver (the reference's own single-writer ``"".join`` discipline, R8, is
unavoidable for a single output file; at scale you'd write per-partition
shards and cat them, which ``export_compiled_markdown(..., path=None)``
leaves open by returning the ordered block iterator's join).

Export order: the reference emits pages in SQLite rowid (first-insert)
order (database_manager.py:265-280; ON CONFLICT UPDATE keeps the original
rowid).  The engine's analog is discovery order — ``links (batch_id, seq)``
— explicit and deterministic (SURVEY.md §2.5 L5).

Format parity (export_manager.py:166-259):
  * compiled MD: ``# {title}\n`` header; per page either (minify)
    ``"\n" + adjusted`` or ``"\n<!--\nURL: {url}\n{k}: {v}\n-->\n\n" +
    adjusted + "\n---"``; then cleanup (\n{3,} -> \n\n), then minify.
  * compiled JSON: list of {url, content, metadata}; content cleaned;
    metadata NULL values dropped (P11); indent=4 pretty vs compact
    separators; ensure_ascii=False.
  * individual: ``files/<url sans scheme/base>``, trailing ``/`` or empty
    -> ``index.md`` else ``+ ".md"`` (F4, export_manager.py:281-290).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_to_md_spark.functions import urlkit
from crawler_to_md_spark.functions.markdown import (
    adjust_headers_expr,
    cleanup_markdown,
    minify_markdown_str,
    minify_markdown_udf,
    spans_to_markdown_expr,
)


def _ordered_pages(
    docs: DataFrame, links: DataFrame, keep_order_cols: bool = False
) -> DataFrame:
    """Non-null pages with content markdown, in discovery order."""
    pages = docs.filter(F.col("spans").isNotNull()).withColumn(
        "content", F.expr(spans_to_markdown_expr("spans"))
    )
    order = links.select("url", F.col("batch_id").alias("__b"), F.col("seq").alias("__s"))
    joined = pages.join(order, "url", "left").orderBy("__b", "__s")
    return joined if keep_order_cols else joined.drop("__b", "__s")


def _md_block_col(minify: bool) -> F.Column:
    """Per-page compiled-MD block (export_manager.py:178-200) from columns
    url / metadata / __adj — rendered distributed in both export paths."""
    if minify:
        return F.concat(F.lit("\n"), F.col("__adj"))
    meta_lines = F.array_join(
        F.transform(
            F.map_entries(
                F.map_filter(
                    F.coalesce(
                        F.col("metadata"),
                        F.create_map().cast("map<string,string>"),
                    ),
                    lambda k, v: v.isNotNull(),
                )
            ),
            lambda e: F.concat(e["key"], F.lit(": "), e["value"], F.lit("\n")),
        ),
        "",
    )
    return F.concat(
        F.lit("\n<!--\nURL: "), F.col("url"), F.lit("\n"),
        meta_lines,
        F.lit("-->\n\n"), F.col("__adj"), F.lit("\n---"),
    )


def export_compiled_markdown(
    docs: DataFrame,
    links: DataFrame,
    title: str,
    path: str | None = None,
    minify: bool = False,
) -> str:
    """S10 + F10-F15: one markdown document for the whole crawl.

    Collects rendered page blocks to the driver — right for corpora whose
    compiled file comfortably fits in driver memory (the reference's own
    single-writer design, R8).  At crawl scale use
    :func:`export_compiled_markdown_sharded`: byte-identical output,
    executor-written shards, O(1) driver memory."""
    pages = _ordered_pages(docs, links)
    adjusted = pages.withColumn("__adj", F.expr(adjust_headers_expr("content")))
    block = _md_block_col(minify)
    blocks = [r["b"] for r in adjusted.select(block.alias("b")).collect()]
    out = "".join([f"# {title}\n"] + blocks)
    out = _cleanup_str(out)
    if minify:
        out = minify_markdown_str(out)
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(out)
    return out


def _cleanup_str(s: str) -> str:
    """Driver-side twin of functions.markdown.cleanup_markdown
    (export_manager.py:47-63)."""
    import re

    return re.sub(r"\n{3,}", "\n\n", s)


def legacy_metadata_expr(metadata_text: F.Column) -> F.Column:
    """F13: tolerant parse of reference-era JSON-TEXT metadata
    (export_manager.py:148-164, tested tests/test_export_manager.py:137-150).

    The engine's own metadata is a typed map, but a dataset imported from
    a reference SQLite cache carries metadata as TEXT that may be NULL,
    the literal string ``"null"``, a non-object JSON value, or broken JSON
    — all of which must degrade to an empty map, never an error.
    ``from_json`` yields NULL for every malformed/non-object case, and
    ``coalesce`` supplies the ``{}``."""
    return F.coalesce(
        F.from_json(metadata_text, "map<string,string>"),
        F.create_map().cast("map<string,string>"),
    )


def docs_from_legacy(pages: DataFrame) -> DataFrame:
    """Import a reference-shaped page store — ``(url TEXT, content TEXT,
    metadata TEXT)`` rows as in database_manager.py:46-51 — into the
    engine's docs shape.  Markdown content becomes a single paragraph span
    (the reference never kept structure); NULL content stays NULL spans
    (= failed page, database_manager.py:282-292)."""
    spans = F.when(
        F.col("content").isNotNull(),
        F.array(
            F.struct(
                F.lit("paragraph").alias("kind"),
                F.col("content").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ),
    )
    return pages.select(
        "url",
        spans.alias("spans"),
        legacy_metadata_expr(F.col("metadata")).alias("metadata"),
        F.when(F.col("content").isNotNull(), F.lit("ok"))
        .otherwise(F.lit("failed")).alias("status"),
        F.lit(0).cast("long").alias("batch_id"),
    )


# ---------------------------------------------------------------------------
# Sharded compiled exports (scale path: executor shard files + a driver
# that concatenates FILES through streaming post-processors, never rows)
# ---------------------------------------------------------------------------


class _StreamCleanup:
    """Streaming twin of ``_cleanup_str``: collapses ``\\n{3,}`` across
    chunk boundaries by holding back each chunk's trailing newline run (a
    run is only complete once a non-newline byte follows)."""

    def __init__(self, sink):
        import re

        self._re = re.compile(r"\n{3,}")
        self._sink = sink
        self._carry = ""

    def feed(self, chunk: str) -> None:
        if not chunk:
            return
        s = self._carry + chunk
        i = len(s)
        while i > 0 and s[i - 1] == "\n":
            i -= 1
        emit, self._carry = s[:i], s[i:]
        if emit:
            self._sink.feed(self._re.sub("\n\n", emit))

    def finish(self) -> None:
        if self._carry:
            self._sink.feed(self._re.sub("\n\n", self._carry))
        self._sink.finish()


class _StreamMinify:
    """Streaming driver of :class:`functions.markdown.MinifyMachine`:
    byte-identical to ``minify_markdown_str`` over the concatenated
    stream, fed chunk-wise."""

    def __init__(self, sink):
        from crawler_to_md_spark.functions.markdown import MinifyMachine

        self._machine = MinifyMachine()
        self._sink = sink
        self._buf = ""
        self._emitted = False
        self._last_char = ""

    def feed(self, chunk: str) -> None:
        if not chunk:
            return
        self._last_char = chunk[-1]
        self._buf += chunk
        *lines, self._buf = self._buf.split("\n")
        for line in lines:
            self._emit(line)

    def _emit(self, line: str) -> None:
        kept = self._machine.process_line(line)
        if kept is None:
            return
        if self._emitted:
            self._sink.feed("\n")
        self._sink.feed(kept)
        self._emitted = True

    def finish(self) -> None:
        self._emit(self._buf)
        if self._last_char == "\n" and self._emitted:
            self._sink.feed("\n")
        self._sink.finish()


class _FileSink:
    def __init__(self, f):
        self._f = f

    def feed(self, chunk: str) -> None:
        self._f.write(chunk)

    def finish(self) -> None:
        pass


def _write_ordered_shards(rows: DataFrame, shard_dir: str, col: str,
                          shards: int) -> list[str]:
    """Write ``rows[col]`` (already carrying __b/__s order columns) as
    range-partitioned, partition-sorted shard files.  repartitionByRange
    guarantees partition i's keys precede partition i+1's, so shard-id
    order IS global discovery order.  Executors write the files — on a
    cluster ``shard_dir`` must be shared storage (same contract as the
    per-page file sink)."""
    import glob

    os.makedirs(shard_dir, exist_ok=True)
    parts = (
        rows.repartitionByRange(shards, F.col("__b"), F.col("__s"))
        .sortWithinPartitions("__b", "__s")
        .select(F.col(col).alias("__chunk"))
    )

    def write_partition(it):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fp = os.path.join(shard_dir, f"shard-{pid:05d}.part")
        wrote = False
        with open(fp, "w", encoding="utf-8") as f:
            for row in it:
                f.write(row["__chunk"])
                wrote = True
        if not wrote:
            os.remove(fp)

    parts.foreachPartition(write_partition)
    return sorted(glob.glob(os.path.join(shard_dir, "shard-*.part")))


def export_compiled_markdown_sharded(
    docs: DataFrame,
    links: DataFrame,
    title: str,
    path: str,
    minify: bool = False,
    shards: int = 32,
) -> str:
    """S10 at crawl scale: byte-identical to
    :func:`export_compiled_markdown` (verified in tests) with no
    driver-side row collection.  Page blocks render distributed into
    ordered shard files; the driver streams shard FILES through the same
    cleanup + minify state machines into the final document, O(chunk)
    memory at 10^10 pages."""
    import shutil
    import tempfile

    pages = _ordered_pages(docs, links, keep_order_cols=True)
    adjusted = pages.withColumn("__adj", F.expr(adjust_headers_expr("content")))
    rows = adjusted.withColumn("__block", _md_block_col(minify))

    shard_dir = tempfile.mkdtemp(prefix="md_shards_", dir=os.path.dirname(path) or ".")
    try:
        shard_files = _write_ordered_shards(rows, shard_dir, "__block", shards)
        with open(path, "w", encoding="utf-8") as f:
            sink: object = _FileSink(f)
            if minify:
                sink = _StreamMinify(sink)
            pipeline = _StreamCleanup(sink)
            pipeline.feed(f"# {title}\n")
            for fp in shard_files:
                with open(fp, encoding="utf-8") as sf:
                    while True:
                        chunk = sf.read(1 << 20)
                        if not chunk:
                            break
                        pipeline.feed(chunk)
            pipeline.finish()
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
    return path


def export_compiled_json_sharded(
    docs: DataFrame,
    links: DataFrame,
    path: str,
    minify: bool = False,
    shards: int = 32,
) -> str:
    """S11 at crawl scale: byte-identical to :func:`export_compiled_json`.
    Each page object is serialized distributed (vectorized UDF applying
    the exact ``json.dumps`` the driver version uses); the driver only
    stitches shard files with array punctuation."""
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    indent = not minify

    # NOTE: no parameter annotations — `from __future__ import annotations`
    # stringifies them and pyspark's typehint parser rejects the strings;
    # the explicit returnType keeps this a scalar pandas UDF
    @pandas_udf(StringType())
    def render(url, content, metadata):
        def one(u, c, m):
            obj = {"url": u, "content": c,
                   "metadata": {k: v for k, v in dict(m or {}).items()}}
            if indent:
                s = json.dumps(obj, ensure_ascii=False, indent=4)
                return "\n".join("    " + line for line in s.split("\n"))
            return json.dumps(obj, ensure_ascii=False, separators=(",", ":"))

        return pd.Series([one(u, c, m) for u, c, m in zip(url, content, metadata)])

    pages = _ordered_pages(docs, links, keep_order_cols=True).select(
        "__b", "__s", "url",
        cleanup_markdown(F.col("content")).alias("content"),
        F.map_filter(
            F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
            lambda k, v: v.isNotNull(),
        ).alias("metadata"),
    )
    rows = pages.withColumn(
        "__obj", render(F.col("url"), F.col("content"), F.col("metadata"))
    )
    shard_dir = tempfile.mkdtemp(prefix="json_shards_", dir=os.path.dirname(path) or ".")
    try:
        shard_files = _write_ordered_shards(
            rows.withColumn(
                "__obj", F.concat(F.col("__obj"), F.lit("\x00"))
            ),
            shard_dir, "__obj", shards,
        )
        sep = ",\n" if indent else ","
        with open(path, "w", encoding="utf-8") as f:
            first = True
            wrote_any = False

            def emit(obj: str) -> None:
                nonlocal first, wrote_any
                if not obj:
                    return
                f.write(("[\n" if indent else "[") if first else sep)
                first = False
                f.write(obj)
                wrote_any = True

            # objects are \x00-delimited; stream each shard with a carry so
            # driver memory stays O(chunk + one object)
            for fp in shard_files:
                carry = ""
                with open(fp, encoding="utf-8") as sf:
                    while True:
                        chunk = sf.read(1 << 20)
                        if not chunk:
                            break
                        *objs, carry = (carry + chunk).split("\x00")
                        for obj in objs:
                            emit(obj)
                emit(carry)
            f.write(("\n]" if indent else "]") if wrote_any else "[]")
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)
    return path


def export_compiled_json(
    docs: DataFrame,
    links: DataFrame,
    path: str | None = None,
    minify: bool = False,
) -> str:
    """S11: JSON array of {url, content, metadata}, pretty or compact."""
    pages = _ordered_pages(docs, links).select(
        "url",
        cleanup_markdown(F.col("content")).alias("content"),
        F.map_filter(
            F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
            lambda k, v: v.isNotNull(),
        ).alias("metadata"),
    )
    data = [
        {"url": r["url"], "content": r["content"], "metadata": dict(r["metadata"])}
        for r in pages.collect()
    ]
    text = json.dumps(
        data,
        ensure_ascii=False,
        indent=None if minify else 4,
        separators=(",", ":") if minify else None,
    )
    if path:
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
    return text


def export_individual_markdown(
    docs: DataFrame,
    links: DataFrame,
    output_folder: str,
    base_url: str | None = None,
    minify: bool = False,
) -> str:
    """S12: one file per page under ``output_folder/files``, path derived
    from the URL (F4).  The writer runs per-partition on executors — in
    local mode that is the same filesystem; on a cluster point
    ``output_folder`` at shared storage."""
    files_root = os.path.join(output_folder, "files")
    os.makedirs(files_root, exist_ok=True)
    pages = _ordered_pages(docs, links).withColumn(
        "relpath", urlkit.export_relpath_expr(F.col("url"), base_url)
    )
    if minify:
        pages = pages.withColumn("content", minify_markdown_udf(F.col("content")))

    rows = pages.select("relpath", "content")

    def write_partition(it):
        for row in it:
            fp = os.path.join(files_root, row["relpath"])
            os.makedirs(os.path.dirname(fp), exist_ok=True)
            with open(fp, "w", encoding="utf-8") as f:
                f.write(row["content"])

    rows.foreachPartition(write_partition)
    return files_root


# ---------------------------------------------------------------------------
# training-shard sink (terminal step of the crawl -> training-data pipeline)
# ---------------------------------------------------------------------------


def export_training_shards(
    docs: DataFrame,
    budget: int,
    out_dir: str,
    text_col: str = "text",
    order_cols: list[str] | None = None,
    shards_per_file: int = 64,
) -> DataFrame:
    """Materialize token-budget-packed documents (operators/packing.py) as
    a deterministic, bounded parquet layout a trainer streams sequentially.

    Layout: directory ``file_id=F/`` holds shard range
    [F*shards_per_file, (F+1)*shards_per_file) as EXACTLY ONE parquet part
    file, rows sorted by (shard_id, shard_offset) — hash-repartitioning on
    file_id puts each file's rows in one task, so Spark's partitionBy
    writes one part per directory and preserves the in-task sort.  File
    count is total_tokens / (budget * shards_per_file) regardless of input
    partitioning; nothing is collected on the driver.  Returns the packed
    frame (with text) for chaining/inspection."""
    from crawler_to_md_spark.operators.packing import pack_shards

    order_cols = order_cols or ["doc_id"]
    packed = pack_shards(docs, budget, text_col=text_col,
                         order_cols=order_cols)
    joined = packed.join(
        docs.select(*order_cols, F.col(text_col).alias("text")), order_cols
    ).withColumn(
        "file_id", F.floor(F.col("shard_id") / shards_per_file).cast("long")
    )
    (
        joined.repartition("file_id")
        # the sort MUST lead with file_id: FileFormatWriter re-sorts any
        # task whose rows aren't ordered by the partition columns first,
        # and its sort is not stable — leading with file_id (coarser than
        # shard_id, so the (shard_id, shard_offset) order is unchanged)
        # makes the required ordering already satisfied and keeps ours
        .sortWithinPartitions("file_id", "shard_id", "shard_offset")
        .write.partitionBy("file_id")
        .mode("overwrite")
        .parquet(out_dir)
    )
    return joined


def export_training_jsonl(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    files: int | None = None,
    order_cols: list[str] | None = None,
) -> None:
    """Materialize documents as JSONL — the lingua-franca handoff format
    of LLM data pipelines (one JSON object per line: ``text`` plus
    ``meta_cols``).  Executor-written ``text`` sink with ``to_json`` on a
    struct (native, no Python); ``files`` bounds the output file count via
    a range repartition on ``order_cols`` so each file holds a contiguous,
    deterministic slice of the corpus order (omit for one file per input
    partition).  Nothing is collected on the driver."""
    meta_cols = meta_cols or [c for c in docs.columns if c != text_col]
    order_cols = order_cols or meta_cols[:1]
    line = F.to_json(F.struct(
        F.col(text_col).alias("text"),
        *[F.col(c) for c in meta_cols if c != text_col]))
    out = docs
    if files is not None:
        out = out.repartitionByRange(files, *[F.col(c) for c in order_cols])
        out = out.sortWithinPartitions(*order_cols)
    out.select(line.alias("value")).write.mode("overwrite").text(out_dir)
