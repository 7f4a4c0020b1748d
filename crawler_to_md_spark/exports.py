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


def _ordered_pages(docs: DataFrame, links: DataFrame) -> DataFrame:
    """Non-null pages with content markdown, in discovery order."""
    pages = docs.filter(F.col("spans").isNotNull()).withColumn(
        "content", F.expr(spans_to_markdown_expr("spans"))
    )
    order = links.select("url", F.col("batch_id").alias("__b"), F.col("seq").alias("__s"))
    return pages.join(order, "url", "left").orderBy("__b", "__s").drop("__b", "__s")


def export_compiled_markdown(
    docs: DataFrame,
    links: DataFrame,
    title: str,
    path: str | None = None,
    minify: bool = False,
) -> str:
    """S10 + F10-F15: one markdown document for the whole crawl."""
    pages = _ordered_pages(docs, links)
    adjusted = pages.withColumn("__adj", F.expr(adjust_headers_expr("content")))
    if minify:
        block = F.concat(F.lit("\n"), F.col("__adj"))
    else:
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
        block = F.concat(
            F.lit("\n<!--\nURL: "), F.col("url"), F.lit("\n"),
            meta_lines,
            F.lit("-->\n\n"), F.col("__adj"), F.lit("\n---"),
        )
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
