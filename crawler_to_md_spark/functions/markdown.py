"""Span→Markdown projection and the markdown post-processing functions.

The engine's primary document representation is the interleaved span array
(kind, text, media_ref, offset) — markdown is a *projection* of it.  The
reference stores markdown TEXT directly (database_manager.py:46-51,
produced at scraper.py:259-274); we keep spans relational and serialize on
demand, natively on the JVM.

Post-processing functions mirror the reference export pipeline:
  * ``normalize_markdown``   — utils.py:196-215 (native regexp chain)
  * ``adjust_headers``       — export_manager.py:25-45 (native transform)
  * ``cleanup_markdown``     — export_manager.py:47-63 (native regexp)
  * ``minify_markdown_udf``  — export_manager.py:65-146 (stateful per-line
    scan over each document: fence tracking, HTML-comment stripping across
    lines, hard-break preservation — genuinely sequential, so it is one of
    the engine's declared vectorized pandas UDFs)
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# ---------------------------------------------------------------------------
# Span -> markdown (native)
# ---------------------------------------------------------------------------

HEADING_KINDS = {f"heading{i}": i for i in range(1, 7)}


def span_to_markdown_expr(span: str = "s") -> str:
    """SQL fragment rendering one span struct to a markdown block.

    heading{n} -> '#'*n + ' ' + text        image -> ![](media_ref)
    paragraph  -> text                      link  -> [text](media_ref)
    code       -> ```\\ntext\\n```
    """
    return (
        f"CASE WHEN {span}.kind LIKE 'heading%' THEN "
        f"  repeat('#', CAST(substr({span}.kind, 8) AS INT)) || ' ' || {span}.text "
        f"WHEN {span}.kind = 'paragraph' THEN {span}.text "
        f"WHEN {span}.kind = 'code' THEN '```' || chr(10) || {span}.text || chr(10) || '```' "
        f"WHEN {span}.kind = 'image' THEN '![](' || {span}.media_ref || ')' "
        f"WHEN {span}.kind = 'link' THEN '[' || coalesce({span}.text, '') || '](' || {span}.media_ref || ')' "
        f"ELSE coalesce({span}.text, '') END"
    )


def spans_to_markdown_expr(spans_col: str, include_links: bool = False) -> str:
    """Serialize a span array to a markdown document (native, codegen'd).

    Content spans only by default — the reference's page markdown is the
    converted body content; anchors appear inline in real HTML but our span
    model carries them separately, so link rendering is opt-in.
    Blocks are joined with blank lines; output is already in
    ``normalize_markdown`` normal form (no trailing spaces, no triple
    newlines).  Returns a SQL fragment usable in selectExpr/F.expr.
    """
    src = (
        spans_col
        if include_links
        else f"filter({spans_col}, s -> s.kind <> 'link')"
    )
    return (
        f"array_join(transform({src}, s -> {span_to_markdown_expr('s')}), "
        "chr(10) || chr(10))"
    )


# ---------------------------------------------------------------------------
# normalize / adjust / cleanup (native)
# ---------------------------------------------------------------------------


def normalize_markdown(text: Column) -> Column:
    """Reference utils.py:196-215: rstrip every line, collapse 3+ newlines
    to 2, strip both ends. NULL/empty -> ''."""
    t = F.coalesce(text, F.lit(""))
    t = F.regexp_replace(t, r"[ \t\x0b\f\r]+(\r?\n)", "\n")
    t = F.regexp_replace(t, r"\r\n", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    # Python str.strip() strips all whitespace from both ends
    return F.regexp_replace(F.regexp_replace(t, r"^\s+", ""), r"\s+$", "")


def adjust_headers_expr(content_col: str, level_increment: int = 1) -> str:
    """Reference export_manager.py:25-45, reproduced exactly — including its
    quirks: the header level is the length of the first space-delimited
    token; adjusted lines gain surrounding blank lines; every line gains a
    trailing newline (so the result always ends with one). Native transform
    over split lines; returns a SQL fragment."""
    inc = int(level_increment)
    tok = "split_part(line, ' ', 1)"
    line_expr = (
        f"CASE WHEN startswith(line, '#') THEN "
        f"chr(10) || repeat('#', least(length({tok}) + {inc}, 6)) || "
        f"substr(line, length({tok}) + 1) || chr(10) "
        f"ELSE line END"
    )
    return (
        f"array_join(transform(split({content_col}, chr(10)), line -> {line_expr}), "
        "chr(10)) || chr(10)"
    )


def cleanup_markdown(content: Column) -> Column:
    """Reference export_manager.py:47-63: collapse every run of 3+ newlines
    down to exactly 2 (their loop converges to the same fixed point)."""
    return F.regexp_replace(content, r"\n{3,}", "\n\n")


# ---------------------------------------------------------------------------
# Minifier (declared pandas UDF — stateful per-document line machine)
# ---------------------------------------------------------------------------

_FENCE_OPEN = {"`": "```", "~": "~~~"}
_RULE_RE = re.compile(r"-{3,}$")


def _strip_comments(line: str, in_comment: bool) -> tuple[str, bool]:
    """Remove HTML comments from one line, tracking multi-line state
    (reference export_manager.py:79-101, incl. unterminated-comment-to-EOF)."""
    out: list[str] = []
    i = 0
    while i < len(line):
        if in_comment:
            end = line.find("-->", i)
            if end == -1:
                return "".join(out), True
            i = end + 3
            in_comment = False
        else:
            start = line.find("<!--", i)
            if start == -1:
                out.append(line[i:])
                break
            out.append(line[i:start])
            i = start + 4
            in_comment = True
    return "".join(out), in_comment


class MinifyMachine:
    """The minifier's line state machine (fence tracking, multi-line
    comment stripping), factored out so the same states drive both the
    per-document string function below and the streaming compiled-export
    assembly (exports.py) — one shard at a time, O(1) memory."""

    def __init__(self) -> None:
        self.fence: str | None = None
        self.in_comment = False

    def process_line(self, line: str) -> str | None:
        """Return the line to keep (possibly rewritten) or None to drop."""
        if self.fence is not None:
            if line.lstrip(" ").startswith(_FENCE_OPEN[self.fence]):
                self.fence = None
            return line

        stripped_lead = line.lstrip(" ")
        if stripped_lead.startswith("```"):
            self.fence = "`"
            return line
        if stripped_lead.startswith("~~~"):
            self.fence = "~"
            return line

        line, self.in_comment = _strip_comments(line, self.in_comment)

        if line.endswith("  ") and not line.endswith("   "):
            pass  # exact two-space hard break survives
        else:
            line = line.rstrip(" \t")

        body = line.strip()
        if body == "" or _RULE_RE.fullmatch(body):
            return None
        return line


def minify_markdown_str(content: str) -> str:
    """Reference semantics (export_manager.py:103-146): outside fenced code,
    strip HTML comments, keep exact two-trailing-space hard breaks, drop
    blank lines and ---- rules; fenced blocks (``` or ~~~, possibly
    indented) pass through verbatim. Idempotent."""
    if content is None:
        return None
    machine = MinifyMachine()
    kept = [
        out
        for out in (machine.process_line(line) for line in content.split("\n"))
        if out is not None
    ]
    result = "\n".join(kept)
    if content.endswith("\n") and result:
        result += "\n"
    return result


@pandas_udf(StringType())
def minify_markdown_udf(content: pd.Series) -> pd.Series:
    return content.map(minify_markdown_str, na_action="ignore")
