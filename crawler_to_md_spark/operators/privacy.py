"""PII redaction for training corpora: scan-only regex scrub + counts.

The reference exports page content verbatim (export_manager.py writes the
markdown blob untouched); a corpus destined for training must scrub
personally identifiable information first.  This operator is the standard
published pass (the C4/RefinedWeb/BigScience PII rules reduced to their
regex core): emails, North-American-style phone numbers, IPv4 addresses,
and SSN-shaped ids are replaced with typed placeholder tokens, and the
per-document hit counts are kept so downstream filters can drop
PII-dense documents instead of merely masking them.

Scale shape: the whole operator is a single projection over the text
column — ``regexp_count`` + ``regexp_replace`` chains, all JVM-side,
codegen'd, no shuffle, no Python.  At 100 TB it is exactly one pass over
the scan with predicate/column pruning intact; the plan is asserted
Exchange-free in tests.

Determinism / oracle mirroring: patterns are written in the common
dialect of Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded quantifiers, ``\\d`` and ``\\b`` only, no lookaround, no
backreferences — and the passes apply in a FIXED order (email, ssn,
phone, ipv4), each counting on the text as left by the previous pass, so
the Spark chain and the nested-CTE SQL oracle compute the identical
sequential semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement, guard) — ORDER MATTERS and is part of the
# operator's contract (each pass sees the previous pass's output).  SSN
# runs before PHONE so 3-2-4 digit groups are never half-eaten by a
# phone rule; both run before IPV4 (disjoint shapes, but the fixed order
# keeps the sequential semantics unambiguous).
#
# ``guard`` is a cheap NECESSARY-condition literal the expensive regex is
# gated behind: Java's backtracking engine pays O(run²)-ish per alnum run
# on the email pattern's leading char class, and most web documents carry
# no PII at all — a `contains('@')` / digit-presence probe is one linear
# scan and lets the 90%+ clean majority skip the regex entirely.  The
# guard never changes semantics (guard false ⇒ the pattern cannot match
# ⇒ count 0, replace identity), so the DuckDB oracle stays the unguarded
# chain.
PII_RULES: list[tuple[str, str, str, "str | None"]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
     "<EMAIL>", "@"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>", "-"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>", None),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>", "."),
]

# every non-email rule needs a digit somewhere; computed once per pass
# level on the current text (replacements only ever REMOVE digits, so the
# probe stays a sound necessary condition at every level)
_DIGIT_PROBE = "[0-9]"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace PII spans in ``text_col`` with typed placeholders and add
    per-type hit counts plus ``pii_total``.

    Returns the input frame with ``text_col`` redacted and new columns
    ``n_email, n_ssn, n_phone, n_ipv4, pii_total`` (longs).  Single
    scan-only projection — no shuffle, no UDF.
    """
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for name, pat, repl, lit_guard in PII_RULES:
        if name == "email":
            guard = cur.contains("@")
        else:
            guard = cur.rlike(_DIGIT_PROBE)
            if lit_guard:
                guard = guard & cur.contains(lit_guard)
        counts.append(
            F.when(guard, F.regexp_count(cur, F.lit(pat)))
            .otherwise(F.lit(0)).cast("long").alias(f"n_{name}"))
        cur = F.when(guard, F.regexp_replace(cur, pat, repl)).otherwise(cur)
    others = [c for c in df.columns if c != text_col]
    total = None
    for c in counts:
        total = c if total is None else total + c
    return df.select(
        *others,
        cur.alias(text_col),
        *counts,
        total.alias("pii_total"),
    )


def drop_pii_dense(df: DataFrame, max_hits: int = 5,
                   text_col: str = "text") -> DataFrame:
    """Redact, then drop documents whose ORIGINAL text carried more than
    ``max_hits`` PII spans (mask-or-drop policy: redaction alone leaves a
    placeholder-riddled document that is itself a quality signal)."""
    return redact_pii(df, text_col).filter(F.col("pii_total") <= max_hits)


def pii_oracle_sql(table_expr: str, text_col: str = "text",
                   other_cols: list[str] | None = None) -> str:
    """The sequential-pass semantics as nested DuckDB SQL (one subquery
    level per rule), for oracle twins.  ``table_expr`` is a FROM-able
    fragment; each level counts with len(regexp_extract_all(...)) on the
    text as left by the previous level, then replaces — exactly the
    ``redact_pii`` chain."""
    others = [c for c in (other_cols or [])]
    prefix = (", ".join(others) + ", ") if others else ""
    sql = f"SELECT {prefix}{text_col} AS __t FROM {table_expr}"
    done: list[str] = []
    for name, pat, repl, _guard in PII_RULES:
        pat_sql = pat.replace("'", "''")
        carried = (", ".join(done) + ", ") if done else ""
        sql = (
            f"SELECT {prefix}{carried}"
            f"CAST(len(regexp_extract_all(__t, '{pat_sql}')) AS BIGINT)"
            f" AS n_{name}, "
            f"regexp_replace(__t, '{pat_sql}', '{repl}', 'g') AS __t "
            f"FROM ({sql})"
        )
        done.append(f"n_{name}")
    totals = " + ".join(done)
    return (f"SELECT {prefix}__t AS {text_col}, {', '.join(done)}, "
            f"{totals} AS pii_total FROM ({sql})")
