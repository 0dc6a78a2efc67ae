"""PII detection and redaction — pure-JVM regex lanes for corpus scrubbing.

Training-corpus curation pipelines scrub personally-identifiable
information (emails, IPs, phone numbers, URLs) before training. This module
provides the standard regex-based pass as engine-portable expression pairs
(Spark ``Column`` + DuckDB SQL twin, the repo-wide oracle convention from
functions/text.py): ``regexp_replace`` redaction plus per-category match
counts, all whole-stage-codegen JVM expressions — no Python boundary, so
the pass runs at scan speed over 100 TB of documents and composes with the
quality/dedup lanes in one declarative plan.

Portability: every pattern sticks to the syntax subset Java regex and RE2
(DuckDB) interpret identically — ASCII character classes, bounded repeats,
``\\b`` word boundaries; no lookarounds (RE2 has none), no ``\\s``/``\\w``
shorthands (Unicode semantics differ between engines; see the whitespace
discussion in functions/text.py). Spark's ``regexp_replace`` is global by
default; the SQL twins pass the ``'g'`` flag to match.

(The reference has no text-scrubbing surface — this is part of the
LLM-data-pipeline extension the build brief asks for.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Category → (pattern, replacement token). Order matters and is the order
# of application: URLs first (they may embed '@' and digit runs that would
# otherwise half-match EMAIL/PHONE), then emails, IPs, phones. Patterns are
# deliberately conservative — a redactor that eats prose is worse than one
# that misses an exotic format.
PII_PATTERNS = (
    ("url", r"https?://[^ \t\n\r]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # leading '+' required: unanchored digit-run phone patterns are the
    # classic false-positive machine (they eat ids, years, quantities)
    ("phone", r"\+[0-9][0-9() -]{6,14}[0-9]", "<PHONE>"),
)


def redact(col: Column) -> Column:
    """All four redaction passes chained, in PII_PATTERNS order."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_sql(expr: str) -> str:
    out = expr
    for _, pat, repl in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    return out


def pii_counts(col: Column) -> dict:
    """Per-category match counts (BEFORE redaction), name → int Column.

    Counted on the progressively-redacted text exactly as :func:`redact`
    sees it, so a URL containing an '@' is counted once as a URL, never
    double-counted as an email.
    """
    out = {}
    cur = col
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).cast("long")
        cur = F.regexp_replace(cur, pat, repl)
    return out


def pii_counts_sql(expr: str) -> dict:
    out = {}
    cur = expr
    for name, pat, repl in PII_PATTERNS:
        out[name] = f"len(regexp_extract_all({cur}, '{pat}'))::BIGINT"
        cur = f"regexp_replace({cur}, '{pat}', '{repl}', 'g')"
    return out


def k_anonymity_report(df, quasi_cols, k: int = 5):
    """K-anonymity audit over a quasi-identifier set (Sweeney 2002, the
    re-identification risk measure privacy reviews of training exports
    run): every equivalence class of ``quasi_cols`` whose member count
    is below ``k`` — rows in those classes are re-identifiable by
    anyone holding the quasi-identifiers. Output: one row per RISKY
    class (class values + its size); an empty frame certifies the table
    k-anonymous at this k. One map-side-combined aggregation + a
    selective filter — the shuffle carries (class, count), never rows.
    Generalize/suppress, then re-run until empty (the audit loop is the
    caller's; this is the measurement)."""
    from pyspark.sql import functions as F

    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) \
        else list(quasi_cols)
    if not quasi_cols:
        raise ValueError("quasi_cols must not be empty")
    if k < 2:
        raise ValueError("k must be >= 2")
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .where(F.col("class_size") < k))


def k_anonymity_report_sql(source_sql: str, quasi_cols, k: int = 5) -> str:
    """DuckDB twin of :func:`k_anonymity_report`. Column names are
    interpolated bare, so they are restricted to identifier charset
    (ADVICE r7 — no quote-escape path here by design)."""
    import re
    quasi_cols = [quasi_cols] if isinstance(quasi_cols, str) \
        else list(quasi_cols)
    for c in quasi_cols:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", c):
            raise ValueError(f"quasi column must be a bare identifier: {c!r}")
    cols = ", ".join(quasi_cols)
    return f"""
SELECT {cols}, count(*)::BIGINT AS class_size
FROM ({source_sql}) GROUP BY {cols} HAVING count(*) < {k}
"""
