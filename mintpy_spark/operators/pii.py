"""PII detection and scrubbing: the redaction pass a web-corpus pipeline
runs between extraction and training-shard write (C4/mC4 and most
production crawls strip emails, bare IPs, and phone-shaped strings before
anything else sees the text).

Round-3 batch m. Reference parity: extends the engine per the build
brief (training-data curation ops as first-class components); the closest
reference pattern is the scalar correction transform family
(src/mintpy/diff.py subtract-known-signal), which is what scrubbing is:
remove a known pattern from the observable, report how much was removed.

Scale design: every operator here is a per-row Catalyst regexp
expression — no shuffle, no Python, runs at scan parallelism inside
whole-stage codegen, and the patterns are anchored/bounded so the regex
engine cannot backtrack pathologically (character classes + bounded
quantifiers only; both java.util.regex and RE2 run them in linear time).
Pattern constants are shared verbatim with the DuckDB oracles — the
cross-engine contract is "same pattern text, same replacement order".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) in SCRUB ORDER. Order matters when matches
# could overlap (an email's host part contains dots, so emails are
# scrubbed before the IPv4 pass ever sees the text). Patterns restrict to
# the Java-regex ∩ RE2 common subset: no lookaround, no backreferences.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+1-555-\d{4}", "<PHONE>"),
)


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``n_<name>`` match-count column per PII pattern.

    Counts are taken on the ORIGINAL text (before any scrubbing), each
    pattern independently — the per-class exposure report an audit wants,
    not the post-redaction residue.
    """
    out = df
    for name, pat, _ in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        )
    return out


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed"
) -> DataFrame:
    """Replace every PII match with its sentinel token, in PII_PATTERNS
    order (email -> ipv4 -> phone), producing ``out_col``.

    Sequential replacement on a staged column (one withColumn per pass)
    keeps each regexp evaluated exactly once per row — referencing the
    composite expression more than once would re-run the whole chain
    under CollapseProject.
    """
    col: Column = F.col(text_col)
    out = df.withColumn(out_col, col)
    for _, pat, repl in PII_PATTERNS:
        out = out.withColumn(out_col, F.regexp_replace(F.col(out_col), pat, repl))
    return out


def pii_counts_oracle_exprs(text_expr: str) -> list[str]:
    """DuckDB SELECT-list fragments mirroring pii_counts (same patterns)."""
    return [
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]


def pii_scrub_oracle_expr(text_expr: str) -> str:
    """DuckDB expression mirroring pii_scrub: nested global regexp_replace
    in the same order ('g' flag — DuckDB replaces only the first match by
    default, Spark always replaces all)."""
    expr = text_expr
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr
