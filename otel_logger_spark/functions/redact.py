"""PII redaction — the compliance pass every LLM training-data pipeline
runs before a corpus ships: mask emails, phone numbers, SSNs, card
numbers, IPs and long hex secrets in free text, and account what was
masked (an unaccounted redaction pass is unauditable — same discipline as
the sinks' lineage and the TTL audit).

Built like template mining (functions/templates.py): every pattern is
written in the COMMON DIALECT of Java regex (Spark) and RE2 (DuckDB), the
masking chain is ordered (most-specific first — an earlier mask removes
text a later, greedier rule would half-match), and everything runs as
vectorized regexp expressions inside whole-stage codegen — no UDF, no
per-row Python, nothing to train.

Counting semantics: per-type match counts are taken INDEPENDENTLY on the
ORIGINAL text (regexp_count), so counts don't depend on mask order;
masking applies the chain in order. Both choices are replayed identically
in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (type, pattern, mask) — chain order is semantic: specific before general
# (card before phone: both are digit runs; email before secret: a long
# local-part could look hex-ish). All patterns parse identically in Java
# regex and RE2 (dialect-parity pytest).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<ssn>"),
    ("card", r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", "<card>"),
    ("phone", r"(\+?\d{1,2}[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<phone>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<ip>"),
    ("secret", r"\b[0-9a-fA-F]{32,}\b", "<secret>"),
]


def redact_expr(col):
    out = col
    for _, pat, mask in PII_RULES:
        out = F.regexp_replace(out, pat, mask)
    return out


def with_redacted(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Adds the masked text plus one ``n_<type>`` count column per rule
    (counted on the original text)."""
    out = df.withColumn(out_col, redact_expr(F.col(text_col)))
    for name, pat, _ in PII_RULES:
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
    return out


def redaction_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The audit table: one row per PII type — documents affected and
    total matches. A zero-row-delta redaction pass is verifiable from
    this plus the masked corpus alone."""
    red = with_redacted(df, text_col)
    # stack(), not a union of per-type branches: Catalyst has no
    # cross-branch CSE, so a 6-way union re-runs every regexp_count (and
    # the scan) per branch — stack computes all counts in ONE pass and
    # explodes 6 tiny rows per document
    pairs = ", ".join(f"'{name}', n_{name}" for name, _, _ in PII_RULES)
    stacked = red.select(
        F.expr(f"stack({len(PII_RULES)}, {pairs}) AS (pii_type, _n)")
    )
    return stacked.groupBy("pii_type").agg(
        F.sum((F.col("_n") > 0).cast("long")).alias("n_docs"),
        F.sum(F.col("_n").cast("long")).alias("n_matches"),
    )


def redaction_report_sql(source_cte: str, from_clause: str = "corpus") -> str:
    """DuckDB oracle: identical per-type counting (regexp_extract_all
    length == regexp_count) and identical grouping. The masking chain
    itself is pinned by pytest string-matrix parity, the report by this
    oracle."""
    branches = []
    for name, pat, _ in PII_RULES:
        p = pat.replace("'", "''")
        branches.append(
            f"SELECT '{name}' AS pii_type, "
            f"CASE WHEN len(regexp_extract_all(text, '{p}')) > 0 THEN 1 ELSE 0 END AS hit, "
            f"len(regexp_extract_all(text, '{p}')) AS n FROM {from_clause}"
        )
    u = "\n  UNION ALL ".join(branches)
    return (
        source_cte
        + f""",
 per AS (
  {u}
 )
 SELECT pii_type, CAST(SUM(hit) AS BIGINT) AS n_docs,
        CAST(SUM(n) AS BIGINT) AS n_matches
 FROM per GROUP BY 1"""
    )
