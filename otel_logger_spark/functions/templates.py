"""Log template mining — collapse free-text log lines into their
constant skeletons by masking the variable parts (ids, addresses,
numbers), then count by template. The telemetry-analytics workhorse
("which log STATEMENT is spamming?" — a top-templates table is the first
screen of every log product), and the deterministic core of Drain-style
template extraction: the masking rules are the part that matters at
10^12 turns, and they are pure vectorized regexp_replace chains inside
whole-stage codegen — no UDF, no training, no state.

Rule order is semantic (uuid before hex before ip before bare number —
each earlier mask removes text a later, greedier rule would mangle) and
every pattern is written in the common dialect of Java regex (Spark) and
RE2 (DuckDB), so the oracle replays the identical chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order; dialect-portable Java/RE2
TEMPLATE_RULES: list[tuple[str, str]] = [
    (
        r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<uuid>",
    ),
    (r"0x[0-9a-fA-F]+", "<hex>"),
    (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}(:\d+)?", "<ip>"),
    (r"\d+", "<n>"),
]


def template_expr(col):
    out = col
    for pat, repl in TEMPLATE_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def with_template(
    df: DataFrame, text_col: str = "text", out_col: str = "template"
) -> DataFrame:
    return df.withColumn(out_col, template_expr(F.col(text_col)))


def template_counts(
    df: DataFrame, text_col: str = "text", conv_col: str = "conv_id"
) -> DataFrame:
    """One row per template: occurrences and distinct conversations —
    the 'top log statements' table."""
    return (
        with_template(df, text_col)
        .groupBy("template")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct(conv_col).alias("n_convs"),
        )
    )


def template_counts_sql(source_cte: str, from_clause: str = "lines") -> str:
    """DuckDB oracle: the identical rule chain replayed with RE2 'g'
    replacement — same patterns, same order."""
    expr = "text"
    for pat, repl in TEMPLATE_RULES:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return (
        source_cte
        + f""",
 t AS (SELECT conv_id, {expr} AS template FROM {from_clause})
 SELECT template, COUNT(*) AS n,
   CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_convs
 FROM t GROUP BY 1"""
    )
