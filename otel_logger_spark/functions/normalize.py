"""Text normalization for dedup preprocessing — the canonical form
CCNet/RefinedWeb-style pipelines hash INSTEAD of raw text, so that case,
punctuation and whitespace variants of the same content collapse into
one dedup key.

Chain (each step expressible identically in Spark's Java regex and
DuckDB's RE2 — the redact.py dialect-portability discipline):
1. lowercase;
2. replace every ASCII punctuation char (the four ASCII ranges !-/,
   :-@, [-`, {-~) with a space — non-ASCII LETTERS survive untouched,
   so multilingual text is not destroyed; full Unicode folding (NFKC,
   confusables) needs ICU, which neither engine ships here, and is
   documented out of scope;
3. collapse whitespace runs to one space and trim.

Scale shape: pure codegen string expressions — no shuffle, no Python;
the normalized column feeds the existing exact-dedup path
(functions/dedup.py sha2 digests) unchanged. DuckDB's regexp_replace
needs the 'g' flag to match Spark's replace-all default — the oracle
generator below bakes that in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PUNCT = "[!-/:-@\\[-`{-~]"
# Explicit whitespace class, NOT \s: Java's \s matches vertical tab \x0B
# while DuckDB RE2's \s does not (round-7 advisor, verified) — the same
# pattern text below is given to BOTH engines so VT collapses identically.
_WS = "[ \\t\\n\\x0B\\f\\r]+"


def normalize_expr(col):
    """Normalized form of a string column (pure codegen)."""
    x = F.lower(col)
    x = F.regexp_replace(x, _PUNCT, " ")
    x = F.regexp_replace(x, _WS, " ")
    return F.trim(x)


def with_normalized(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    return df.withColumn(out_col, normalize_expr(F.col(text_col)))


def normalized_dedup_stats(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group accounting of what normalization buys the deduper:
    (group, n_docs, n_raw_distinct, n_norm_distinct) — the gap between
    the two distinct counts is exactly the variants collapsed."""
    d = with_normalized(df, text_col)
    return d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(text_col).alias("n_raw_distinct"),
        F.countDistinct("norm_text").alias("n_norm_distinct"),
    )


def drop_normalized_dupes(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on the NORMALIZED form: keep the min-id doc per
    normalized content (schema unchanged — the normalized column is
    internal). Same left-semi shape as dedup.drop_exact_duplicates:
    only (digest, id) pairs shuffle, never text."""
    d = with_normalized(df, text_col).withColumn(
        "_nd", F.sha2(F.col("norm_text"), 256)
    )
    keep = d.groupBy("_nd").agg(F.min(id_col).alias(id_col))
    return (
        d.join(keep, [ "_nd", id_col], "left_semi")
        .drop("norm_text", "_nd")
    )


def normalize_sql(col_sql: str) -> str:
    """The identical chain in DuckDB SQL (RE2; 'g' = replace all, which
    is Spark's default)."""
    return (
        "trim(regexp_replace(regexp_replace(lower("
        + col_sql
        + "), '[!-/:-@\\[-`{-~]', ' ', 'g'), '"
        + _WS
        + "', ' ', 'g'))"
    )
