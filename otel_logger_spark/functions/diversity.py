"""Corpus n-gram diversity audit: per-group distinct-gram and type-token
accounting. A training mix that looks balanced by token COUNT can still
be degenerate if one source is templated boilerplate — the standard
audit (Gopher §A3.2 reports n-gram diversity; self-BLEU measures the
same thing generatively) is distinct n-grams over total n-grams.

Per group: n_docs, total unigram occurrences, distinct unigrams,
distinct word-n-grams, and the integer milli type-token ratios. All
counts exact (COUNT DISTINCT, not sketches — the HLL gate covers the
approximate regime separately).

Scale shape (100 TB): grams are hashed to int64 BEFORE the exchange
(xxhash64 — the dedup digest discipline), so the distinct-aggregation
shuffle moves (group, h64) pairs, never gram strings; partial distinct
aggregation is Spark's built-in two-phase distinct. Document text
crosses zero exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.repetition import ngram_join_expr


def diversity_partials(
    df: DataFrame,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """(counts, digests) for one slice of the corpus — the exact-distinct
    streaming decomposition (round 8): counts (group, n_docs, n_tokens,
    n_ngrams) are associative sums across slices (a doc lives wholly in
    one slice), and digests (group, kind, h) are slice-DISTINCT hashes
    whose union re-distincts to the global distinct counts —
    distinct-of-union == distinct, unlike the sum-only partials of the
    contamination/OOV streaming ops. Each slice ships at most its own
    vocabulary, never its token stream."""
    if n < 2:
        raise ValueError(f"n must be >= 2 (unigrams are always reported): {n}")
    words = f"split({text_col}, ' ')"
    ex = df.select(
        group_col,
        id_col,
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).withColumn("_h", F.xxhash64("_tok"))
    gx = df.select(
        group_col,
        F.explode(F.expr(ngram_join_expr(words, n))).alias("_g"),
    ).withColumn("_h", F.xxhash64("_g"))
    counts = (
        ex.groupBy(group_col)
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .join(
            gx.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_ngrams")),
            group_col,
            "left",
        )
        .withColumn("n_ngrams", F.coalesce("n_ngrams", F.lit(0)))
    )
    digests = ex.select(
        group_col, F.lit("tok").alias("kind"), "_h"
    ).distinct().unionByName(
        gx.select(group_col, F.lit("gram").alias("kind"), "_h").distinct()
    )
    return counts, digests


def diversity_finalize(
    counts: DataFrame, digests: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Assemble the diversity report from unioned slice partials —
    row-for-row equal to diversity_report on the same corpus (pinned in
    tests/test_streaming_diversity.py): sums over counts, COUNT DISTINCT
    over the re-unioned digests, identical milli formulas."""
    c = counts.groupBy(group_col).agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum("n_ngrams").alias("n_ngrams"),
    )
    d = digests.groupBy(group_col).agg(
        F.countDistinct(
            F.when(F.col("kind") == "tok", F.col("_h"))
        ).alias("distinct_tokens"),
        F.countDistinct(
            F.when(F.col("kind") == "gram", F.col("_h"))
        ).alias("distinct_ngrams"),
    )
    return (
        c.join(d, group_col, "left")
        .withColumn("distinct_tokens", F.coalesce("distinct_tokens", F.lit(0)))
        .withColumn("distinct_ngrams", F.coalesce("distinct_ngrams", F.lit(0)))
        .withColumn(
            "ttr_milli",
            F.expr("CAST((1000 * distinct_tokens) DIV n_tokens AS BIGINT)"),
        )
        .withColumn(
            "ngram_diversity_milli",
            F.when(F.col("n_ngrams") == 0, F.lit(0).cast("bigint")).otherwise(
                F.expr("CAST((1000 * distinct_ngrams) DIV n_ngrams AS BIGINT)")
            ),
        )
        .select(
            group_col, "n_docs", "n_tokens", "distinct_tokens",
            "distinct_ngrams", "ttr_milli", "ngram_diversity_milli",
        )
    )


def diversity_report(
    df: DataFrame,
    n: int = 3,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, n_tokens, distinct_tokens, distinct_ngrams,
    ttr_milli, ngram_diversity_milli) — ttr_milli = 1000*distinct_tokens
    DIV n_tokens; ngram_diversity_milli = 1000*distinct_ngrams DIV
    n_ngrams (0 when a group has no n-grams: every doc shorter than n)."""
    if n < 2:
        raise ValueError(f"n must be >= 2 (unigrams are always reported): {n}")
    words = f"split({text_col}, ' ')"
    ex = df.select(
        group_col,
        id_col,
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).withColumn("_h", F.xxhash64("_tok"))
    toks = ex.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("_h").alias("distinct_tokens"),
    )
    gx = df.select(
        group_col,
        F.explode(F.expr(ngram_join_expr(words, n))).alias("_g"),
    ).withColumn("_gh", F.xxhash64("_g"))
    grams = gx.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.countDistinct("_gh").alias("distinct_ngrams"),
    )
    return (
        toks.join(grams, group_col, "left")
        .withColumn("n_ngrams", F.coalesce("n_ngrams", F.lit(0)))
        .withColumn("distinct_ngrams", F.coalesce("distinct_ngrams", F.lit(0)))
        .withColumn(
            "ttr_milli",
            F.expr("CAST((1000 * distinct_tokens) DIV n_tokens AS BIGINT)"),
        )
        .withColumn(
            "ngram_diversity_milli",
            F.when(F.col("n_ngrams") == 0, F.lit(0).cast("bigint")).otherwise(
                F.expr("CAST((1000 * distinct_ngrams) DIV n_ngrams AS BIGINT)")
            ),
        )
        .drop("n_ngrams")
    )
