"""Repetition-based quality signals — the Gopher/MassiveText family of
filters (Rae et al. 2021, "Scaling Language Models", appendix A1.1):
heavily self-repetitive documents (boilerplate, scraped navigation,
keyword stuffing) are the single biggest class of low-quality training
text, and they are detectable entirely from within-document statistics:

- duplicate LINE fraction (share of non-empty lines that repeat),
- top n-gram multiplicity (how often the most frequent word bigram
  occurs),
- duplicate n-gram fraction (share of word 5-grams that are repeats).

This implementation reports COUNT-based fractions (the published rules
use character-mass fractions; counts are the same signal, integer-exact
and engine-portable — every column here is BIGINT, so the DuckDB oracle
hashes identically). Thresholds in ``GOPHER_THRESHOLDS_MILLI`` carry the
published values as milli-fractions.

Scale shape: every metric is a per-row expression over array functions —
zero shuffles, zero UDFs, whole-stage codegen. The top-bigram
multiplicity deliberately avoids the O(distinct x n) count-each-distinct
formulation: the bigram array is SORTED (O(n log n) per doc) and the
longest equal-run is folded in one ``aggregate`` pass, so a pathological
million-word document costs n log n, not n^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# count-based milli-fraction thresholds carrying the published
# character-fraction rule values: dup lines 30.0%, top bigram 18.0%,
# dup 5-grams 15.0%
GOPHER_THRESHOLDS_MILLI = {
    "dup_line_milli": 300,
    "top_bigram_milli": 180,
    "dup_5gram_milli": 150,
}


def ngram_join_expr(words_sql: str, n: int) -> str:
    """SQL for the array of space-joined word n-grams of ``words_sql``
    (empty array below n words — sequence() must be guarded: with
    stop < start it would count DOWN, not return empty)."""
    return (
        f"IF(size({words_sql}) >= {n}, "
        f"transform(sequence(1, size({words_sql}) - {n - 1}), "
        f"i -> array_join(slice({words_sql}, i, {n}), ' ')), "
        "array())"
    )


def max_run_expr(sorted_arr_sql: str) -> str:
    """SQL for the longest equal-element run of a SORTED string array —
    the multiplicity of the most frequent element, O(n) after the sort,
    0 for an empty array."""
    return (
        f"aggregate({sorted_arr_sql}, "
        "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', IF(x <=> acc.prev, acc.run + 1L, 1L), "
        "  'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))), "
        "acc -> acc.best)"
    )


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the repetition columns (all BIGINT):

    - ``n_lines`` / ``dup_line_milli``: non-empty '\\n'-lines and
      1000 * duplicate-line count DIV n_lines;
    - ``top_bigram_n`` / ``top_bigram_milli``: multiplicity of the most
      frequent word bigram and its milli-share of all bigrams;
    - ``dup_5gram_milli``: 1000 * repeated-5-gram count DIV n_5grams;
    - ``repetition_flagged``: true when any metric crosses its
      GOPHER_THRESHOLDS_MILLI bound.
    """
    lines = f"filter(split({text_col}, '\\n'), x -> x != '')"
    words = f"split({text_col}, ' ')"
    bi = ngram_join_expr(words, 2)
    g5 = ngram_join_expr(words, 5)
    out = (
        df.withColumn("n_lines", F.expr(f"cast(size({lines}) as long)"))
        .withColumn(
            "dup_line_milli",
            F.expr(
                f"(1000 * (size({lines}) - size(array_distinct({lines}))))"
                f" div greatest(size({lines}), 1)"
            ),
        )
        .withColumn("_bi", F.expr(bi))
        .withColumn("top_bigram_n", F.expr(max_run_expr("array_sort(_bi)")))
        .withColumn(
            "top_bigram_milli",
            F.expr("(1000 * top_bigram_n) div greatest(size(_bi), 1)"),
        )
        .withColumn("_g5", F.expr(g5))
        .withColumn(
            "dup_5gram_milli",
            F.expr(
                "(1000 * (size(_g5) - size(array_distinct(_g5))))"
                " div greatest(size(_g5), 1)"
            ),
        )
        .drop("_bi", "_g5")
    )
    flag: Column = F.lit(False)
    for col, thr in GOPHER_THRESHOLDS_MILLI.items():
        flag = flag | (F.col(col) > thr)
    return out.withColumn("repetition_flagged", flag)


def repetition_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop documents any repetition metric flags (the filter form;
    ``with_repetition_stats`` is the observable form)."""
    stats = with_repetition_stats(df, text_col)
    return stats.filter(~F.col("repetition_flagged")).drop(
        "n_lines", "dup_line_milli", "top_bigram_n", "top_bigram_milli",
        "dup_5gram_milli", "repetition_flagged",
    )


def repetition_stats_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB re-derivations of every metric (same tokenization, same
    integer arithmetic; the top-bigram multiplicity uses the equivalent
    max-group-count formulation — identical value, engine-idiomatic)."""
    lines = f"list_filter(string_split({text_expr}, chr(10)), x -> x != '')"
    words = f"string_split({text_expr}, ' ')"

    def grams(n):
        return (
            f"CASE WHEN len({words}) >= {n} THEN "
            f"list_transform(range(1, len({words}) - {n - 2}), "
            f"i -> array_to_string({words}[i:i+{n - 1}], ' ')) "
            "ELSE [] END"
        )

    bi, g5 = grams(2), grams(5)
    top_bi = (
        f"COALESCE((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt "
        f"FROM (SELECT unnest({bi}) AS g) GROUP BY g)), 0)"
    )
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "dup_line_milli": (
            f"(1000 * (len({lines}) - len(list_distinct({lines}))))"
            f" // greatest(len({lines}), 1)"
        ),
        "top_bigram_n": f"CAST({top_bi} AS BIGINT)",
        "top_bigram_milli": (
            f"(1000 * {top_bi}) // greatest(len({bi}), 1)"
        ),
        "dup_5gram_milli": (
            f"(1000 * (len({g5}) - len(list_distinct({g5}))))"
            f" // greatest(len({g5}), 1)"
        ),
    }
