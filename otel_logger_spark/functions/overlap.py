"""Cross-source shingle overlap — the corpus-diversity audit behind mix
planning.

Before allocating a token budget across sources (functions/mixer.py),
the curator needs to know how REDUNDANT the sources are with each
other: two sources with Jaccard 0.9 over their shingle sets contribute
far less combined diversity than their token counts suggest. This
operator reports, for every source pair, the exact n-gram-shingle set
overlap (counts + integer milli Jaccard) plus each source's distinct-
shingle vocabulary size — all exact set arithmetic, no sketches, so the
oracle re-derives it bit-for-bit.

Scale shape (100 TB) — ONE corpus traversal, ONE corpus-sized exchange:
the exploded (shingle, source) stream partial-aggregates map-side into
per-shingle source SETS (collect_set dedups before the wire), so the
single shuffle moves at most |distinct shingles| x |partitions| rows.
Each shingle's sorted set then expands to its self+cross source pairs —
at most S^2 per shingle, a constant (a curated corpus has tens of
sources) — and ONE S^2-key hash aggregate with map-side partials counts
them: the diagonal (s,s) IS the per-source vocabulary size, the
off-diagonal (a,b) the pair intersection, so sizes and overlaps come
out of the same pass instead of re-shingling the corpus per branch
(Catalyst has no cross-branch CSE — the first draft of this operator
scanned the corpus 9x). The S^2-row result is localCheckpoint-ed so the
report's self-joins consume the tiny table, not the lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.dedup import with_shingles


def source_shingles(
    df: DataFrame, n: int = 3, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """DISTINCT (source, shingle): each source's shingle vocabulary."""
    return (
        with_shingles(df, n, text_col)
        .select(source_col, F.explode("shingles").alias("shingle"))
        .distinct()
    )


def _pair_counts(
    df: DataFrame, n: int, source_col: str, text_col: str
) -> DataFrame:
    """(source_a, source_b, cnt) for source_a <= source_b: the diagonal
    counts shingles per source (vocabulary size), the off-diagonal
    shingles common to the pair — one traversal, one exchange."""
    per_shingle = (
        with_shingles(df, n, text_col)
        .select(F.col(source_col).alias("src"), F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_set("src")).alias("srcs"))
    )
    # sorted set -> all (a, b) with a <= b, including the (a, a) diagonal
    pairs = per_shingle.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) -> "
                "transform(slice(srcs, i + 1, size(srcs)), "
                "b -> struct(a AS source_a, b AS source_b))))"
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    counts = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # S^2 rows: materialize once so the report's three references below
    # consume a tiny cached table instead of re-running the corpus scan
    # per branch (no cross-branch CSE in Catalyst)
    return counts.localCheckpoint()


def source_overlap_report(
    df: DataFrame, n: int = 3, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """(source_a, source_b, n_a, n_b, n_common, j_milli) for every
    source pair with a non-empty intersection, source_a < source_b.
    Integer milli Jaccard matches the ngram_jaccard rendering
    (FLOOR(1000 * |A∩B| / |A∪B|))."""
    counts = _pair_counts(df, n, source_col, text_col)
    sizes = counts.filter(F.col("source_a") == F.col("source_b")).select(
        F.col("source_a").alias("src"), F.col("cnt").alias("n_sh")
    )
    off = counts.filter(F.col("source_a") < F.col("source_b")).withColumnRenamed(
        "cnt", "n_common"
    )
    sa = sizes.select(F.col("src").alias("source_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("src").alias("source_b"), F.col("n_sh").alias("n_b"))
    return (
        off.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_common",
            F.floor(
                1000
                * F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            )
            .cast("long")
            .alias("j_milli"),
        )
    )
