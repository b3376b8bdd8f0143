"""Embedding outlier audit: flag vectors far from their group centroid.

Corpus-hygiene operator for embedding-labeled training data (mislabeled
docs, encoder garbage, contamination from another distribution all land
far from their group's center). The reference engine has no embedding
surface (main.go is a log forwarder); this is graft-side scope like the
other training-data operators, designed Spark-first.

All arithmetic is exact integer so the DuckDB oracle can replay it
bit-for-bit:

- quantization: ``q_d = floor(1e6 * x_d) + 1_000_000``. A float32 widens
  to double exactly (24-bit mantissa into 53) and the 1e6 scaling of a
  |x| < 1 float32 is exact in double, so the integer is bit-identical in
  any engine. The offset keeps every downstream quantity NON-NEGATIVE,
  which makes Spark's ``DIV`` and DuckDB's ``//`` (both truncate toward
  zero) agree with mathematical floor division.
- centroid: per-dimension integer mean ``c_d = sum(q_d) DIV n``.
- group mean distance WITHOUT a second corpus aggregation: the
  sum-of-squares decomposition ``sum_docs (q_d - c_d)^2 =
  S2_d - 2*c_d*S_d + n*c_d^2`` (exact for ANY integer constant c_d), so
  the same per-dim pass that builds the centroid also yields
  ``mean_d2 = (sum_d term_d) DIV n``. S2 and the terms exceed int64 at
  scale (n * 4e12), so they are carried as DECIMAL(38,0) in Spark /
  HUGEINT in DuckDB — exact in both.
- per-vector distance: ``dist2 = sum_d (q_d - c_d)^2`` — int64, bounded
  by D * (2e6)^2 = 2.56e14 at D=64.
- flag: ``1000 * dist2 > mult_milli * mean_d2`` — division-free
  comparison at milli precision, int64-safe (2.56e17 < 2^63).

100 TB shape:
- the per-dim aggregation posexplodes to (group, pos, q) but
  groupBy(group, pos) has map-side partial aggregation — the exchange
  carries at most groups x D x partitions partial-sum rows, never the
  corpus;
- centroid + mean_d2 come out of that ONE aggregation (the naive
  mean-of-distances needs a second corpus-wide aggregation whose branch
  Catalyst would recompute — no cross-branch CSE), so the corpus is
  traversed exactly TWICE: once for the per-dim partials, once for the
  per-vector distances, with the groups-sized profile broadcast-joined
  back and zero further exchanges on the corpus side;
- in-plan raise_error guard: |x| <= 0.999999 (quantization domain).
  DECIMAL(38,0) carries the squared sums, so there is no n-dependent
  overflow cliff to guard (10^38 / 4e12 ~ 2.5e25 vectors per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
OFFSET = 1_000_000


def quantize_vec(vec_col, scale: int = SCALE, offset: int = OFFSET):
    """array<float> -> array<bigint>, exact and engine-portable; raises
    in-plan if any element leaves the documented (-1, 1) domain."""

    def q(e):
        checked = F.when(
            F.abs(e) > F.lit(0.999999),
            F.raise_error(
                F.concat(
                    F.lit(
                        "quantize_vec: |element| > 0.999999 breaks the "
                        "non-negative quantization contract: "
                    ),
                    e.cast("string"),
                )
            ),
        ).otherwise(e)
        return (
            F.floor(checked.cast("double") * F.lit(scale)).cast("long")
            + F.lit(offset)
        )

    return F.transform(vec_col, q)


def group_profiles(
    df: DataFrame, group_col: str = "label", q_col: str = "q"
) -> DataFrame:
    """(group, n_vecs, centroid array<bigint>, mean_d2) from ONE per-dim
    aggregation: posexplode -> groupBy(group, pos) sums S, S2, n
    (map-side combined), centroid c = S DIV n, and the group's mean
    squared distance via the exact decomposition
    sum(q-c)^2 = S2 - 2cS + nc^2 summed over dims, DIV n."""
    per_dim = (
        df.select(group_col, F.posexplode(q_col).alias("pos", "qv"))
        .groupBy(group_col, "pos")
        .agg(
            F.sum("qv").alias("s"),
            F.sum(
                F.col("qv").cast("decimal(38,0)") * F.col("qv")
            ).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    term = (
        F.col("s2")
        - F.lit(2) * F.col("c").cast("decimal(38,0)") * F.col("s")
        + F.col("n").cast("decimal(38,0)")
        * F.col("c")
        * F.col("c")
    )
    withc = per_dim.withColumn("c", F.expr("s DIV n")).withColumn(
        "term", term
    )
    return (
        withc.groupBy(group_col)
        .agg(
            F.max("n").alias("n_vecs"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))),
                lambda pc: pc["c"],
            ).alias("centroid"),
            F.expr("CAST(SUM(term) DIV MAX(n) AS BIGINT)").alias("mean_d2"),
        )
    )


def with_outlier_stats(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mult_milli: int = 2000,
) -> DataFrame:
    """Per-vector (id, group, dist2, mean_d2, is_outlier): squared integer
    distance to the group centroid, group mean distance, and the
    milli-precision flag 1000*dist2 > mult_milli*mean_d2. ONE broadcast
    join against the groups-sized profile; the corpus is traversed
    exactly twice (per-dim partials + per-vector distances) and its
    arrays never shuffle."""
    q = df.select(
        F.col(id_col), F.col(group_col), quantize_vec(F.col(vec_col)).alias("q")
    )
    prof = group_profiles(q, group_col)
    return q.join(F.broadcast(prof), group_col).select(
        id_col,
        group_col,
        F.aggregate(
            F.zip_with("q", "centroid", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dist2"),
        "mean_d2",
    ).withColumn(
        "is_outlier",
        F.col("dist2") * F.lit(1000) > F.lit(mult_milli) * F.col("mean_d2"),
    )


def outlier_report(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    mult_milli: int = 2000,
) -> DataFrame:
    """Per-group audit summary: (group, n_vecs, n_outliers, mean_d2,
    max_d2, top_outlier_id) where top_outlier_id is the vector with the
    largest dist2 (ties -> smallest id) — the doc a human would inspect
    first. Groups-sized output; deterministic under the total order."""
    per_doc = with_outlier_stats(df, group_col, vec_col, id_col, mult_milli)
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.max("mean_d2").alias("mean_d2"),
        F.max("dist2").alias("max_d2"),
        F.expr(f"min_by({id_col}, struct(-dist2, {id_col}))").alias(
            "top_outlier_id"
        ),
    )
