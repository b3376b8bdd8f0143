"""Corpus cartography: a per-cluster source-composition audit over the
embedding space — which regions of semantic space are dominated by a
single source, and how concentrated each region is. The planning twin
of temperature/mixer: those rebalance by source COUNTS; this shows
whether sources actually occupy distinct semantic territory (the map
behind data-mixing decisions a la the SemDeDup / DoReMi line of work —
clusters where one source holds nearly every vector are redundancy or
coverage gaps, clusters with flat mixes are contested territory).

Deterministic contract (DuckDB oracle: oracles_ivf.cartography_oracle):
- clustering: functions/ivf.py's seeded train + nearest-centroid
  assignment (the bit-reproducible oracles_ivf discipline);
- per cluster: n_vecs, n_sources, the dominant source under the TOTAL
  order (count DESC, source ASC), its exact milli-share
  (1000*top_n div n_vecs), and a Herfindahl concentration index in
  micro-units computed over FLOOR-DIVIDED per-source shares:

    share_micro_s   = (10^6 * n_s) div n_vecs
    herfindahl_micro = (Sum_s share_micro_s^2) div 10^6

  ~10^6/n_sources for a flat mix, ~10^6 for a single-source cluster.
  The per-source floor is part of the contract (floor-of-sum would need
  Sum(n_s^2)*10^6, which overflows int64 at n_vecs > ~3e6); with it,
  every intermediate stays <= 10^12 for any n_vecs <= 9e12, and Spark
  `div` == DuckDB `//` reproduce it bit-for-bit.

Scale shape (100 TB): assignment is a per-row projection (O(k) plan
nodes — the array-literal + index-aware-transform pattern, see
ivf._nearest_centroid_cols); the source join ships only
(id, cluster_id) against (id, source) — embeddings never cross an
exchange; the aggregate collapses map-side to at most
clusters x sources rows, and every ranking window runs on that tiny
frame. The int64 guard raises in-plan past 9e12 rows per cluster
instead of overflowing silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_logger_spark.functions.ivf import ivf_index, train_centroids

_MICRO = 1_000_000

# (10^6 * n_s) must stay in int64: n_s <= n_vecs <= 9e12.
MAX_VECS_PER_CLUSTER = 9_000_000_000_000


def cluster_source_map(
    corpus: DataFrame,
    sources: DataFrame | None = None,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_col: str = "source",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(cluster_id, n_vecs, n_sources, top_source, top_n,
    top_share_milli, herfindahl_micro), one row per non-empty cluster.

    ``sources`` (optional) carries (id_col, source_col) when the corpus
    frame doesn't; pass None if ``source_col`` is already a corpus
    column. The dominant source ties deterministically: count DESC,
    source ASC."""
    if centroids is None:
        centroids = train_centroids(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
        )
    if sources is not None:
        assigned = ivf_index(corpus, centroids, id_col, vec_col).select(
            id_col, "cluster_id"
        ).join(sources.select(id_col, source_col), id_col)
    else:
        assigned = ivf_index(corpus, centroids, id_col, vec_col).select(
            id_col, "cluster_id", source_col
        )
    per_src = assigned.groupBy("cluster_id", source_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    clus = Window.partitionBy("cluster_id")
    guard = F.when(
        F.col("n_vecs") > MAX_VECS_PER_CLUSTER,
        F.raise_error(F.concat(
            F.lit(
                "cluster_source_map: cluster exceeds "
                f"{MAX_VECS_PER_CLUSTER} vectors; the share numerator "
                "would overflow int64 — shard the audit: "
            ),
            F.col("n_vecs").cast("string"),
        )),
    )
    rank = Window.partitionBy("cluster_id").orderBy(
        F.col("_n").desc(), F.col(source_col).asc()
    )
    return (
        per_src.withColumn("n_vecs", F.sum("_n").over(clus))
        .withColumn("n_vecs", guard.otherwise(F.col("n_vecs")))
        .withColumn("_share", F.expr(f"({_MICRO} * _n) div n_vecs"))
        .withColumn("_rk", F.row_number().over(rank))
        .groupBy("cluster_id")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.max(F.when(F.col("_rk") == 1, F.col(source_col))).alias(
                "top_source"
            ),
            F.max(F.when(F.col("_rk") == 1, F.col("_n"))).alias("top_n"),
            F.sum(F.col("_share") * F.col("_share")).alias("_sum_sq"),
        )
        .select(
            F.col("cluster_id").cast("long").alias("cluster_id"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            "top_source",
            F.col("top_n").cast("long").alias("top_n"),
            F.expr("(1000 * top_n) div n_vecs").alias("top_share_milli"),
            F.expr(f"_sum_sq div {_MICRO}").alias("herfindahl_micro"),
        )
    )
