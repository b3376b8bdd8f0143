"""IVF (inverted-file) approximate nearest neighbor: the coarse-quantizer
scale path complementing the hyperplane-LSH variant (similarity.py).

Train: a few Lloyd iterations of k-means over a deterministic seeded sample
(distributed: assignment is a map over the corpus with broadcast centroids;
update is a groupBy mean). Index: each vector is assigned to its nearest
centroid (the inverted list). Search: a query probes only the ``n_probe``
nearest centroid lists — candidate volume drops by ~k/n_probe versus brute
force, and the probe join is a broadcast equi-join on cluster id.

All distance math runs in JVM higher-order functions; centroids travel as
broadcast literals. Determinism: seeded sample + fixed iteration count, so
the index is identical across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_logger_spark.functions.similarity import _dot, with_norm


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.transform(vec_col, lambda x: x.cast("double")))


def lloyd(x: np.ndarray, k: int, iters: int, seed: int) -> list[list[float]]:
    """The driver-side Lloyd iteration, isolated so the DuckDB oracle
    (oracles_ivf.py) runs the IDENTICAL numpy operation sequence on an
    INDEPENDENTLY-derived copy of the training sample: centroids are then
    parameters shared bit-for-bit by engine and oracle, and everything
    downstream (assignment, probing, distance, top-k) is re-derived in
    pure SQL."""
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(0)
    return cents.tolist()


def train_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 3,
    sample: int = 2048,
    vec_col: str = "embedding",
    seed: int = 42,
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Driver-side Lloyd over a seeded sample (the standard IVF recipe:
    training is tiny relative to the corpus; indexing/search stay
    distributed).

    Sampling is a deterministic hash-threshold filter on the id column —
    one column-pruned scan plus a metadata-cheap count. (The previous
    xxhash64(to_json(vec)) sort-sample serialized every embedding to JSON
    for a full-corpus TakeOrdered — a whole extra pass at 100 TB.) The
    ~4x-oversampled survivors are ordered by their hash for a deterministic
    final cut; only that small set is ever sorted."""
    n_total = corpus.count()  # parquet metadata count; no data pages read
    frac = min(1.0, (4 * sample) / max(n_total, 1))
    mod = 1 << 30
    h = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(mod))
    rows = (
        _as_double(corpus, vec_col)
        .select(id_col, vec_col)
        .withColumn("_h", h)
        .filter(F.col("_h") < int(frac * mod))
        .orderBy("_h", id_col)
        .limit(sample)
        .select(vec_col)
        .collect()
    )
    x = np.array([r[0] for r in rows], dtype=np.float64)
    return lloyd(x, k, iters, seed)


def _nearest_centroid_cols(vec_col: str, centroids: list[list[float]], n: int = 1):
    """Expression computing the id(s) of the n nearest centroids (L2).

    Round 7: the centroid table is k single array<double> literals
    consumed by an index-aware transform — expression size O(k), not
    O(k*D) unrolled terms (the quantize.py lesson; at real embedding
    dims 768-4096 with hundreds of coarse centroids the unrolled tree
    melts Catalyst). The per-centroid distance stays the IDENTICAL
    zip_with/aggregate fold, so distances — and therefore assignments
    and probe order — are bit-unchanged (the DuckDB oracle re-derives
    the same left-associated sums)."""
    # Round 9: ONE F.expr SQL string instead of the nested Python-lambda
    # Column DSL. The DSL form cost ~0.5 s of py4j round trips PER CALL
    # (two calls per ANN query — the dominant builder cost, measured);
    # the parsed string is the IDENTICAL expression tree (same zip_with/
    # aggregate fold, same struct sort order — verified 0 differing rows
    # against the DSL form) built in one JVM call. Centroid doubles embed
    # as CAST('<repr>' AS DOUBLE): repr() is shortest-roundtrip and
    # Double.parseDouble is correctly rounded, so the literals are
    # bit-identical to F.lit's.
    rows = ", ".join(
        "array("
        + ", ".join(f"CAST('{repr(float(v))}' AS DOUBLE)" for v in c)
        + ")"
        for c in centroids
    )
    return F.expr(
        f"transform(slice(array_sort(transform(array({rows}), (c, i) -> "
        f"struct(aggregate(zip_with({vec_col}, c, (a, b) -> (a - b) * (a - b)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d, i AS cid))), 1, {n}), "
        "s -> s.cid)"
    )


def ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its inverted list (one pass, no shuffle)."""
    d = _as_double(corpus, vec_col)
    return d.withColumn(
        "cluster_id", _nearest_centroid_cols(vec_col, centroids, 1)[0]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF search: probe the n_probe nearest lists, exact cosine within."""
    centroids = train_centroids(
        corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
    )
    indexed = with_norm(ivf_index(corpus, centroids, id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("_norm").alias("_cn"),
        "cluster_id",
    )
    q = with_norm(_as_double(queries, vec_col), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
        F.explode(
            _nearest_centroid_cols(vec_col, centroids, n_probe)
        ).alias("cluster_id"),
    )
    sims = (
        indexed.join(F.broadcast(q), "cluster_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim_micro",
            F.floor(
                F.lit(1_000_000)
                * _dot(F.col("_cv"), F.col("_qv"))
                / (F.col("_cn") * F.col("_qn"))
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim_micro"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "sim_micro", F.col("rank").cast("long").alias("rank")
        )
    )


def ivf_quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ranges: list[tuple[float, float]],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The COMPOSED 100 TB ANN path: IVF coarse probe for candidates,
    int8 quantized-L2 re-rank (functions/quantize.py) for the ranking.

    Candidate volume drops ~n_clusters/n_probe versus brute force (the
    probe join is a broadcast equi-join on cluster_id — the corpus never
    crosses an exchange), and each candidate comparison moves 1-byte
    codes instead of float32, so the re-rank scan is ~4x lighter than
    ivf_topk's float path and integer-exact. Ranking semantics:
    quantized L2 over the probed lists, (qdist asc, neighbor_id asc) —
    its own deterministic contract, oracled end-to-end
    (oracles_ivf.ivf_quantized_oracle)."""
    from otel_logger_spark.functions.quantize import (
        quantized_distance,
        with_quantized,
    )

    if centroids is None:
        centroids = train_centroids(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed, id_col=id_col
        )
    indexed = with_quantized(
        ivf_index(corpus, centroids, id_col, vec_col), ranges, vec_col, "_cq"
    ).select(F.col(id_col).alias("neighbor_id"), "_cq", "cluster_id")
    q = with_quantized(
        _as_double(queries, vec_col), ranges, vec_col, "_qq"
    ).select(
        F.col(id_col).alias("query_id"),
        "_qq",
        F.explode(
            _nearest_centroid_cols(vec_col, centroids, n_probe)
        ).alias("cluster_id"),
    )
    cands = indexed.join(F.broadcast(q), "cluster_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("qdist", quantized_distance("_cq", "_qq"))
        .select("query_id", "neighbor_id", "qdist")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )
