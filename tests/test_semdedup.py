"""Semantic dedup (functions/semdedup.py): hand-case keeper semantics,
lower-id-wins (non-closure) rule, threshold guards, cluster-boundary
blindness, report accounting, and full oracle parity at a second SF.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.semdedup import (
    semantic_dedup,
    semantic_dedup_report,
    semantic_dup_ids,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_lower_id_wins_and_non_closure(spark):
    """v0 ~ v1 (near-identical), v2 ~ v1 but not ~ v0? With everything in
    one cluster: v1 drops (lower-id neighbor v0); v2 drops iff it has
    ANY lower-id neighbor over threshold — including the dropped v1
    (the documented local-minimum rule, not transitive closure)."""
    # one cluster: centroids passed explicitly so clustering is trivial
    cents = [[0.0, 0.0]]
    df = _emb(spark, [[1.0, 0.0], [1.0, 0.001], [0.999, 0.03]])
    drops = {r["vec_id"] for r in semantic_dup_ids(
        df, threshold_micro=999_000, centroids=cents).collect()}
    # cos(v0,v1) ~ 1 -> v1 drops; cos(v1,v2)=~0.9996 >= .999 -> v2 drops
    assert drops == {1, 2}
    kept = semantic_dedup(df, threshold_micro=999_000, centroids=cents)
    assert [r["vec_id"] for r in kept.collect()] == [0]
    assert kept.columns == ["vec_id", "embedding"]


def test_cluster_boundary_blindness(spark):
    """Identical vectors in DIFFERENT clusters both survive — the
    documented SemDeDup approximation (candidates exist only within a
    cluster)."""
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    df = _emb(spark, [[1.0, 0.0], [-1.0, 0.0], [1.0, 0.0001]])
    # v0, v2 -> cluster 0 (near [1,0]); v1 -> cluster 1
    rep = {r["cluster_id"]: (r["n_vecs"], r["n_dropped"], r["n_kept"])
           for r in semantic_dedup_report(
               df, threshold_micro=999_999, centroids=cents).collect()}
    assert rep == {0: (2, 1, 1), 1: (1, 0, 1)}


def test_threshold_guard(spark):
    df = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="threshold_micro"):
        semantic_dup_ids(df, threshold_micro=0)
    with pytest.raises(ValueError, match="threshold_micro"):
        semantic_dup_ids(df, threshold_micro=2_000_000)


def test_report_conservation_real_corpus(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rep = semantic_dedup_report(emb, n_clusters=16, threshold_micro=930_000)
    rows = rep.collect()
    assert sum(r["n_vecs"] for r in rows) == emb.count()
    assert all(r["n_vecs"] == r["n_dropped"] + r["n_kept"] for r in rows)
    kept = semantic_dedup(emb, n_clusters=16, threshold_micro=930_000)
    assert kept.count() == sum(r["n_kept"] for r in rows)


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_semantic_dedup,
        q_semantic_dedup,
    )

    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF
    try:
        sql = _o_semantic_dedup()
    finally:
        del os.environ["SPARK_GRAFT_ORACLE_SF_DIR"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    exp = {tuple(r) for r in con.sql(sql).fetchall()}
    got = {tuple(r) for r in q_semantic_dedup(spark, SF).collect()}
    assert got == exp and len(got) > 0


def test_max_cluster_degenerate_corpus_completes_with_accounting(spark):
    """Round 8 (VERDICT r7 #5): a degenerate corpus — every embedding
    identical — collapses into ONE cluster, reverting the self-join to
    ~N^2 in one task. With max_cluster set the over-cap cluster is
    excluded from comparison (all rows KEPT, never silently dropped) and
    semdedup_cap_report accounts for the exclusion."""
    from otel_logger_spark.functions.semdedup import semdedup_cap_report

    n = 64
    df = _emb(spark, [[1.0, 0.0, 0.0, 0.0]] * n)
    kept = semantic_dedup(
        df, n_clusters=4, threshold_micro=900_000, max_cluster=8
    )
    assert kept.count() == n  # the runaway cluster is skipped, not dropped
    rep = semdedup_cap_report(df, n_clusters=4, max_cluster=8).collect()[0]
    assert rep["excluded_rows"] == n
    assert rep["capped_buckets"] == 1
    assert rep["max_bucket_size"] == n


def test_max_cluster_noop_on_normal_corpus(spark):
    """capped == uncapped when no cluster exceeds the cap: the guard must
    not change results on healthy corpora."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = {r["vec_id"] for r in semantic_dedup(
        emb, n_clusters=16, threshold_micro=930_000).collect()}
    capped = {r["vec_id"] for r in semantic_dedup(
        emb, n_clusters=16, threshold_micro=930_000,
        max_cluster=10**9).collect()}
    assert base == capped
    from otel_logger_spark.functions.semdedup import semdedup_cap_report

    rep = semdedup_cap_report(
        emb, n_clusters=16, max_cluster=10**9).collect()[0]
    assert rep["excluded_rows"] == 0 and rep["capped_buckets"] == 0


def test_max_cluster_guard(spark):
    df = _emb(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="max_cluster"):
        semantic_dup_ids(df, max_cluster=0).collect()
