"""Embedding outlier audit (functions/outliers.py, round 8): exact
integer centroid/distance pipeline, hand-verifiable compositions, the
quantization domain guard, flag-threshold edges, and oracle parity at a
second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.outliers import (
    OFFSET,
    SCALE,
    outlier_report,
    quantize_vec,
    with_outlier_stats,
)

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<double>"
    )


def test_hand_case_centroid_distance_and_flag(spark):
    """3 vectors in one group at D=2: centroid, distances and the flag
    replayed independently in exact integer arithmetic (quantization
    replayed in Python — CPython floats are the same IEEE doubles both
    engines use)."""
    import math

    rows = [
        (1, 0, [0.0, 0.0]),
        (2, 0, [0.2, 0.0]),
        (3, 0, [0.0, 0.1]),
        (4, 0, [-0.1, 0.0]),
        (5, 0, [0.1, -0.2]),
        (6, 0, [0.9, 0.9]),  # the designed outlier
    ]
    got = {
        r["vec_id"]: r
        for r in with_outlier_stats(_df(spark, rows), mult_milli=2000).collect()
    }
    q = {
        vid: [math.floor(x * SCALE) + OFFSET for x in vec]
        for vid, _, vec in rows
    }
    n = len(rows)
    c = [sum(q[v][d] for v in q) // n for d in range(2)]
    dist = {
        vid: sum((q[vid][d] - c[d]) ** 2 for d in range(2)) for vid in q
    }
    mean = sum(dist.values()) // n
    for vid, dist2 in dist.items():
        assert got[vid]["dist2"] == dist2
        assert got[vid]["mean_d2"] == mean
        assert got[vid]["is_outlier"] == (1000 * dist2 > 2000 * mean)
    # vector 6 is the designed outlier, the cluster is not
    assert got[6]["is_outlier"]
    assert not any(got[v]["is_outlier"] for v in (1, 2, 3, 4, 5))


def test_report_summary_and_top_outlier_tiebreak(spark):
    """Two symmetric extreme vectors tie on dist2 -> smallest id wins."""
    rows = [
        (10, 0, [0.5]),
        (11, 0, [0.5]),
        (12, 0, [-0.5]),
        (13, 0, [-0.5]),
    ]
    rep = outlier_report(_df(spark, rows)).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["n_vecs"] == 4
    # centroid is exactly the midpoint: all dist2 equal -> no outliers
    assert r["n_outliers"] == 0
    assert r["top_outlier_id"] == 10  # four-way tie -> smallest id


def test_quantization_guard_raises_out_of_domain(spark):
    df = _df(spark, [(1, 0, [1.5])])
    with pytest.raises(Exception, match="quantize_vec"):
        df.select(quantize_vec(F.col("embedding")).alias("q")).collect()


def test_quantization_matches_duckdb_bitwise(spark):
    """floor(1e6*x)+OFFSET over the real float32 corpus must be
    bit-identical across engines (float32 widens exactly; 1e6 scaling of
    a 24-bit mantissa is exact in double)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = dict(
        emb.select(
            "vec_id", quantize_vec(F.col("embedding")).alias("q")
        ).collect()
    )
    con = duckdb.connect()
    exp = dict(
        con.sql(
            f"""SELECT vec_id, list_transform(embedding,
                  x -> CAST(FLOOR(CAST(x AS DOUBLE) * {SCALE}) AS BIGINT)
                       + {OFFSET})
                FROM '{SF}/embeddings.parquet'"""
        ).fetchall()
    )
    assert got == exp


def test_gate_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        O_EMBEDDING_OUTLIERS,
        q_embedding_outliers,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    exp = {tuple(r) for r in con.sql(O_EMBEDDING_OUTLIERS).fetchall()}
    got = {tuple(r) for r in q_embedding_outliers(spark, SF).collect()}
    assert got == exp
    # both flag branches live at this SF
    assert any(t[2] > 0 for t in got) and any(t[2] == 0 for t in got)
