"""Corpus cartography (functions/cartography.py): hand-checked
composition math on pinned centroids, tie-break determinism, the
inline-source path, and gate parity vs the DuckDB oracle at a second
SF with a non-gate cluster count."""

import duckdb

from otel_logger_spark.functions.cartography import cluster_source_map

SF = "/root/testdata/sf0.001"

# two well-separated pinned centroids: assignment is unambiguous
CENTS = [[0.0, 0.0], [10.0, 10.0]]


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, source string"
    )


def test_hand_composition_and_herfindahl(spark):
    """cluster0: a=3, b=1 -> shares 750000/250000, top a @750 milli,
    HHI (750000^2 + 250000^2)//1e6 = 625000. cluster1: x=2, y=2 ->
    tie broken ASC (top x @500), HHI 2*(500000^2)//1e6 = 500000."""
    rows = [
        (1, [0.1, 0.0], "a"), (2, [0.0, 0.1], "a"), (3, [0.2, 0.1], "a"),
        (4, [0.1, 0.1], "b"),
        (5, [9.9, 10.0], "y"), (6, [10.0, 9.9], "y"),
        (7, [10.1, 10.0], "x"), (8, [10.0, 10.1], "x"),
    ]
    got = {r["cluster_id"]: r for r in cluster_source_map(
        _emb(spark, rows), sources=None, centroids=CENTS
    ).collect()}
    c0, c1 = got[0], got[1]
    assert (c0["n_vecs"], c0["n_sources"]) == (4, 2)
    assert (c0["top_source"], c0["top_n"], c0["top_share_milli"]) == ("a", 3, 750)
    assert c0["herfindahl_micro"] == 625_000
    assert (c1["top_source"], c1["top_n"], c1["top_share_milli"]) == ("x", 2, 500)
    assert c1["herfindahl_micro"] == 500_000


def test_single_source_cluster_is_max_concentration(spark):
    rows = [(i, [0.0, float(i) / 100], "only") for i in range(5)]
    r = cluster_source_map(_emb(spark, rows), centroids=CENTS).collect()[0]
    assert r["n_sources"] == 1
    assert r["top_share_milli"] == 1000
    assert r["herfindahl_micro"] == 1_000_000


def test_separate_sources_frame_matches_inline(spark):
    rows = [
        (1, [0.1, 0.0], "a"), (2, [0.0, 0.1], "b"),
        (3, [10.1, 10.0], "a"), (4, [10.0, 10.1], "a"),
    ]
    inline = sorted(map(tuple, cluster_source_map(
        _emb(spark, rows), centroids=CENTS
    ).collect()))
    emb_only = _emb(spark, rows).select("vec_id", "embedding")
    src = _emb(spark, rows).select("vec_id", "source")
    joined = sorted(map(tuple, cluster_source_map(
        emb_only, sources=src, centroids=CENTS
    ).collect()))
    assert inline == joined


def test_gate_parity_second_sf(spark):
    """The gate runs at sf0.01 with n_clusters=16; replay at sf0.001
    with n_clusters=8 so parity isn't tuned to one configuration."""
    from otel_logger_spark.oracles_ivf import cartography_oracle
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    got = sorted(map(tuple, cluster_source_map(
        emb, docs, n_clusters=8
    ).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(
        cartography_oracle(f"{SF}/embeddings.parquet", n_clusters=8)
    ).fetchall()))
    assert got == want
