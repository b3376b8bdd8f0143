"""Leakage-safe splitting (functions/split.py): threshold math, the
no-straddling guarantee end-to-end (near-dup pairs never cross splits),
coverage/determinism, guards, and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.sampling import sample_key_py
from otel_logger_spark.functions.split import (
    leakage_safe_split,
    split_case_sql,
    split_report,
    split_thresholds,
)

SF = "/root/testdata/sf0.001"
RATIOS = [("train", 800), ("val", 100), ("test", 100)]


def test_thresholds_cover_key_space_exactly():
    th = split_thresholds(RATIOS)
    assert th[0][1] == 0 and th[-1][2] == 1 << 32
    for (_, _, hi_prev), (_, lo, _) in zip(th, th[1:]):
        assert hi_prev == lo
    # integer thresholds: 800/1000 of 2^32 exactly
    assert th[0][2] == (800 * (1 << 32)) // 1000


def test_assignment_matches_python_key(spark):
    df = spark.createDataFrame(
        [(i, i * 37 % 50) for i in range(500)], "doc_id long, cluster_id long"
    )
    got = {r["doc_id"]: r["split"]
           for r in leakage_safe_split(df, RATIOS).collect()}
    th = split_thresholds(RATIOS)
    for i in range(500):
        k = sample_key_py(i * 37 % 50)
        want = next(n for n, lo, hi in th if lo <= k < hi)
        assert got[i] == want


def test_no_near_dup_pair_straddles_splits(spark):
    """End-to-end over the injected-duplicate corpus: every Jaccard pair
    lands in one split — the guarantee the per-document hash split
    violates."""
    from otel_logger_spark.functions.dedup import ngram_jaccard_pairs
    from otel_logger_spark.functions.graph import dedup_clusters
    from otel_logger_spark.graftdata import load_corpus

    corpus = load_corpus(spark, SF)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.5)
    clusters = dedup_clusters(
        corpus.select("doc_id"), pairs.select("doc_a", "doc_b")
    )
    assigned = leakage_safe_split(clusters, RATIOS).select("doc_id", "split")
    a = assigned.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
        "split", "sa")
    b = assigned.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
        "split", "sb")
    straddling = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert pairs.count() > 0 and straddling == 0


def test_report_conserves_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, i % 97) for i in range(2000)], "doc_id long, cluster_id long"
    )
    r1 = sorted(map(tuple, split_report(df, RATIOS).collect()))
    r2 = sorted(map(tuple, split_report(df, RATIOS).collect()))
    assert r1 == r2
    assert sum(r[1] for r in r1) == 2000
    assert sum(r[2] for r in r1) == 97      # each unit in exactly one split


def test_guards():
    with pytest.raises(ValueError, match="sum to 1000"):
        split_thresholds([("a", 500), ("b", 400)])
    with pytest.raises(ValueError, match="duplicate"):
        split_thresholds([("a", 500), ("a", 500)])
    with pytest.raises(ValueError, match="positive"):
        split_thresholds([("a", 1000), ("b", 0)])
    with pytest.raises(ValueError, match="non-empty"):
        split_thresholds([])


def test_case_sql_matches_engine(spark):
    con = duckdb.connect()
    case = split_case_sql("u", RATIOS)
    th = split_thresholds(RATIOS)
    for u in [0, 1, 7, 49, 12345, 4_294_967_295, 10**12 + 7]:
        want = next(n for n, lo, hi in th if lo <= sample_key_py(u) < hi)
        got = con.execute(f"SELECT {case} FROM (SELECT CAST({u} AS BIGINT) AS u)").fetchone()[0]
        assert got == want, (u, got, want)


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_leakage_split,
        q_leakage_split,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(_o_leakage_split()).fetchall()}
    got = {tuple(r) for r in q_leakage_split(spark, SF).collect()}
    assert got == exp and len(got) > 0
