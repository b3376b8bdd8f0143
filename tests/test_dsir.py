"""DSIR importance resampling (functions/dsir.py): bucket guards,
feature extraction shape, cross-engine bucket parity (Spark masked
xxhash64 vs DuckDB XXH64 % B), the lambda formula, the score fold, and
full oracle parity at a second SF (the driver compares at sf0.01)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.dsir import (
    bucket_counts,
    dsir_select,
    importance_weights,
    with_dsir_score,
    with_feature_buckets,
)

SF = "/root/testdata/sf0.001"
B = 1024


def test_check_buckets_guard(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in (0, 1, 3, 1000):
        with pytest.raises(ValueError, match="power of two"):
            with_feature_buckets(df, n_buckets=bad)


def test_feature_shape(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["feats"] for r in
            with_feature_buckets(df, B).collect()}
    # n words -> n unigrams + (n-1) bigrams; split('') = [''] -> 1 feat
    assert len(rows[1]) == 4 + 3
    assert len(rows[2]) == 1
    assert len(rows[3]) == 1
    assert all(0 <= f < B for feats in rows.values() for f in feats)
    # multiplicity preserved: repeated word counts twice
    df2 = spark.createDataFrame([(4, "x y x")], "doc_id long, text string")
    f2 = with_feature_buckets(df2, B).collect()[0]["feats"]
    assert len(f2) == 3 + 2


def test_bucket_parity_duckdb(spark):
    """Spark's signed xxhash64 & (B-1) == DuckDB's unsigned XXH64 % B —
    the power-of-two equivalence the module guard protects."""
    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    toks = ["hello", "world", "a b", "ünïcode", "", "x" * 40]
    got = {
        r["t"]: r["b"]
        for r in spark.createDataFrame([(t,) for t in toks], "t: string")
        .select("t", F.xxhash64("t").bitwiseAND(F.lit(B - 1)).alias("b"))
        .collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in toks)
    exp = dict(
        con.execute(
            f"WITH vocab(tok) AS (VALUES {vals}),{xxh64_ctes()}"
            f" SELECT tok, CAST(h64 % {B} AS INT) FROM hashes"
        ).fetchall()
    )
    assert got == exp


def test_importance_weights_formula():
    import math

    lam = importance_weights([3, 0], [1, 2], scale=1000, alpha=1)
    t_tot, s_tot = 3 + 0 + 2, 1 + 2 + 2
    assert lam[0] == round(1000 * (math.log(4 / t_tot) - math.log(2 / s_tot)))
    assert lam[1] == round(1000 * (math.log(1 / t_tot) - math.log(3 / s_tot)))
    with pytest.raises(ValueError, match="equal length"):
        importance_weights([1], [1, 2])


def test_score_fold_matches_python(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 3} common w{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    feats = with_feature_buckets(df, B)
    lam = importance_weights(bucket_counts(feats, B), [1] * B)
    got = {r["doc_id"]: r["dsir_score"]
           for r in with_dsir_score(feats, lam).collect()}
    exp = {r["doc_id"]: sum(lam[f] for f in r["feats"])
           for r in feats.collect()}
    assert got == exp


def test_select_deterministic_and_target_biased(spark):
    from otel_logger_spark.graftdata import load_corpus

    corpus = load_corpus(spark, SF)
    target = corpus.filter(F.col("lang") == "en")
    sel = dsir_select(corpus, target, k=50).select("doc_id", "dsir_score", "lang")
    rows1 = sel.collect()
    rows2 = dsir_select(corpus, target, k=50).select(
        "doc_id", "dsir_score", "lang").collect()
    assert rows1 == rows2 and len(rows1) == 50
    # selection should overrepresent the target language vs the corpus
    en_sel = sum(1 for r in rows1 if r["lang"] == "en") / len(rows1)
    n = corpus.count()
    en_all = target.count() / n
    assert en_sel > en_all


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.oracles_dsir import dsir_select_oracle
    from otel_logger_spark.queries_training import q_dsir_select

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql = dsir_select_oracle(f"{SF}/documents.parquet", k=100)
    exp = [tuple(r) for r in con.sql(sql).fetchall()]
    got = [tuple(r) for r in q_dsir_select(spark, SF).collect()]
    assert got == exp and len(got) == 100
