"""Vocabulary + OOV coverage (functions/vocab.py): top-k total order,
per-doc OOV counts, report arithmetic, plan shape (broadcast probe),
and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.vocab import (
    oov_report,
    vocab_topk,
    with_oov_stats,
)

SF = "/root/testdata/sf0.001"


def test_vocab_topk_total_order(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c c z"), (2, "a")], "doc_id long, text string"
    )
    # counts: a=3 b=3 c=2 z=1 -> top-3 = a,b (ties by tok ASC), then c
    got = [(r["tok"], r["cnt"]) for r in vocab_topk(df, 3).collect()]
    assert got == [("a", 3), ("b", 3), ("c", 2)]
    with pytest.raises(ValueError, match="positive"):
        vocab_topk(df, 0)


def test_oov_stats_per_doc(spark):
    df = spark.createDataFrame(
        [(1, "a a b q"), (2, "q r")], "doc_id long, text string"
    )
    vocab = vocab_topk(df, 2)  # a(2), q(2) -> ties: a,q
    rows = {r["doc_id"]: (r["n_tokens"], r["n_oov"])
            for r in with_oov_stats(df, vocab).collect()}
    assert rows == {1: (4, 1), 2: (2, 1)}


def test_report_milli_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, "x", "a a a"), (2, "x", "a b c")],
        "doc_id long, lang string, text string",
    )
    r = oov_report(df, k=1).collect()[0]  # vocab = {a}
    assert (r["lang"], r["n_docs"], r["sum_tokens"], r["sum_oov"]) == ("x", 2, 6, 2)
    assert r["oov_milli"] == (1000 * 2) // 6


def test_broadcast_probe_plan(spark):
    """The vocab probe must be a broadcast join — an exchange of the
    exploded token stream would be the 100 TB failure mode."""
    from otel_logger_spark.graftdata import load_corpus

    plan = oov_report(load_corpus(spark, SF), k=64)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import O_VOCAB_OOV, q_vocab_oov

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(O_VOCAB_OOV).fetchall()}
    got = {tuple(r) for r in q_vocab_oov(spark, SF).collect()}
    assert got == exp and len(got) >= 3
