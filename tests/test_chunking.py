"""Context-window chunking (functions/chunking.py, round 8): hand-
replayed chunk grammar, tail-never-dropped + conservation invariants,
parameter validation, zero-shuffle plan pin, and oracle parity at a
second SF."""

import duckdb
import pytest

from otel_logger_spark.functions.chunking import chunk_documents, chunk_report

SF = "/root/testdata/sf0.001"


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_hand_case_grammar(spark):
    """10 tokens, size 4, overlap 1 (stride 3): 1 + ceil(6/3) = 3
    windows at starts 1,4,7 — the last one reaches the final token
    (coverage is complete, no redundant extra window). A 9-token doc
    ends on a SHORT tail window instead: chunks [1-4],[4-7],[7-9]."""
    toks = [f"t{i}" for i in range(10)]
    got = sorted(
        (r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(_df(spark, [" ".join(toks)]), 4, 1).collect()
    )
    exp = [
        (0, 1, 4, "t0 t1 t2 t3"),
        (1, 4, 4, "t3 t4 t5 t6"),
        (2, 7, 4, "t6 t7 t8 t9"),
    ]
    assert got == exp

    short = sorted(
        (r["chunk_idx"], r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(
            _df(spark, [" ".join(toks[:9])]), 4, 1
        ).collect()
    )
    assert short == [
        (0, 1, 4, "t0 t1 t2 t3"),
        (1, 4, 4, "t3 t4 t5 t6"),
        (2, 7, 3, "t6 t7 t8"),
    ]


def test_short_doc_single_chunk_and_exact_fit(spark):
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(
            _df(spark, ["a b", "a b c d"]), 4, 1
        ).collect()
    }
    # n <= size: exactly one chunk, even at exact fit (no phantom tail)
    assert got == {
        (0, 0): (2, "a b"),
        (1, 0): (4, "a b c d"),
    }


def test_conservation_invariant_real_corpus(spark):
    """sum(chunk tokens) per doc == n + overlap * (n_chunks - 1): every
    token appears once plus one extra copy per overlapped boundary —
    a dropped tail or double-counted window breaks the identity."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ch = chunk_documents(docs, 24, 6)
    per_doc = ch.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("tok"),
        F.count(F.lit(1)).alias("nc"),
    )
    joined = per_doc.join(
        docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ),
        "doc_id",
    )
    bad = joined.filter(
        F.col("tok") != F.col("n") + 6 * (F.col("nc") - 1)
    ).count()
    assert bad == 0
    assert per_doc.count() == docs.count()  # no doc lost


def test_param_validation(spark):
    df = _df(spark, ["a"])
    with pytest.raises(ValueError, match="size"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, 4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, -1)


def test_zero_shuffle_plan(spark):
    """The chunker must stay a projection + explode: no Exchange in the
    physical plan reading a real table."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        chunk_documents(docs, 24, 6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_report_rollup(spark):
    rep = {
        r["lang"]: r
        for r in chunk_report(
            spark.read.parquet(f"{SF}/documents.parquet"), 24, 6
        ).collect()
    }
    assert len(rep) >= 2
    for r in rep.values():
        assert r["n_chunks"] >= r["n_docs"]
        assert r["n_full_chunks"] <= r["n_chunks"]
        assert r["max_chunks_per_doc"] >= 1


def test_gate_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_chunk_windows,
        q_chunk_windows,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = {tuple(r) for r in con.sql(_o_chunk_windows()).fetchall()}
    got = {tuple(r) for r in q_chunk_windows(spark, SF).collect()}
    assert got == exp
    assert len(got) > 800  # multiple chunks per doc on average
