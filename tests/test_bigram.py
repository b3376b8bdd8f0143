"""Bigram stupid-backoff fluency (functions/bigram.py, round 8): hand
replay of the scoring rule, literal-vs-join regime bit-parity, the big-B
structural pin (no literal maps in the plan), reference-table total
order, edge docs, and oracle parity at a second SF."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.bigram import (
    BACKOFF_ALPHA,
    backoff_nll,
    bigram_fluency_report,
    bigram_nll_table,
    reference_bigram_counts,
    with_bigram_score,
)
from otel_logger_spark.functions.lmscore import nll_table, reference_counts

SF = "/root/testdata/sf0.001"


def _score_by_hand(tokens, uni_tab, oov, bi_tab, bo):
    total = uni_tab.get(tokens[0], oov)
    for prev, tok in zip(tokens, tokens[1:]):
        pair = f"{prev} {tok}"
        if pair in bi_tab:
            total += bi_tab[pair]
        else:
            total += bo + uni_tab.get(tok, oov)
    return total // len(tokens)


def test_hand_case_backoff_rule(spark):
    """Known tables, mixed doc: first token unigram, one seen bigram,
    one backoff transition, one OOV backoff — each replayed by hand."""
    uni_counts = [("a", 6), ("b", 3)]
    uni_tab, oov = nll_table(uni_counts)
    bi_tab = bigram_nll_table([("a b", 2)], uni_counts)
    bo = backoff_nll()
    assert bi_tab["a b"] == round(1_000_000 * -math.log(2 / 6))
    assert bo == round(1_000_000 * -math.log(BACKOFF_ALPHA))

    df = spark.createDataFrame(
        [(1, "a b a zzz")], "doc_id long, text string"
    )
    got = with_bigram_score(df, uni_tab, oov, bi_tab).collect()[0][
        "mean_nll_micro"
    ]
    # a (uni) | a b (bigram) | b a (backoff+uni a) | a zzz (backoff+oov)
    exp = (
        uni_tab["a"]
        + bi_tab["a b"]
        + bo + uni_tab["a"]
        + bo + oov
    ) // 4
    assert got == exp
    assert got == _score_by_hand(
        "a b a zzz".split(), uni_tab, oov, bi_tab, bo
    )


def test_single_token_and_empty_bigram_table(spark):
    uni_counts = [("a", 4)]
    uni_tab, oov = nll_table(uni_counts)
    df = spark.createDataFrame(
        [(1, "a"), (2, "zzz"), (3, "a a")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["mean_nll_micro"]
        for r in with_bigram_score(df, uni_tab, oov, {}).collect()
    }
    bo = backoff_nll()
    assert got[1] == uni_tab["a"]
    assert got[2] == oov
    assert got[3] == (uni_tab["a"] + bo + uni_tab["a"]) // 2


def test_join_regime_matches_literal_regime(spark):
    """Both regimes must produce bit-identical per-doc scores over the
    real corpus (integer sums are order-independent)."""
    from otel_logger_spark.graftdata import load_corpus

    corpus = load_corpus(spark, SF)
    ref = corpus.filter(F.col("lang") == "en")
    uni_counts = reference_counts(ref, 16)
    uni_tab, oov = nll_table(uni_counts)
    bi_tab = bigram_nll_table(
        reference_bigram_counts(ref, uni_counts, 64), uni_counts
    )
    lit = {
        r["doc_id"]: r["mean_nll_micro"]
        for r in with_bigram_score(
            corpus, uni_tab, oov, bi_tab
        ).select("doc_id", "mean_nll_micro").collect()
    }
    join = {
        r["doc_id"]: r["mean_nll_micro"]
        for r in with_bigram_score(
            corpus, uni_tab, oov, bi_tab, id_col="doc_id",
            max_literal_k=0,
        ).collect()
    }
    assert lit == join and len(lit) > 100


def test_big_b_structural_plan(spark):
    """A web-scale bigram table is 10^5+ rows: above max_literal_k the
    plan must be broadcast joins with NO table literals (the lmscore
    K=50,000 discipline)."""
    import time

    K, B = 1000, 50_000
    uni_counts = [(f"tok{i:04d}", (i % 9) + 1) for i in range(K)]
    uni_tab, oov = nll_table(uni_counts)
    bi_tab = {
        f"tok{i // K:04d} tok{i % K:04d}": 100 + i for i in range(B)
    }
    assert len(bi_tab) == B and "tok0000 tok0001" in bi_tab
    df = spark.createDataFrame(
        [(1, "tok0000 tok0001 UNSEEN"), (2, "UNSEEN")],
        "doc_id long, text string",
    )
    t0 = time.monotonic()
    scored = with_bigram_score(
        df, uni_tab, oov, bi_tab, id_col="doc_id"
    )
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "tok0025 tok0500" not in plan  # no B-literal map in the plan
    got = {r["doc_id"]: r["mean_nll_micro"] for r in scored.collect()}
    wall = time.monotonic() - t0
    bo = backoff_nll()
    assert got[1] == (
        uni_tab["tok0000"] + bi_tab["tok0000 tok0001"] + bo + oov
    ) // 3
    assert got[2] == oov
    physical = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical
    assert wall < 60, f"B=50k scoring took {wall:.1f}s"


def test_literal_regime_requires_id_col_above_cap(spark):
    uni_tab, oov = nll_table([("a", 1)])
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_literal_k"):
        with_bigram_score(df, uni_tab, oov, {"a a": 1}, max_literal_k=0)


def test_bigram_counts_total_order_and_vocab_filter(spark):
    """Ties break on pair ASC; pairs with an out-of-vocab side are
    excluded before the top-B cut."""
    rows = [(i, t) for i, t in enumerate(
        ["x y", "x y", "y x", "y x", "x q y"]  # q is out-of-vocab
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uni_counts = [("x", 3), ("y", 3)]
    got = reference_bigram_counts(df, uni_counts, 10)
    assert got == [("x y", 2), ("y x", 2)]  # count tie -> 'x y' first


def test_gate_oracle_parity_second_sf(spark, monkeypatch):
    import os

    from otel_logger_spark.queries_training import (
        _o_bigram_fluency,
        q_bigram_fluency,
    )

    monkeypatch.setitem(os.environ, "SPARK_GRAFT_ORACLE_SF_DIR", SF)
    sql = _o_bigram_fluency()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = {tuple(r) for r in con.sql(sql).fetchall()}
    got = {tuple(r) for r in q_bigram_fluency(spark, SF).collect()}
    assert got == exp
    # a real cut: some docs fluent, some not, per multiple groups
    assert any(t[2] > 0 for t in got) and any(t[2] < t[1] for t in got)
