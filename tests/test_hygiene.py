"""Composed hygiene manifest (functions/hygiene.py, round 8): hand-
crafted docs tripping each rule, the one-traversal plan pin (zero
exchanges in the per-doc manifest), accounting invariants, and gate
oracle parity at a second SF."""

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.hygiene import hygiene_manifest, hygiene_report
from otel_logger_spark.functions.lmscore import nll_table

SF = "/root/testdata/sf0.001"


_VOCAB = (
    "good text alpha beta gamma delta epsilon zeta eta theta iota kappa"
).split()


def _tab():
    # uniform reference: every vocab word equally likely, so every
    # in-vocab token costs the same nll and OOV costs strictly more
    return nll_table([(w, 10) for w in _VOCAB])


def test_hand_case_each_rule_fires(spark):
    tab, oov = _tab()
    in_vocab_nll = tab["good"]
    rows = [
        # fluent, clean, varied (12 distinct in-vocab tokens) -> kept
        (1, "en", " ".join(_VOCAB)),
        # heavy bigram repetition AND all-OOV -> rep_flag + fluency_flag
        (2, "en", ("spam ham " * 12).strip()),
        # few tokens -> quality length rule fails (n_tokens < 10)
        (3, "en", "good text good"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r
        for r in hygiene_manifest(
            df, tab, oov,
            quality_min_milli=500,
            nll_max_micro=in_vocab_nll + 1,
            rep_thresholds_milli={
                "dup_line_milli": 300,
                "top_bigram_milli": 400,
                "dup_5gram_milli": 150,
            },
        ).collect()
    }
    assert got[1]["keep"] and not any(
        got[1][c] for c in ("rep_flag", "quality_flag", "fluency_flag")
    )
    # doc 2: 'spam ham' bigram dominates AND spam/ham are OOV
    assert got[2]["rep_flag"] and got[2]["fluency_flag"]
    assert not got[2]["keep"]
    # doc 3: 3 tokens -> misses the 400-point length band
    assert got[3]["quality_flag"] and not got[3]["keep"]


def test_manifest_single_traversal_plan(spark):
    """The per-doc manifest must be a pure projection chain: zero
    Exchange on a natural-split read (N rules compose in ONE pass)."""
    tab, oov = _tab()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        hygiene_manifest(docs, tab, oov, 650, 5_600_000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    # exactly one parquet scan: the rules share the traversal
    assert plan.count("Scan parquet") == 1


def test_report_accounting_invariants(spark):
    tab, oov = _tab()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rep = hygiene_report(docs, tab, oov, 650, 5_600_000).collect()
    assert len(rep) >= 2
    for r in rep:
        assert r["n_kept"] >= r["n_docs"] - (
            r["n_rep"] + r["n_quality"] + r["n_fluency"]
        )
        assert 0 <= r["n_kept"] <= r["n_docs"]


def test_gate_oracle_parity_second_sf(spark, monkeypatch):
    import os

    from otel_logger_spark.queries_training import (
        _o_hygiene_manifest,
        q_hygiene_manifest,
    )

    monkeypatch.setitem(os.environ, "SPARK_GRAFT_ORACLE_SF_DIR", SF)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = {tuple(r) for r in con.sql(_o_hygiene_manifest()).fetchall()}
    got = {tuple(r) for r in q_hygiene_manifest(spark, SF).collect()}
    assert got == exp
    # live accounting: every rule fires somewhere, and docs survive
    assert any(t[2] > 0 for t in got)
    assert any(t[3] > 0 for t in got)
    assert any(t[4] > 0 for t in got)
    assert all(t[5] > 0 for t in got)
