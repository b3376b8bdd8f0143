"""Token-budget mix allocation (functions/mixer.py): hand budget/rate
math, binding-source saturation, explicit-budget mode, the no-silent-
caps guard matrix, deterministic apply, and gate parity at a second
SF."""

import duckdb
import pytest

from otel_logger_spark.functions.mixer import (
    apply_token_mix,
    plan_token_mix,
    token_mix_report,
)

SF = "/root/testdata/sf0.001"


def test_hand_budget_and_rates():
    """tokens {a:1000, b:500}, targets {a:600, b:400}: feasible budget =
    min(1000*1000//600, 500*1000//400) = 1250 (b binds); desired a=750
    b=500; rates a=750 b=1000 (the binding source saturates exactly)."""
    plan = plan_token_mix({"a": 1000, "b": 500}, {"a": 600, "b": 400})
    assert plan["budget"] == 1250
    assert plan["desired"] == {"a": 750, "b": 500}
    assert plan["rates_milli"] == {"a": 750, "b": 1000}


def test_explicit_budget_mode():
    plan = plan_token_mix({"a": 1000, "b": 500}, {"a": 600, "b": 400},
                          budget_tokens=625)
    assert plan["rates_milli"] == {"a": 375, "b": 500}


def test_guard_matrix():
    with pytest.raises(ValueError, match="sum"):
        plan_token_mix({"a": 10}, {"a": 700, "b": 400})
    with pytest.raises(ValueError, match="positive"):
        plan_token_mix({"a": 10}, {"a": 0})
    with pytest.raises(ValueError, match="missing or empty"):
        plan_token_mix({"a": 10}, {"a": 500, "ghost": 500})
    with pytest.raises(ValueError, match="infeasible"):
        plan_token_mix({"a": 1000, "b": 500}, {"a": 600, "b": 400},
                       budget_tokens=1251)


def test_apply_deterministic_and_drops_untargeted(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "zzz") for i in range(200)],
        "doc_id long, source string",
    )
    kept1 = sorted(r["doc_id"] for r in
                   apply_token_mix(df, {"a": 500}).collect())
    kept2 = sorted(r["doc_id"] for r in
                   apply_token_mix(df, {"a": 500}).collect())
    assert kept1 == kept2                      # no rand() anywhere
    assert all(i % 2 for i in kept1)           # 'zzz' fully dropped
    assert 0 < len(kept1) < 100


def test_report_accounting_consistency(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = token_mix_report(
        docs, {"src0": 400, "src1": 300, "src2": 200, "src3": 100}
    ).collect()
    by = {r["source"]: r for r in rows}
    assert set(by) == {"src0", "src1", "src2", "src3"}
    for r in rows:
        assert 0 <= r["rate_milli"] <= 1000
        assert r["tokens_kept"] <= r["tokens_total"]
    # the binding source sits at/next to saturation (double flooring in
    # budget -> desired -> rate can shave one milli off the exact 1000)
    assert any(r["rate_milli"] >= 999 for r in rows)


def test_gate_parity_second_sf(spark):
    from otel_logger_spark.queries_training import _o_token_mix, q_token_mix

    got = sorted(map(tuple, q_token_mix(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_token_mix()).fetchall()))
    assert got == want
