"""As-of join operator: semantics vs pandas merge_asof (the de-facto
reference implementation), tie inclusivity, forward direction, tolerance,
and the one-shuffle plan shape."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.asof import asof_join


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_matches_merge_asof(spark):
    rng = np.random.RandomState(11)
    n_l, n_r = 400, 120
    lpdf = pd.DataFrame({
        "k": rng.randint(0, 8, n_l),
        "t": rng.randint(0, 1000, n_l).astype("int64"),
        "lv": np.arange(n_l, dtype="int64"),
    })
    rpdf = pd.DataFrame({
        "k": rng.randint(0, 8, n_r),
        "t": rng.randint(0, 1000, n_r).astype("int64"),
        "rv": np.arange(n_r, dtype="int64") * 10,
    }).drop_duplicates(["k", "t"])  # the uniqueness contract

    left = _mk(spark, lpdf.to_dict("records"), "k long, t long, lv long")
    right = _mk(spark, rpdf.to_dict("records"), "k long, t long, rv long")
    got = (
        asof_join(left, right, on="t", by=["k"])
        .select("k", "t", "lv", "rv", "t_r")
        .toPandas()
        .sort_values(["lv", "k", "t"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k",
        direction="backward",
    ).sort_values(["lv", "k", "t"]).reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_forward_and_tolerance_match_merge_asof(spark):
    rng = np.random.RandomState(5)
    lpdf = pd.DataFrame({
        "k": rng.randint(0, 5, 300),
        "t": rng.randint(0, 500, 300).astype("int64"),
        "lv": np.arange(300, dtype="int64"),
    })
    rpdf = pd.DataFrame({
        "k": rng.randint(0, 5, 80),
        "t": rng.randint(0, 500, 80).astype("int64"),
        "rv": np.arange(80, dtype="int64"),
    }).drop_duplicates(["k", "t"])
    left = _mk(spark, lpdf.to_dict("records"), "k long, t long, lv long")
    right = _mk(spark, rpdf.to_dict("records"), "k long, t long, rv long")
    got = (
        asof_join(left, right, on="t", by=["k"], direction="forward")
        .select("lv", "rv")
        .toPandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k",
        direction="forward",
    ).sort_values("lv").reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_tie_is_inclusive_and_tolerance_nulls(spark):
    from datetime import datetime

    left = _mk(
        spark,
        [("u", datetime(2024, 1, 1, 0, 10, 0), 1),
         ("u", datetime(2024, 1, 1, 1, 0, 0), 2)],
        "k string, ts timestamp, lv int",
    )
    right = _mk(
        spark,
        [("u", datetime(2024, 1, 1, 0, 10, 0), 100)],
        "k string, ts timestamp, rv int",
    )
    # tie: a right row AT the left instant matches (merge_asof semantics)
    out = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert out == {1: 100, 2: 100}
    # tolerance: the 50-minute-stale match is nulled, the tie survives
    out_tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance_ms=60_000
        ).collect()
    }
    assert out_tol == {1: 100, 2: None}


def test_asof_unmatched_left_rows_kept(spark):
    left = _mk(spark, [("a", 5, 1), ("b", 5, 2)], "k string, t long, lv int")
    right = _mk(spark, [("a", 9, 7)], "k string, t long, rv int")
    rows = {r["lv"]: (r["rv"], r["t_r"]) for r in asof_join(
        left, right, on="t", by=["k"]).collect()}
    assert rows == {1: (None, None), 2: (None, None)}  # nothing at-or-before
    fwd = {r["lv"]: r["rv"] for r in asof_join(
        left, right, on="t", by=["k"], direction="forward").collect()}
    assert fwd == {1: 7, 2: None}


def test_asof_multi_column_by_key(spark):
    rng = np.random.RandomState(17)
    lpdf = pd.DataFrame({
        "k1": rng.randint(0, 3, 200),
        "k2": rng.choice(["x", "y"], 200),
        "t": rng.randint(0, 300, 200).astype("int64"),
        "lv": np.arange(200, dtype="int64"),
    })
    rpdf = pd.DataFrame({
        "k1": rng.randint(0, 3, 50),
        "k2": rng.choice(["x", "y"], 50),
        "t": rng.randint(0, 300, 50).astype("int64"),
        "rv": np.arange(50, dtype="int64"),
    }).drop_duplicates(["k1", "k2", "t"])
    left = _mk(spark, lpdf.to_dict("records"), "k1 long, k2 string, t long, lv long")
    right = _mk(spark, rpdf.to_dict("records"), "k1 long, k2 string, t long, rv long")
    got = (
        asof_join(left, right, on="t", by=["k1", "k2"])
        .select("lv", "rv").toPandas().sort_values("lv").reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("t"), rpdf.sort_values("t"), on="t",
        by=["k1", "k2"], direction="backward",
    ).sort_values("lv").reset_index(drop=True)
    assert list(got["rv"].fillna(-1)) == list(exp["rv"].fillna(-1))


def test_asof_empty_right_side(spark):
    left = _mk(spark, [("a", 5, 1), ("b", 9, 2)], "k string, t long, lv int")
    right = _mk(spark, [], "k string, t long, rv int")
    rows = asof_join(left, right, on="t", by=["k"]).collect()
    assert sorted(r["lv"] for r in rows) == [1, 2]
    assert all(r["rv"] is None and r["t_r"] is None for r in rows)


def test_asof_bad_direction_raises(spark):
    left = _mk(spark, [("a", 1, 1)], "k string, t long, lv int")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="t", by=["k"], direction="nearest")


def test_asof_single_exchange_plan(spark):
    """Scale shape: ONE shuffle (on the by key) total — the union sides
    feed the same window partitioning; no join operator, no cross
    product."""
    left = _mk(spark, [("a", 1, 1)], "k string, t long, lv int")
    right = _mk(spark, [("a", 1, 2)], "k string, t long, rv int")
    plan = (
        asof_join(left, right, on="t", by=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_asof_internal_name_collisions_raise(spark):
    """Round-5 guard (ADVICE r04): left columns named `_side` or colliding
    with an output carry name (on+suffix / suffixed right value) must fail
    loudly instead of producing ambiguous columns."""
    right = spark.createDataFrame([(1, 10, "a")], "user_id long, ts long, v string")
    for lschema in (
        "user_id long, ts long, _side long",
        "user_id long, ts long, ts_r long",
        "user_id long, ts long, v string, v_r string",
    ):
        left = spark.createDataFrame([], lschema)
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right, on="ts", by=["user_id"])


def test_asof_suffixed_right_self_collision_raises(spark):
    """Right columns that collide with each other AFTER suffixing (right
    has v and v_r while left has v) also fail loudly."""
    left = spark.createDataFrame([(1, 10, "l")], "user_id long, ts long, v string")
    right = spark.createDataFrame(
        [(1, 5, "a", "b")], "user_id long, ts long, v string, v_r string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="ts", by=["user_id"])
