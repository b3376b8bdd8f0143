"""Funnel analysis (operators/funnel.py): hand conversion cases (order
matters, gap bound, greedy semantics, simultaneous-event tiebreak),
monotone prefix counts, guards, and oracle parity at a second SF."""

from datetime import datetime, timedelta

import duckdb
import pytest

from otel_logger_spark.operators.funnel import funnel_counts

SF = "/root/testdata/sf0.001"
T0 = datetime(2026, 3, 1, 12, 0, 0)

STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )


def _counts(spark, rows, **kw):
    df = funnel_counts(_ev(spark, rows), STEPS, **kw)
    return {r["step"]: r["n_users"] for r in df.collect()}


def test_order_matters_and_full_conversion(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = [
        # u1 converts fully, in order
        (1, "view", T0), (1, "click", T0 + timedelta(hours=1)),
        (1, "purchase", T0 + timedelta(hours=2)),
        # u2 purchases BEFORE clicking: reaches view only... then clicks
        # later with no further purchase -> stops at click
        (2, "view", T0), (2, "purchase", T0 + timedelta(minutes=5)),
        (2, "click", T0 + timedelta(minutes=10)),
        # u3 never views
        (3, "click", T0), (3, "purchase", T0 + timedelta(hours=1)),
    ]
    c = _counts(spark, rows)
    assert c == {"view": 2, "click": 2, "purchase": 1}


def test_gap_bound_blocks_late_steps(spark):
    rows = [
        (1, "view", T0), (1, "click", T0 + timedelta(days=2)),  # too late
        (2, "view", T0), (2, "click", T0 + timedelta(hours=23)),
        (2, "purchase", T0 + timedelta(hours=23, minutes=30)),
    ]
    c = _counts(spark, rows, max_gap_seconds=86400)
    assert c == {"view": 2, "click": 1, "purchase": 1}


def test_greedy_takes_earliest_match(spark):
    """The first click fixes the gap reference: the later purchase is
    measured from the EARLY click (greedy), not the late one, so it
    exceeds the gap even though a non-greedy assignment would pass."""
    rows = [
        (1, "view", T0),
        (1, "click", T0 + timedelta(hours=1)),       # greedy match
        (1, "click", T0 + timedelta(hours=30)),      # ignored
        (1, "purchase", T0 + timedelta(hours=40)),   # 39h after match
    ]
    c = _counts(spark, rows, max_gap_seconds=86400)
    assert c == {"view": 1, "click": 1, "purchase": 0}


def test_guards(spark):
    df = _ev(spark, [(1, "view", T0)])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(df, [])
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(df, ["view", "view"])
    with pytest.raises(ValueError, match="max_gap"):
        funnel_counts(df, ["view"], max_gap_seconds=-1)


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_extra import _o_funnel, q_funnel

    got = sorted(map(tuple, q_funnel(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_funnel()).fetchall()))
    assert got == want
