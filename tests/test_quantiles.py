"""Exact distributed quantiles (functions/quantiles.py): hand-math rank
semantics, NULL exclusion, grouped + global paths, convergence/round
bounds, shared-range coalescing, argument guards, big-value exactness
past float53, and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.quantiles import (
    exact_quantiles,
    exact_quantiles_sql,
)

SF = "/root/testdata/sf0.001"


def _vals(spark, xs, group=None):
    if group is None:
        return spark.createDataFrame([(x,) for x in xs], "v long")
    return spark.createDataFrame(list(zip(group, xs)), "g string, v long")


def _as_map(df, grouped=True):
    if grouped:
        return {(r["g"], r["q_milli"]): (r["value"], r["n"]) for r in df.collect()}
    return {r["q_milli"]: (r["value"], r["n"]) for r in df.collect()}


def test_hand_rank_semantics(spark):
    """n=4, values 10,20,30,40: p50 -> rank ceil(0.5*4)=2 -> 20;
    p990 -> rank ceil(0.99*4)=4 -> 40; p1 (q_milli=1) -> rank 1 -> 10."""
    df = _vals(spark, [40, 10, 30, 20])
    m = _as_map(exact_quantiles(df, "v", [1, 500, 990]), grouped=False)
    assert m[1] == (10, 4)
    assert m[500] == (20, 4)
    assert m[990] == (40, 4)


def test_nulls_excluded_and_duplicates(spark):
    df = spark.createDataFrame(
        [(None,), (5,), (5,), (5,), (9,)], "v long"
    )
    m = _as_map(exact_quantiles(df, "v", [500, 1000]), grouped=False)
    assert m[500] == (5, 4)      # rank 2 of [5,5,5,9]
    assert m[1000] == (9, 4)     # rank 4


def test_grouped_and_empty_group(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", None)],
        "g string, v long",
    )
    got = exact_quantiles(df, "v", [500], group_col="g")
    m = _as_map(got)
    assert m == {("a", 500): (2, 3)}   # all-NULL group emits no rows


def test_non_string_group_column(spark):
    """Round-7 advisor: the group column's dtype must survive the driver
    round trips — an int bucket id used to raise TypeError in
    createDataFrame (schema hardcoded `_g string`)."""
    df = spark.createDataFrame(
        [(0, 10), (0, 20), (0, 30), (7, 5)], "g int, v long"
    )
    got = exact_quantiles(df, "v", [500], group_col="g")
    assert got.schema["g"].dataType.simpleString() == "int"
    m = {(r["g"], r["q_milli"]): (r["value"], r["n"]) for r in got.collect()}
    assert m == {(0, 500): (20, 3), (7, 500): (5, 1)}


def test_convergence_rounds_bounded(spark):
    """Span 10^6 at 4096 buckets: round 1 narrows to width ceil(1e6/4096)
    =245, round 2 to width 1 -> <= 2 rounds. Identical values converge in
    zero rounds (lo == hi immediately)."""
    big = _vals(spark, list(range(0, 1_000_000, 997)))
    stats = {}
    exact_quantiles(big, "v", [500, 950], stats_out=stats)
    assert stats["rounds"] <= 2
    const = _vals(spark, [7, 7, 7])
    s2 = {}
    m = _as_map(exact_quantiles(const, "v", [500], stats_out=s2), grouped=False)
    assert m[500] == (7, 3) and s2["rounds"] == 0


def test_exact_past_float53(spark):
    """Values beyond 2^53 — a double-based bucket index would collapse
    neighbors; the integer path must distinguish them."""
    base = 2**60
    df = _vals(spark, [base + 1, base + 2, base + 3, base + 4, base + 5])
    m = _as_map(exact_quantiles(df, "v", [600]), grouped=False)
    assert m[600] == (base + 3, 5)   # rank ceil(0.6*5)=3


def test_argument_guards(spark):
    df = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [0])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [1001])
    with pytest.raises(ValueError):
        exact_quantiles(df, "v", [500], buckets=1)
    wide = _vals(spark, [-(2**62), 2**62])
    with pytest.raises(ValueError, match="2\\^62"):
        exact_quantiles(wide, "v", [500])


def test_oracle_parity_second_sf(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type",
        F.expr("CAST(floor(value * 1000000.0) AS BIGINT)").alias("vm"),
    )
    got = sorted(
        map(tuple, exact_quantiles(ev, "vm", [250, 500, 750, 999],
                                   group_col="event_type").collect())
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    sql = exact_quantiles_sql(
        "events", "CAST(floor(value * 1000000.0) AS BIGINT)",
        [250, 500, 750, 999], group_col="event_type",
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want
