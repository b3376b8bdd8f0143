"""Count-min sketch (functions/cms.py): one-sided overcount guarantee,
collision-free exactness at wide w, the cell-wise merge law, never-seen
keys, heavy-hitter superset property, argument guards, NULL exclusion,
and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.cms import (
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
    cms_sketch,
)

SF = "/root/testdata/sf0.001"


def _keys(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "k string")


def _est_map(spark, xs, d=4, w=512):
    df = _keys(spark, xs)
    sk = cms_sketch(df, "k", d, w)
    return {
        r["k"]: r["est"]
        for r in cms_estimate(sk, df, "k", d, w).collect()
    }


def test_overcount_guarantee_and_exact_at_wide_w(spark):
    xs = ["a"] * 5 + ["b"] * 3 + ["c"]
    m = _est_map(spark, xs)
    assert m["a"] >= 5 and m["b"] >= 3 and m["c"] >= 1
    # w=65536 with 3 keys: collisions across 4 rows all landing together
    # are (3 choose 2)*4/65536-unlikely; exactness is the expected case
    m2 = _est_map(spark, xs, d=4, w=65536)
    assert m2 == {"a": 5, "b": 3, "c": 1}


def test_row_sums_equal_n(spark):
    """Every sketch row partitions the input: its cell counts sum to N."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n = ev.count()
    sk = cms_sketch(ev.select(F.col("event_type").alias("k")), "k")
    sums = {r["row"]: r["s"] for r in
            sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()}
    assert set(sums) == {0, 1, 2, 3} and all(v == n for v in sums.values())


def test_merge_law_exact(spark):
    a = _keys(spark, ["a", "a", "b", "x"])
    b = _keys(spark, ["a", "c", "x", "x"])
    both = a.unionByName(b)
    merged = sorted(map(tuple, cms_merge(
        cms_sketch(a, "k"), cms_sketch(b, "k")).collect()))
    direct = sorted(map(tuple, cms_sketch(both, "k").collect()))
    assert merged == direct


def test_never_seen_key_and_null_exclusion(spark):
    data = _keys(spark, ["a", "a", "b"])
    sk = cms_sketch(data.unionByName(_keys(spark, [None])), "k")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, _keys(spark, ["zzz-unseen", None]),
                              "k", w=512).collect()
    }
    assert list(est) == ["zzz-unseen"]      # NULL candidate dropped
    assert est["zzz-unseen"] >= 0            # one-sided: never negative
    # NULL input rows contribute to no cell
    total = sum(r["cnt"] for r in sk.filter("row = 0").collect())
    assert total == 3


def test_heavy_hitters_superset(spark):
    xs = ["hot"] * 50 + [f"cold{i}" for i in range(30)]
    hh = {r["k"] for r in
          cms_heavy_hitters(_keys(spark, xs), "k", threshold=50).collect()}
    assert "hot" in hh   # a true heavy hitter is never missed


def test_skew_advisor_never_misses_hot_key(spark):
    """'hot' has 60 true rows; at rows_per_task=20 it MUST be reported
    (one-sided estimate) with salt >= ceil(60/20)=3; the 40 singleton
    cold keys stay below threshold at wide w."""
    from otel_logger_spark.functions.cms import skew_advisor

    xs = ["hot"] * 60 + [f"c{i}" for i in range(40)]
    rep = {r["k"]: (r["est"], r["salt"]) for r in
           skew_advisor(_keys(spark, xs), "k", rows_per_task=20,
                        w=65536).collect()}
    assert "hot" in rep
    est, salt = rep["hot"]
    assert est >= 60 and salt >= 3
    assert all(k == "hot" for k in rep), rep   # no cold keys at wide w
    import pytest as _pytest
    with _pytest.raises(ValueError, match="rows_per_task"):
        skew_advisor(_keys(spark, xs), "k", rows_per_task=0)


def test_skew_advisor_salt_is_true_ceiling(spark):
    """Non-divisible case (round-7 advisor): 61 rows at rows_per_task=20
    needs salt=ceil(61/20)=4 so every split stays <= rows_per_task; the
    old -(-est div N) floor form gave 3 (splits of ~20.3 > 20). CMS at
    wide w estimates exactly, so est==61 here and the assertion is
    exact."""
    from otel_logger_spark.functions.cms import skew_advisor

    xs = ["hot"] * 61 + [f"c{i}" for i in range(40)]
    rep = {r["k"]: (r["est"], r["salt"]) for r in
           skew_advisor(_keys(spark, xs), "k", rows_per_task=20,
                        w=65536).collect()}
    est, salt = rep["hot"]
    assert est == 61 and salt == 4
    # boundary: est just past one task (21/20) must split in two
    xs2 = ["warm"] * 21 + [f"d{i}" for i in range(10)]
    rep2 = {r["k"]: r["salt"] for r in
            skew_advisor(_keys(spark, xs2), "k", rows_per_task=20,
                         w=65536).collect()}
    assert rep2.get("warm") == 2


def test_argument_guards(spark):
    df = _keys(spark, ["a"])
    with pytest.raises(ValueError, match="power of two"):
        cms_sketch(df, "k", w=500)
    with pytest.raises(ValueError, match="power of two"):
        cms_sketch(df, "k", w=1)
    with pytest.raises(ValueError, match="d must"):
        cms_sketch(df, "k", d=0)


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_extra import _o_cms_counts, q_cms_counts

    got = sorted(map(tuple, q_cms_counts(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_cms_counts()).fetchall()))
    assert got == want
