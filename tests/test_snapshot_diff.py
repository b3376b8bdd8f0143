"""Snapshot diff (operators/diff.py): hand classification, carry-column
side selection, NULL encoding, digest-vs-values equality, argument
guards, the zero-exchange bucketed-generations plan, and oracle parity
at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark import io
from otel_logger_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_summary,
)
from otel_logger_spark.plans.audit import shape

SF = "/root/testdata/sf0.001"


def _old(spark):
    return spark.createDataFrame(
        [(1, "a", "s0"), (2, "b", "s0"), (3, "c", "s1"), (4, None, "s1")],
        "k long, v string, src string",
    )


def _new(spark):
    # 1 unchanged; 2 changed; 3 removed; 4 NULL->'' (changed); 5 added
    return spark.createDataFrame(
        [(1, "a", "s0"), (2, "B", "s0"), (4, "", "s1"), (5, "e", "s9")],
        "k long, v string, src string",
    )


def test_hand_classification_and_carry_side(spark):
    d = snapshot_diff(
        _old(spark), _new(spark), ["k"], compare_cols=["v"],
        carry_cols=["src"], include_unchanged=True,
    )
    rows = {r["k"]: (r["status"], r["src"]) for r in d.collect()}
    assert rows == {
        1: ("unchanged", "s0"),
        2: ("changed", "s0"),
        3: ("removed", "s1"),   # carry falls back to the old side
        4: ("changed", "s1"),   # NULL -> '' is a change, not a match
        5: ("added", "s9"),
    }


def test_default_excludes_unchanged_and_summary_counts(spark):
    d = snapshot_diff(_old(spark), _new(spark), ["k"], compare_cols=["v"])
    assert sorted(r["k"] for r in d.collect()) == [2, 3, 4, 5]
    s = snapshot_diff_summary(_old(spark), _new(spark), ["k"],
                              compare_cols=["v"])
    counts = {r["status"]: r["n_rows"] for r in s.collect()}
    assert counts == {"unchanged": 1, "changed": 2, "removed": 1, "added": 1}


def test_values_mode_equals_digest_mode(spark):
    old = spark.read.parquet(f"{SF}/documents.parquet")
    new = old.filter(F.col("doc_id") % 7 != 0).withColumn(
        "lang", F.when(F.col("doc_id") % 5 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
    )
    kw = dict(compare_cols=["text", "lang"], include_unchanged=True)
    a = sorted(map(tuple, snapshot_diff(old, new, ["doc_id"], **kw).collect()))
    b = sorted(map(tuple, snapshot_diff(old, new, ["doc_id"],
                                        digest=False, **kw).collect()))
    assert a == b


def test_missing_column_guard(spark):
    with pytest.raises(ValueError, match="absent"):
        snapshot_diff(_old(spark), _new(spark).drop("v"), ["k"],
                      compare_cols=["v"])


def test_bucketed_generations_diff_is_exchange_free(spark):
    """Two generations bucketed on the key diff with ZERO exchanges —
    the per-bucket local merge the module docstring promises."""
    old = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") % 9).cast("string").alias("v")
    )
    new = old.filter(F.col("k") % 13 != 0).withColumn(
        "v", F.when(F.col("k") % 11 == 0, F.lit("zz")).otherwise(F.col("v"))
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        io.write_bucketed(old, "t_diff_old", ["k"], 8)
        io.write_bucketed(new, "t_diff_new", ["k"], 8)
        d = snapshot_diff(
            spark.table("t_diff_old"), spark.table("t_diff_new"),
            ["k"], compare_cols=["v"], include_unchanged=True,
        )
        s = shape(d)
        assert s["exchanges"] == 0, s
        counts = {r["status"]: 1 for r in d.collect()}
        assert set(counts) == {"unchanged", "changed", "removed"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_diff_old")
        spark.sql("DROP TABLE IF EXISTS t_diff_new")


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_snapshot_diff,
        q_snapshot_diff,
    )

    got = sorted(map(tuple, q_snapshot_diff(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_snapshot_diff()).fetchall()))
    assert got == want
