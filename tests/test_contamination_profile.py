"""Contamination-severity histogram (decontam.contamination_profile):
hand-checked deciles incl. short docs and the use_hash null guard, plus
oracle parity at a second SF."""

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.decontam import contamination_profile

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_hand_deciles(spark):
    bench = _df(spark, [(100, "b", "a b c")])
    docs = _df(
        spark,
        [
            (1, "s", "a b c x"),   # grams: "a b c","b c x" -> 1/2 hit = decile 5
            (2, "s", "a b c"),     # 1/1 -> decile 10
            (3, "s", "x y z q"),   # 0/2 -> decile 0
            (4, "s", "x y"),       # < n words -> decile 0 (explode_outer row)
        ],
    )
    got = {
        (r["source"], r["decile"]): r["n_docs"]
        for r in contamination_profile(docs, bench, n=3).collect()
    }
    assert got == {("s", 5): 1, ("s", 10): 1, ("s", 0): 2}


def test_hash_mode_matches_string_mode(spark):
    bench = _df(spark, [(100, "b", "a b c d e")])
    docs = _df(
        spark,
        [(i, f"s{i % 2}", t) for i, t in enumerate(
            ["a b c d e f", "f e d c b a", "a b", "a b c d e"])],
    )
    s = {tuple(r) for r in contamination_profile(docs, bench, n=5).collect()}
    h = {tuple(r) for r in
         contamination_profile(docs, bench, n=5, use_hash=True).collect()}
    assert s == h


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_contamination_profile,
        q_contamination_profile,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(_o_contamination_profile()).fetchall()}
    got = {
        (r["source"], r["decile"], r["n_docs"])
        for r in q_contamination_profile(spark, SF).collect()
    }
    assert got == exp and len(got) > 0
