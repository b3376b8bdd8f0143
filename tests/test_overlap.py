"""Cross-source shingle overlap (functions/overlap.py): hand-checked
set arithmetic, short-doc guard, symmetry/completeness, and oracle
parity at a second SF."""

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.overlap import (
    source_overlap_report,
    source_shingles,
)

SF = "/root/testdata/sf0.001"


def test_hand_case(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "a b c d"),      # shingles: "a b c", "b c d"
            (2, "s1", "a b c"),        # "a b c" (dup within source)
            (3, "s2", "a b c x"),      # "a b c", "b c x"
            (4, "s3", "z z"),          # too short: no shingles
        ],
        "doc_id long, source string, text string",
    )
    sh = {(r["source"], r["shingle"]) for r in source_shingles(df).collect()}
    assert sh == {("s1", "a b c"), ("s1", "b c d"),
                  ("s2", "a b c"), ("s2", "b c x")}
    rows = source_overlap_report(df).collect()
    assert len(rows) == 1  # only (s1, s2) share anything; s3 empty
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (2, 2, 1)
    assert r["j_milli"] == (1000 * 1) // 3


def test_pairs_ordered_and_no_self(spark):
    from otel_logger_spark.graftdata import load_corpus

    rows = source_overlap_report(load_corpus(spark, SF)).collect()
    assert rows, "synthetic sources share the 31-token pool heavily"
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["n_common"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["j_milli"] <= 1000


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        O_SOURCE_OVERLAP,
        q_source_overlap,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(O_SOURCE_OVERLAP).fetchall()}
    got = {
        (r["source_a"], r["source_b"], r["n_a"], r["n_b"],
         r["n_common"], r["j_milli"])
        for r in q_source_overlap(spark, SF).collect()
    }
    assert got == exp and len(got) > 0
