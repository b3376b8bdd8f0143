"""Text normalization (functions/normalize.py): hand cases including
non-ASCII preservation, Spark<->DuckDB chain parity on adversarial
strings, the normalized-dedup drop form, and gate parity at a second
SF."""

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.normalize import (
    drop_normalized_dupes,
    normalize_expr,
    normalize_sql,
    with_normalized,
)

SF = "/root/testdata/sf0.001"

CASES = [
    ("Hello,   WORLD!!", "hello world"),
    ("  a\tb\nc  ", "a b c"),
    ("key=value; x<y>z", "key value x y z"),
    ("Café déjà-vu", "café déjà vu"),       # non-ASCII letters survive
    ("a_b [c] {d} `e`", "a b c d e"),
    ("", ""),
    ("...", ""),
    ("MiXeD123cAsE", "mixed123case"),
    # vertical tab: Java \s matches \x0B, RE2 \s does not — the explicit
    # whitespace class keeps the two engines identical (round-7 advisor)
    ("a\x0bb \x0b c", "a b c"),
    ("a\fb\rc", "a b c"),
]


def test_hand_cases(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)],
                               "i long, text string")
    got = {r["i"]: r["norm_text"] for r in with_normalized(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


def test_duckdb_chain_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "text string")
    got = [r[0] for r in df.select(normalize_expr(F.col("text"))).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {normalize_sql('?')}", [s]).fetchone()[0]
        for s, _ in CASES
    ]
    assert got == want


def test_drop_normalized_dupes_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello,   world!!"), (3, "other doc")],
        "doc_id long, text string",
    )
    kept = drop_normalized_dupes(df)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3]
    assert kept.columns == ["doc_id", "text"]   # internal cols dropped


def test_gate_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_normalized_dedup,
        q_normalized_dedup,
    )

    got = sorted(map(tuple, q_normalized_dedup(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_normalized_dedup()).fetchall()))
    assert got == want
