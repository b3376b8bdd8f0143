"""Repetition quality metrics: hand-computed line/bigram/5-gram cases
(including the newline metrics the gate corpus can't exercise — its docs
are single-line), threshold flagging, the O(n log n) sorted-run
formulation vs a naive count, and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.repetition import (
    GOPHER_THRESHOLDS_MILLI,
    repetition_filter,
    with_repetition_stats,
)


def _stats(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_repetition_stats(df).collect()[0]


def test_line_metrics_hand_math(spark):
    """4 non-empty lines, 'a b' appearing 3 times -> 2 duplicates ->
    dup_line_milli = 2000 div 4 = 500; empty lines don't count."""
    r = _stats(spark, "a b\nc d\n\na b\na b")
    assert r["n_lines"] == 4
    assert r["dup_line_milli"] == 500
    # all-distinct lines -> 0
    assert _stats(spark, "a b\nc d\ne f")["dup_line_milli"] == 0


def test_bigram_multiplicity_hand_math(spark):
    """'x y x y x y z': bigrams [x y, y x, x y, y x, x y, y z] -> 'x y'
    x3 of 6 -> top_bigram_n 3, milli 500."""
    r = _stats(spark, "x y x y x y z")
    assert r["top_bigram_n"] == 3
    assert r["top_bigram_milli"] == 500
    # single word: no bigrams
    r1 = _stats(spark, "solo")
    assert r1["top_bigram_n"] == 0 and r1["top_bigram_milli"] == 0


def test_dup_5gram_hand_math(spark):
    """'a b c d e a b c d e a': 7 5-grams, ['a b c d e','b c d e a']
    each repeat once -> 2 dups -> 2000 div 7 = 285."""
    r = _stats(spark, "a b c d e a b c d e a")
    assert r["dup_5gram_milli"] == 285
    assert _stats(spark, "a b c d")["dup_5gram_milli"] == 0  # < 5 words


def test_flag_thresholds_and_filter(spark):
    """A pathological repeated-phrase doc flags; normal prose doesn't;
    repetition_filter drops exactly the flagged ones and restores the
    input schema."""
    spam = "buy now " * 50  # top bigram 'buy now' ~ 1/2 of bigrams
    prose = "the quick brown fox jumps over the lazy dog again today"
    df = spark.createDataFrame(
        [(1, spam.strip()), (2, prose)], "doc_id long, text string"
    )
    stats = {r["doc_id"]: r for r in with_repetition_stats(df).collect()}
    assert stats[1]["repetition_flagged"] is True
    assert stats[1]["top_bigram_milli"] > GOPHER_THRESHOLDS_MILLI["top_bigram_milli"]
    assert stats[2]["repetition_flagged"] is False
    kept = repetition_filter(df)
    assert kept.columns == ["doc_id", "text"]
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_sorted_run_equals_naive_count(spark):
    """The O(n log n) sorted-run multiplicity equals the naive
    count-every-distinct formulation on a randomized corpus."""
    import random

    rng = random.Random(9)
    rows = [
        (i, " ".join(rng.choice("abcdef") for _ in range(rng.randint(1, 60))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = with_repetition_stats(df).select("doc_id", "top_bigram_n")
    naive = df.select(
        "doc_id",
        F.expr(
            "coalesce(array_max(transform(array_distinct("
            " IF(size(split(text, ' ')) >= 2,"
            "  transform(sequence(1, size(split(text, ' ')) - 1),"
            "   i -> array_join(slice(split(text, ' '), i, 2), ' ')),"
            "  array())),"
            " x -> cast(size(filter("
            "  IF(size(split(text, ' ')) >= 2,"
            "   transform(sequence(1, size(split(text, ' ')) - 1),"
            "    i -> array_join(slice(split(text, ' '), i, 2), ' ')),"
            "   array()), y -> y = x)) as long))), 0L) as naive_n"
        ),
    )
    diff = got.join(naive, "doc_id").filter("top_bigram_n != naive_n").count()
    assert diff == 0


def test_repetition_oracle_parity_sf0001(spark):
    """Full oracle parity at a second SF (the driver gate runs sf0.01)."""
    from otel_logger_spark.queries_training import (
        _o_doc_repetition,
        q_doc_repetition,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(_o_doc_repetition()).fetchall()}
    got = {tuple(r) for r in q_doc_repetition(spark, sf).collect()}
    assert got == exp and len(got) == 500
    # the corpus exercises the bigram/5-gram metrics (non-degenerate)
    assert any(r[3] > 1 for r in got)  # top_bigram_n
