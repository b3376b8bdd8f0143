"""Span-level exact-substring dedup (functions/spandedup.py): hand-math
coverage with overlapping windows, short/clean-doc zeros, the min_docs=3
distinct-count branch, hash-mode equality, the trim and drop forms, plan
shape, and oracle parity at a second SF."""

import duckdb
import pytest

from otel_logger_spark.functions.spandedup import (
    drop_span_duplicated,
    span_dedup_sql,
    span_dedup_stats,
    trim_duplicated_spans,
)
from otel_logger_spark.plans.audit import shape

SF = "/root/testdata/sf0.001"


def _docs(spark):
    # n=3 windows: docs 1 and 2 share "a b c" and "b c d"; doc 3 is
    # clean; doc 4 is shorter than the window; doc 5 repeats a window
    # WITHIN itself only (within-doc repetition is not span duplication)
    return spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "x a b c d y"),
            (3, "p q r s t u"),
            (4, "hi yo"),
            (5, "m n o m n o m n o"),
        ],
        "doc_id long, text string",
    )


def _stats(spark, **kw):
    rows = span_dedup_stats(_docs(spark), n=3, **kw).collect()
    return {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["dup_windows"],
            r["dup_tokens"], r["dup_milli"],
        )
        for r in rows
    }


def test_hand_math_overlapping_coverage(spark):
    """Doc 1 dup starts {0, 1}: coverage = min(3, 1-0) + 3 = 4 of 5
    tokens -> 800 milli. Doc 2 dup starts {1, 2}: 4 of 6 -> 666. The
    overlap (tokens b, c shared by both windows) must not double count."""
    s = _stats(spark)
    assert s[1] == (5, 3, 2, 4, 800)
    assert s[2] == (6, 4, 2, 4, 666)


def test_clean_short_and_within_doc_rows(spark):
    s = _stats(spark)
    assert s[3] == (6, 4, 0, 0, 0)      # clean: zeros, still present
    assert s[4] == (2, 0, 0, 0, 0)      # shorter than n: no windows
    # doc 5's "m n o" repeats only within itself -> not duplicated
    assert s[5] == (9, 7, 0, 0, 0)


def test_min_docs_three_branch(spark):
    """With min_docs=3 the shared-by-two span no longer qualifies (this
    exercises the countDistinct branch instead of min!=max)."""
    s = _stats(spark, min_docs=3)
    assert s[1] == (5, 3, 0, 0, 0)
    assert s[2] == (6, 4, 0, 0, 0)


def test_hash_mode_equals_string_mode(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = sorted(map(tuple, span_dedup_stats(docs).collect()))
    b = sorted(map(tuple, span_dedup_stats(docs, use_hash=True).collect()))
    assert a == b


def test_drop_threshold_semantics(spark):
    """max_dup_milli=700 drops doc 1 (800) and keeps doc 2 (666) plus
    every clean doc; schema is unchanged."""
    docs = _docs(spark)
    kept = drop_span_duplicated(docs, max_dup_milli=700, n=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3, 4, 5]
    assert kept.columns == docs.columns


def test_trim_removes_covered_tokens_only(spark):
    """Doc 1 keeps token 'e' (positions 0-3 covered); doc 2 keeps 'x'
    and 'y'; clean docs pass through byte-identical."""
    t = {r["doc_id"]: r["text"] for r in
         trim_duplicated_spans(_docs(spark), n=3).collect()}
    assert t[1] == "e"
    assert t[2] == "x y"
    assert t[3] == "p q r s t u"
    assert t[5] == "m n o m n o m n o"


def test_oracle_parity_second_sf(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(map(tuple, span_dedup_stats(docs).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(span_dedup_sql()).fetchall()))
    assert got == want


def test_plan_shape_stats_and_drop(spark):
    """Stats: the window-content agg + the per-doc coverage side — text
    never joined back (upper bound pins it). Drop: the corpus anti-join
    side must be BROADCAST (text crosses zero exchanges) and no Python
    anywhere."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = shape(span_dedup_stats(docs))
    assert s["python_stages"] == 0
    assert s["exchanges"] <= 5
    d = shape(drop_span_duplicated(docs, max_dup_milli=500))
    assert d["python_stages"] == 0
    assert any("BroadcastHashJoin" in j for j in d["joins"])
