"""Benchmark decontamination: hand-built contamination cases, the
short-document boundary, hash-mode equality, the broadcast-only plan
shape (raw text never shuffles), and oracle parity at a second SF."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.decontam import (
    contaminated_ids,
    decontam_summary,
    decontaminate,
)
from otel_logger_spark.plans.audit import shape


def _frames(spark):
    """Benchmark doc = 13 words w0..w12; train doc 1 embeds that exact
    13-gram mid-document, doc 2 shares only a 12-word prefix (NOT
    contaminated at n=13), doc 3 is unrelated, doc 4 is 5 words long."""
    bench_text = " ".join(f"w{i}" for i in range(13))
    d1 = "intro " + bench_text + " outro"
    d2 = " ".join(f"w{i}" for i in range(12)) + " different tail here"
    d3 = "completely unrelated content with many words going on and on"
    d4 = "too short for grams"
    bench = spark.createDataFrame([(bench_text,)], "text string")
    docs = spark.createDataFrame(
        [(1, "a", d1), (2, "a", d2), (3, "b", d3), (4, "b", d4)],
        "doc_id long, source string, text string",
    )
    return docs, bench


def test_contamination_hand_cases(spark):
    docs, bench = _frames(spark)
    hits = sorted(r["doc_id"] for r in contaminated_ids(docs, bench).collect())
    assert hits == [1]
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench).collect())
    assert kept == [2, 3, 4]
    summ = {
        r["source"]: (r["n_docs"], r["n_contaminated"], r["n_kept"])
        for r in decontam_summary(docs, bench).collect()
    }
    assert summ == {"a": (2, 1, 1), "b": (2, 0, 2)}


def test_hash_mode_equals_string_mode(spark):
    """use_hash=True (xxhash64 grams, 8-byte broadcast entries) selects
    exactly the same documents as the string join."""
    docs, bench = _frames(spark)
    a = sorted(r["doc_id"] for r in contaminated_ids(docs, bench).collect())
    b = sorted(
        r["doc_id"]
        for r in contaminated_ids(docs, bench, use_hash=True).collect()
    )
    assert a == b == [1]


def test_plan_is_broadcast_only(spark):
    """Corpus text never crosses an exchange: both joins broadcast (the
    bench-gram semi and the contaminated-id anti); no SortMergeJoin or
    ShuffledHashJoin anywhere."""
    docs, bench = _frames(spark)
    s = shape(decontaminate(docs, bench))
    assert s["joins"] and all("Broadcast" in j for j in s["joins"])
    assert not any("SortMerge" in j or "ShuffledHash" in j for j in s["joins"])
    assert s["python_stages"] == 0


def test_decontam_oracle_parity_sf0001(spark):
    """Full oracle parity at a second SF (the driver gate runs sf0.01)."""
    from otel_logger_spark.queries_training import (
        _o_decontam_split,
        q_decontam_split,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(_o_decontam_split()).fetchall()}
    got = {
        (r["source"], r["n_docs"], r["n_contaminated"], r["n_kept"])
        for r in q_decontam_split(spark, sf).collect()
    }
    assert got == exp and len(got) > 0
    # the synthetic corpus genuinely contains cross-split contamination
    assert sum(r[2] for r in got) > 0
