"""Salient-term extraction (functions/tfidf.py): hand-math scoring, tie
determinism, the max_df stopword/skew guard with its accounting report,
the int64 score guard's error path, plan shape, and oracle parity at a
second SF."""

import duckdb
import pytest

from otel_logger_spark.functions import tfidf
from otel_logger_spark.functions.tfidf import (
    df_cap_report,
    doc_term_freq,
    salient_terms,
    salient_terms_sql,
)
from otel_logger_spark.plans.audit import shape


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana banana dog"),
            (3, "apple dog dog zebra zebra zebra"),
        ],
        "doc_id long, text string",
    )


def test_hand_math_scores(spark):
    """N=3. 'zebra' in doc 3: tf=3, df=1 -> idf_milli=3000, score 9000.
    'apple' in doc 1: tf=2, df=2 -> idf_milli=1500, score 3000. 'cherry'
    tf=1 df=1 -> 3000. Ties (apple/cherry in doc 1) order by term asc."""
    rows = {
        (r["doc_id"], r["rn"]): (r["term"], r["score_milli"])
        for r in salient_terms(_docs(spark), k=2).collect()
    }
    assert rows[(3, 1)] == ("zebra", 9000)
    assert rows[(1, 1)] == ("apple", 3000)   # tie with cherry: term asc
    assert rows[(1, 2)] == ("cherry", 3000)
    assert rows[(2, 2)] == ("dog", 1500)


def test_empty_tokens_dropped(spark):
    df = spark.createDataFrame([(1, "a  b")], "doc_id long, text string")
    tf = {r["term"]: r["tf"] for r in doc_term_freq(df).collect()}
    assert tf == {"a": 1, "b": 1}


def test_max_df_guard_and_report(spark):
    """'dog' and 'apple'/'banana' appear in 2 docs; max_df=1 keeps only
    the df=1 terms — and the report accounts for every exclusion."""
    out = salient_terms(_docs(spark), k=3, max_df=1)
    assert {r["term"] for r in out.collect()} == {"cherry", "zebra"}
    rep = df_cap_report(_docs(spark), max_df=1).collect()[0]
    assert rep["excluded_terms"] == 3           # apple, banana, dog
    assert rep["excluded_postings"] == 6        # 2 docs each
    assert rep["max_dfreq"] == 2


def test_score_guard_error_path(spark, monkeypatch):
    """The in-plan assert fires when tf * idf_milli would pass the cap
    (shrunk here — the real bound needs tf > (2^63-1)/(1000*N))."""
    monkeypatch.setattr(tfidf, "_SCORE_CAP", 1000)
    with pytest.raises(Exception, match="exceeds int64|ASSERT"):
        salient_terms(_docs(spark), k=1).collect()


def test_plan_no_python_no_cartesian(spark):
    s = shape(salient_terms(_docs(spark), k=2))
    assert s["python_stages"] == 0
    assert not any("CartesianProduct" in j for j in s["joins"])


def test_tfidf_oracle_parity_sf0001(spark):
    from otel_logger_spark.queries_training import _o_tfidf_terms, q_tfidf_terms

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(_o_tfidf_terms()).fetchall()}
    got = {
        (r["doc_id"], r["rn"], r["term"], r["tf"], r["dfreq"], r["score_milli"])
        for r in q_tfidf_terms(spark, sf).collect()
    }
    assert got == exp and len(got) > 0


def test_duckdb_replica_on_hand_frame(spark):
    """Engine vs oracle SQL on the hand-built frame (not just testdata)."""
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    exp = sorted(tuple(r) for r in con.sql("WITH" + salient_terms_sql("docs", k=3)).fetchall())
    got = sorted(tuple(r) for r in salient_terms(_docs(spark), k=3).collect())
    assert got == exp
