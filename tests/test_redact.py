"""PII redaction: exact masking on handpicked strings, Java-vs-RE2
dialect parity for every rule (counts AND replacements), and the audit
report's semantics."""

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.redact import (
    PII_RULES,
    redaction_report,
    with_redacted,
)

CASES = [
    ("mail a.b+c_d%e@sub.example.co.uk now", "mail <email> now"),
    ("ssn 123-45-6789.", "ssn <ssn>."),
    ("card 4111 1111 1111 1111 ok", "card <card> ok"),
    ("card 4111-1111-1111-1111 ok", "card <card> ok"),
    ("call +1 (415) 555-0199 or 415.555.0199", "call <phone> or <phone>"),
    ("host 192.168.0.1 and 10.0.0.255", "host <ip> and <ip>"),
    ("key deadbeefdeadbeefdeadbeefdeadbeef end", "key <secret> end"),
    ("clean text with numbers 42 and words", "clean text with numbers 42 and words"),
    # order matters: the 16-digit run must become <card>, not <phone>+digits
    ("4111111111111111", "<card>"),
]

NASTY = [c[0] for c in CASES] + [
    "",
    "a@b",  # not an email (no tld)
    "999-99-9999 123-456-7890",  # ssn then phone-ish
    "1.2.3.4.5.6",  # overlapping ip-ish runs
    "ABCDEF0123456789abcdef0123456789xyz",  # 32 hex then letters (\\b fails)
    "x +12 345 678 9012 y",
    "é@exämple.com",  # non-ascii local/domain parts
]


def test_masking_exact(spark):
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)],
                               "i long, text string")
    got = {r["i"]: r["text_redacted"] for r in with_redacted(df).collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, (CASES[i][0], got[i])


def test_dialect_parity_counts_and_masks(spark):
    """Every rule must behave identically in Spark (Java regex) and DuckDB
    (RE2) — per-pattern match counts and the full ordered mask chain."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(NASTY)],
                               "i long, text string")
    red = with_redacted(df)
    srows = {r["i"]: r for r in red.collect()}
    con = duckdb.connect()
    for i, t in enumerate(NASTY):
        masked = t
        for name, pat, mask in PII_RULES:
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()
            assert n == srows[i][f"n_{name}"], (name, t)
        for name, pat, mask in PII_RULES:
            (masked,) = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [masked, pat, mask]
            ).fetchone()
        assert masked == srows[i]["text_redacted"], t


def test_report_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a@b.com and c@d.org"),     # 1 doc, 2 email matches
            (2, "a@b.com at 10.0.0.1"),     # email + ip
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    rep = {r["pii_type"]: (r["n_docs"], r["n_matches"])
           for r in redaction_report(df).collect()}
    assert rep["email"] == (2, 3)
    assert rep["ip"] == (1, 1)
    assert rep["ssn"] == (0, 0)
    assert set(rep) == {n for n, _, _ in PII_RULES}
