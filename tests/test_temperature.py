"""Temperature-based source mixing (functions/temperature.py):
exact-isqrt correctness at the int64 edge, hand-checked largest-
remainder allocation, exact-sum invariants, the alpha monotonicity
property (lower alpha lifts small sources), guard matrix, apply/report
agreement, and gate parity vs the DuckDB oracle at a second SF."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.temperature import (
    MAX_TOKENS_PER_SOURCE,
    _isqrt,
    _weight,
    apply_temperature_mix,
    temperature_mix_report,
    temperature_mix_report_sql,
)

SF = "/root/testdata/sf0.001"


def _mk_docs(spark, sizes: dict[str, tuple[int, int]]):
    """sizes: source -> (n_docs, words_per_doc). doc_ids are globally
    unique and interleaved across sources."""
    rows, i = [], 0
    for src, (n, w) in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, src, " ".join(f"w{j}" for j in range(w))))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_isqrt_exact_at_edges(spark):
    vals = []
    for base in (0, 1, 2, 3, 10**6, 10**12, 9 * 10**18 // 10**6):
        for s in (base, base * base if base < 3 * 10**9 else base):
            for d in (-1, 0, 1):
                v = s + d
                if 0 <= v <= 9 * 10**18:
                    vals.append(v)
    # squares straddling the double-rounding danger zone near 2^52+
    for r in (94906265, 94906266, 3037000499):
        for d in (-1, 0, 1):
            vals.append(r * r + d)
    df = spark.createDataFrame([(v,) for v in sorted(set(vals))], "x long")
    got = {r["x"]: r["s"] for r in df.select("x", _isqrt(F.col("x")).alias("s")).collect()}
    for v, s in got.items():
        assert s == math.isqrt(v), f"isqrt({v}) = {s} != {math.isqrt(v)}"


def test_hand_allocation_alpha_half(spark):
    """tokens {a: 6400, b: 1600, c: 400}: isqrt(t*10^6) weights are
    exactly 80_000/40_000/20_000 (the inputs are perfect squares), a
    4:2:1 ratio whose largest-remainder allocation is replayed below in
    pure Python and asserted field-for-field against the engine."""
    docs = _mk_docs(spark, {"a": (4, 1600), "b": (4, 400), "c": (4, 100)})
    rows = {r["source"]: r for r in
            temperature_mix_report(docs, 1000, alpha="0.5").collect()}
    assert rows["a"]["tokens_total"] == 6400
    assert rows["a"]["weight"] == 80_000
    assert rows["b"]["weight"] == 40_000
    assert rows["c"]["weight"] == 20_000
    # exact largest-remainder replay in python
    W = 140_000
    shares0 = {s: (10**6 * rows[s]["weight"]) // W for s in rows}
    rems = {s: (10**6 * rows[s]["weight"]) % W for s in rows}
    left = 10**6 - sum(shares0.values())
    order = sorted(rows, key=lambda s: (-rems[s], s))
    for s in order[:left]:
        shares0[s] += 1
    assert {s: rows[s]["share_micro"] for s in rows} == shares0
    q0 = {s: (1000 * shares0[s]) // 10**6 for s in rows}
    qr = {s: (1000 * shares0[s]) % 10**6 for s in rows}
    qleft = 1000 - sum(q0.values())
    for s in sorted(rows, key=lambda s: (-qr[s], s))[:qleft]:
        q0[s] += 1
    assert {s: rows[s]["quota_tokens"] for s in rows} == q0


@pytest.mark.parametrize("alpha", ["1", "0.5", "0.25"])
def test_exact_sum_invariants(spark, alpha):
    docs = _mk_docs(spark, {"big": (30, 200), "mid": (10, 50), "tiny": (2, 5)})
    budget = 1777
    rows = temperature_mix_report(docs, budget, alpha=alpha).collect()
    assert sum(r["share_micro"] for r in rows) == 10**6
    assert sum(r["quota_tokens"] for r in rows) == budget
    for r in rows:
        assert 0 <= r["rate_milli"] <= 1000
        assert r["tokens_kept"] <= r["tokens_total"]
        assert r["n_kept"] <= r["n_docs"]


def test_alpha_monotone_lifts_small_sources(spark):
    """As alpha drops 1 -> 1/2 -> 1/4 the smallest source's share must
    not decrease and the largest source's share must not increase."""
    docs = _mk_docs(spark, {"big": (40, 250), "small": (2, 10)})
    shares = {}
    for alpha in ("1", "0.5", "0.25"):
        rows = {r["source"]: r["share_micro"] for r in
                temperature_mix_report(docs, 1000, alpha=alpha).collect()}
        shares[alpha] = rows
    assert shares["1"]["small"] <= shares["0.5"]["small"] <= shares["0.25"]["small"]
    assert shares["1"]["big"] >= shares["0.5"]["big"] >= shares["0.25"]["big"]


def test_guard_matrix(spark):
    docs = _mk_docs(spark, {"a": (2, 3)})
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_report(docs, 100, alpha="0.3")
    with pytest.raises(ValueError, match="budget_tokens"):
        temperature_mix_report(docs, 0)
    with pytest.raises(ValueError, match="budget_tokens"):
        temperature_mix_report(docs, MAX_TOKENS_PER_SOURCE + 1)
    # the in-plan int64 guard: a source over MAX_TOKENS_PER_SOURCE
    # raises AT EXECUTION (no silent overflow)
    big = spark.createDataFrame(
        [(MAX_TOKENS_PER_SOURCE + 1,)], "t long"
    ).select(_weight(F.col("t"), "0.5").alias("w"))
    with pytest.raises(Exception, match="temperature_mix"):
        big.collect()


def test_apply_matches_report_accounting(spark):
    docs = _mk_docs(spark, {"a": (20, 40), "b": (5, 10), "c": (50, 80)})
    rep = {r["source"]: r for r in
           temperature_mix_report(docs, 900, alpha="0.5").collect()}
    kept = apply_temperature_mix(docs, 900, alpha="0.5")
    assert kept.columns == docs.columns
    got = {r["source"]: r["n"] for r in
           kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, r in rep.items():
        assert got.get(s, 0) == r["n_kept"]
    # deterministic: same rows on re-run
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in
                  apply_temperature_mix(docs, 900, alpha="0.5").collect())
    assert ids1 == ids2


def test_gate_parity_second_sf(spark):
    """The gate runs at sf0.01; replay engine-vs-oracle at sf0.001 with
    a different budget/alpha so parity isn't tuned to one input."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        map(tuple, temperature_mix_report(docs, 3000, alpha="0.25").collect())
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(
        temperature_mix_report_sql("documents", 3000, alpha="0.25")
    ).fetchall()))
    assert got == want
