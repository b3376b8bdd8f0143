"""Rate-spike detection: hand-computed integer z-score boundaries, dense
timeline semantics (silence counts as zero), the min_baseline knob, and
Spark-vs-DuckDB oracle parity on the real gate input."""

from datetime import datetime, timedelta

import pytest

from otel_logger_spark.operators.anomaly import rate_spikes, rate_spikes_oracle_sql

T0 = datetime(2024, 3, 1, 0, 0, 0)  # hour-aligned


def _hours(spark, counts, role="a"):
    """One row per event; counts[i] events in hour bucket i."""
    rows = []
    for i, n in enumerate(counts):
        for j in range(n):
            rows.append((role, T0 + timedelta(hours=i, minutes=j % 60)))
    return spark.createDataFrame(rows, "role string, ts timestamp")


def test_spike_boundary_hand_math(spark):
    """Alternating 2/4 baseline (k=24: S=72, Q=240 -> k*Q - S^2 = 576;
    rhs = 9*24*576 = 124416). Flag iff (24n-72)^2 * 23 > rhs:
    n=6 -> 72^2*23 = 119232 (no); n=7 -> 96^2*23 = 211968 (yes)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = [2, 4] * 12  # 24 buckets of history
    for spike_n, expect in ((6, 0), (7, 1), (12, 1)):
        df = _hours(spark, base + [spike_n])
        got = rate_spikes(df, group_cols=("role",), bucket_seconds=3600,
                          trailing=24, z=3).collect()
        assert len(got) == expect, (spike_n, got)
        if expect:
            r = got[0]
            assert r["n_events"] == spike_n and r["trail_sum"] == 72
            assert r["bucket_start_epoch"] == int(
                (T0 + timedelta(hours=24) - datetime(1970, 1, 1)).total_seconds()
            )


def test_silence_is_zero_baseline_and_min_baseline_knob(spark):
    """The dense timeline makes 24h of silence a zero baseline: any
    activity after it is an infinite-z spike (flags by default), and
    min_baseline=1 suppresses exactly that case."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _hours(spark, [1] + [0] * 24 + [1])
    flagged = rate_spikes(df, bucket_seconds=3600, trailing=24, z=3).collect()
    assert [(r["n_events"], r["trail_sum"]) for r in flagged] == [(1, 0)]
    assert rate_spikes(
        df, bucket_seconds=3600, trailing=24, z=3, min_baseline=1
    ).count() == 0


def test_trailing_lt_2_rejected(spark):
    with pytest.raises(ValueError, match="trailing"):
        rate_spikes(_hours(spark, [1]), trailing=1)


def test_outlier_timestamp_errors_by_default(spark):
    """Round 6 guard: one stray 1970 timestamp would make the dense
    timeline span ~475k hourly buckets — the default span_overflow=
    'error' fails loudly with the knob names in the message instead of
    exploding sequence()."""
    from pyspark.errors import SparkRuntimeException

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = _hours(spark, [2, 4] * 12 + [7]).union(
        spark.createDataFrame(
            [("a", datetime(1970, 1, 5, 0, 0, 0))], "role string, ts timestamp"
        )
    )
    with pytest.raises(SparkRuntimeException, match="max_span_buckets"):
        rate_spikes(df, bucket_seconds=3600, trailing=24, z=3).collect()


def test_outlier_timestamp_clamp_matches_clean_run(spark):
    """span_overflow='clamp' keeps only the most recent max_span_buckets
    buckets: the 1970 outlier (and everything before the clamp point)
    drops out of both flagging and baselines, so the result equals the
    clean input's — and a span exactly at the cap stays untouched."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    clean = _hours(spark, [2, 4] * 12 + [7])
    dirty = clean.union(
        spark.createDataFrame(
            [("a", datetime(1970, 1, 5, 0, 0, 0))], "role string, ts timestamp"
        )
    )
    exp = sorted(map(tuple, rate_spikes(
        clean, bucket_seconds=3600, trailing=24, z=3).collect()))
    got = sorted(map(tuple, rate_spikes(
        dirty, bucket_seconds=3600, trailing=24, z=3,
        span_overflow="clamp", max_span_buckets=25).collect()))
    assert got == exp and len(got) == 1
    # exactly-at-cap clean span passes error mode unchanged
    at_cap = sorted(map(tuple, rate_spikes(
        clean, bucket_seconds=3600, trailing=24, z=3,
        max_span_buckets=25).collect()))
    assert at_cap == exp


def test_count_bound_enforced_not_just_documented(spark):
    """The int64 exactness bound is asserted in-plan: with z inflated so
    the bound drops to a test-sized value, a bucket past it raises
    instead of silently wrapping negative (false-negative detector)."""
    from pyspark.errors import SparkRuntimeException

    from otel_logger_spark.operators.anomaly import _n_bound

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    z = 10**6
    assert _n_bound(3, z) == 584  # isqrt((2^63-1) / (z^2 * 27))
    df = _hours(spark, [600, 1, 1, 1])
    with pytest.raises(SparkRuntimeException, match="int64 exactness bound"):
        rate_spikes(df, bucket_seconds=3600, trailing=3, z=z).collect()
    # same shape inside the bound runs fine
    assert rate_spikes(
        _hours(spark, [500, 1, 1, 1]), bucket_seconds=3600, trailing=3, z=z
    ).count() == 0


def test_rate_spikes_oracle_parity_sf0001(spark):
    """Full oracle parity at a second SF (the driver gate runs sf0.01)."""
    import duckdb

    from otel_logger_spark.graftdata import transcripts_cte
    from otel_logger_spark.queries_extra import q_rate_spikes

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = {tuple(r) for r in con.sql(
        rate_spikes_oracle_sql(transcripts_cte())
    ).fetchall()}
    got = {
        (r["role"], r["bucket_start_epoch"], r["n_events"], r["trail_sum"])
        for r in q_rate_spikes(spark, sf).collect()
    }
    assert got == exp and len(got) > 0
