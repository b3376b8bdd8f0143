"""Rate-spike (burst) detection over event streams — the natural
companion to log template mining (functions/templates.py): templates tell
you WHAT the noisy statements are, this tells you WHEN a stream's volume
went anomalous. The reference's scope ends at forwarding
(/root/reference/main.go); this is part of the analytics breadth a log
engine's users expect on top.

Semantics: bucket events into fixed windows, build the DENSE per-group
timeline (absent buckets count 0 — a trailing window that skips quiet
periods would understate the baseline and overflag), then flag buckets
whose count exceeds the trailing-window mean by >= z sample standard
deviations.

The z-score test is evaluated in EXACT INTEGER ARITHMETIC — no floats,
no sqrt, no division:

    n  >  mean + z * std
    <=> (k*n - S) > 0   and   (k*n - S)^2 * (k-1) > z^2 * k * (k*Q - S^2)

with k = trailing buckets, S = sum(n_prev), Q = sum(n_prev^2) (sample
variance = (Q - S^2/k) / (k-1), both sides multiplied by k^2*(k-1)).
Deterministic under retries, bit-exact across engines — the DuckDB oracle
replays the identical comparison in HUGEINT. An all-zero baseline
(S = Q = 0) makes the RHS 0, so any activity after total silence flags —
that IS the z-score limit (std 0); raise ``min_baseline`` to require a
live baseline instead.

Scale shape: the per-(group, bucket) count aggregates with map-side
partials (the only shuffle of event-volume data); everything after runs
on the DENSE timeline, whose size is O(groups x span/bucket) —
independent of event volume. Two guards make that shape safe on dirty
data instead of merely documented (round 6, both ENFORCED in-plan):

- ``max_span_buckets`` bounds the dense timeline: one corrupt 1970/2099
  timestamp in a group would otherwise make ``sequence(_mn, _mx)`` span
  ~490k+ buckets per group (and Spark's sequence length cap throws far
  later, after real memory damage). ``span_overflow="error"`` (default)
  fails the job with an actionable message the moment any group's span
  exceeds the cap; ``"clamp"`` keeps only the most recent
  ``max_span_buckets`` buckets of that group's timeline (buckets before
  the clamp point — i.e. the stray outliers — are excluded from both
  flagging and baselines).
- the int64 exactness bound (z^2*k^2*(k-1)*n_max^2 < 2^63, ~8.6e6
  events/bucket/group at the defaults z=3, k=24) is enforced with an
  in-plan assert on every dense-timeline count: past it, dev*dev and
  s*s would wrap negative in non-ANSI Spark and real spikes silently
  stop flagging — a false NEGATIVE in a detector. Shrink
  ``bucket_seconds`` or add group columns when you hit it.
"""

from __future__ import annotations

from math import isqrt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _n_bound(trailing: int, z: int) -> int:
    """Largest per-bucket count for which every intermediate of the
    integer z-score comparison stays inside int64: lhs <= k^2*(k-1)*n^2
    and rhs <= z^2*k^3*n^2 (S <= k*n, Q <= k*n^2)."""
    k = trailing
    return isqrt((2**63 - 1) // max(k * k * (k - 1), z * z * k**3))


def rate_spikes(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z: int = 3,
    min_baseline: int = 0,
    max_span_buckets: int = 8784,
    span_overflow: str = "error",
) -> DataFrame:
    """Flag (group, bucket) pairs whose event count exceeds the trailing
    ``trailing``-bucket mean by >= ``z`` sample standard deviations.
    Requires a FULL trailing history (the first ``trailing`` buckets of
    each group never flag). Returns
    (*group_cols, bucket_start_epoch, n_events, trail_sum) — all
    integer-typed, ascending-deterministic.

    ``max_span_buckets`` (default 8784 = a leap year of hourly buckets)
    caps each group's dense-timeline span; ``span_overflow`` picks the
    reaction ("error" fails loudly, "clamp" keeps the most recent cap
    worth of buckets). See the module docstring for why both this and
    the per-bucket count bound are enforced rather than documented."""
    bucket = F.expr(f"unix_timestamp({ts_col}) DIV {bucket_seconds}")
    counts = (
        df.select(*group_cols, bucket.alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return spikes_from_bucket_counts(
        counts,
        group_cols=group_cols,
        bucket_seconds=bucket_seconds,
        trailing=trailing,
        z=z,
        min_baseline=min_baseline,
        max_span_buckets=max_span_buckets,
        span_overflow=span_overflow,
    )


def spikes_from_bucket_counts(
    counts: DataFrame,
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z: int = 3,
    min_baseline: int = 0,
    max_span_buckets: int = 8784,
    span_overflow: str = "error",
) -> DataFrame:
    """The detector's post-aggregation half, over pre-bucketed counts
    (*group_cols, _b, _n) — shared by batch ``rate_spikes`` (which
    derives counts from raw events) and the streaming finalizer
    (streaming/analytics.read_rate_spikes, which re-aggregates per-batch
    partials). Everything from the dense timeline on is identical, so
    streaming equals batch row-for-row whatever the micro-batch
    boundaries were."""
    if trailing < 2:
        raise ValueError(f"trailing must be >= 2 (sample std): {trailing}")
    if max_span_buckets < trailing + 1:
        raise ValueError(
            f"max_span_buckets must exceed trailing ({trailing}): "
            f"{max_span_buckets}"
        )
    if span_overflow not in ("error", "clamp"):
        raise ValueError(f"span_overflow must be error|clamp: {span_overflow}")
    g = list(group_cols)
    k = trailing
    span_agg = counts.groupBy(*g).agg(
        F.min("_b").alias("_mn"), F.max("_b").alias("_mx")
    )
    if span_overflow == "error":
        # assert_true returns NULL when the predicate holds and throws
        # otherwise; routing _mn through it keeps the check in the plan
        # (an unreferenced assert column would be pruned by Catalyst).
        span_ok = F.assert_true(
            F.col("_mx") - F.col("_mn") < F.lit(max_span_buckets),
            F.concat(
                F.lit(
                    "rate_spikes: dense timeline span exceeds "
                    f"max_span_buckets={max_span_buckets} for group "
                ),
                F.concat_ws("/", *g),
                F.lit(
                    f" (bucket range spans x{bucket_seconds}s buckets) — "
                    "likely a corrupt outlier timestamp; filter the input, "
                    "raise max_span_buckets, or use span_overflow='clamp'"
                ),
            ),
        )
        lo = F.when(span_ok.isNull(), F.col("_mn"))
    else:
        lo = F.greatest(F.col("_mn"), F.col("_mx") - F.lit(max_span_buckets - 1))
    dense = span_agg.select(*g, F.explode(F.sequence(lo, F.col("_mx"))).alias("_b"))
    n_cap = _n_bound(k, z)
    n_checked = F.when(
        F.assert_true(
            F.coalesce("_n", F.lit(0)) <= n_cap,
            F.lit(
                f"rate_spikes: per-bucket count exceeds {n_cap}, the int64 "
                f"exactness bound at trailing={k}, z={z} — shrink "
                "bucket_seconds or add group columns"
            ),
        ).isNull(),
        F.coalesce("_n", F.lit(0)),
    )
    filled = dense.join(counts, [*g, "_b"], "left").select(
        *g, "_b", n_checked.alias("_n")
    )
    w = Window.partitionBy(*g).orderBy("_b").rowsBetween(-k, -1)
    scored = filled.select(
        *g,
        "_b",
        "_n",
        F.sum("_n").over(w).alias("_s"),
        F.sum(F.col("_n") * F.col("_n")).over(w).alias("_q"),
        F.count(F.lit(1)).over(w).alias("_c"),
    )
    dev = k * F.col("_n") - F.col("_s")  # k * (n - mean)
    lhs = dev * dev * F.lit(k - 1)
    rhs = F.lit(z * z * k) * (k * F.col("_q") - F.col("_s") * F.col("_s"))
    return (
        scored.filter(
            (F.col("_c") == k)
            & (F.col("_s") >= min_baseline)
            & (dev > 0)
            & (lhs > rhs)
        )
        .select(
            *g,
            (F.col("_b") * bucket_seconds).alias("bucket_start_epoch"),
            F.col("_n").alias("n_events"),
            F.col("_s").alias("trail_sum"),
        )
    )


def rate_spikes_oracle_sql(
    corpus_cte_sql: str,
    ts_expr: str = "ts",
    group_col: str = "role",
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z: int = 3,
    min_baseline: int = 0,
) -> str:
    """DuckDB re-derivation of rate_spikes over the transcripts CTE ``t``:
    identical dense timeline and the identical integer comparison, in
    HUGEINT (wider than the engine's int64 — the oracle can only be MORE
    exact). Epoch parity: DuckDB ``epoch(date_trunc('second', ts))`` ==
    Spark ``unix_timestamp(ts)`` (both truncate sub-second)."""
    k = trailing
    return (
        corpus_cte_sql
        + f""",
 counts AS (
   SELECT {group_col}, CAST(epoch(date_trunc('second', {ts_expr})) AS BIGINT)
          // {bucket_seconds} AS b, COUNT(*) AS n
   FROM t GROUP BY 1, 2),
 dense AS (
   SELECT {group_col}, unnest(generate_series(mn, mx)) AS b
   FROM (SELECT {group_col}, MIN(b) AS mn, MAX(b) AS mx FROM counts GROUP BY 1)),
 filled AS (
   SELECT d.{group_col}, d.b, COALESCE(c.n, 0) AS n
   FROM dense d LEFT JOIN counts c
     ON c.{group_col} = d.{group_col} AND c.b = d.b),
 win AS (
   SELECT {group_col}, b, n,
     SUM(n) OVER w AS s, SUM(n * n) OVER w AS q, COUNT(*) OVER w AS c
   FROM filled
   WINDOW w AS (PARTITION BY {group_col} ORDER BY b
                ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING))
 SELECT {group_col}, b * {bucket_seconds} AS bucket_start_epoch,
        CAST(n AS BIGINT) AS n_events, CAST(s AS BIGINT) AS trail_sum
 FROM win
 WHERE c = {k} AND s >= {min_baseline}
   AND ({k} * n - s) > 0
   AND ({k} * n - s)::HUGEINT * ({k} * n - s) * {k - 1}
       > {z * z * k}::HUGEINT * ({k} * q::HUGEINT - s::HUGEINT * s)"""
    )
