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
independent of event volume. Domain bound for int64 exactness:
z^2 * k^2 * (k-1) * n_max^2 < 2^63, e.g. ~2.5e6 events per bucket per
group at the defaults (z=3, k=24) — shrink ``bucket_seconds`` or add
group columns well before that (documented, mirrors sampling.py's
overflow discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rate_spikes(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z: int = 3,
    min_baseline: int = 0,
) -> DataFrame:
    """Flag (group, bucket) pairs whose event count exceeds the trailing
    ``trailing``-bucket mean by >= ``z`` sample standard deviations.
    Requires a FULL trailing history (the first ``trailing`` buckets of
    each group never flag). Returns
    (*group_cols, bucket_start_epoch, n_events, trail_sum) — all
    integer-typed, ascending-deterministic."""
    if trailing < 2:
        raise ValueError(f"trailing must be >= 2 (sample std): {trailing}")
    g = list(group_cols)
    k = trailing
    bucket = F.expr(f"unix_timestamp({ts_col}) DIV {bucket_seconds}")
    counts = (
        df.select(*g, bucket.alias("_b"))
        .groupBy(*g, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    dense = (
        counts.groupBy(*g)
        .agg(F.min("_b").alias("_mn"), F.max("_b").alias("_mx"))
        .select(*g, F.explode(F.sequence("_mn", "_mx")).alias("_b"))
    )
    filled = dense.join(counts, [*g, "_b"], "left").select(
        *g, "_b", F.coalesce("_n", F.lit(0)).alias("_n")
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
