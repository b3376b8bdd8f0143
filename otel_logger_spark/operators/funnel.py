"""Funnel analysis — how many users complete each prefix of an ordered
step sequence (view -> click -> purchase), with a bound on the gap
between consecutive steps.

The classic product/log-analytics question over an event stream, and a
genuinely order-dependent operator: a user who purchases BEFORE clicking
has not converted. Semantics (greedy earliest-match, the standard funnel
definition, re-derived verbatim by the DuckDB gate oracle):

- a user's events are taken in (ts, event_type) order — the type
  tiebreak makes simultaneous events deterministic in both engines;
- the funnel advances to step k+1 at the FIRST event with the right
  type after step k matched, provided the gap from the PREVIOUS match
  is <= ``max_gap_seconds`` (no gap bound on step 0). Greedy matching is
  optimal for "did the user reach step k" with a per-transition gap
  bound: taking the earliest possible step-k match never hurts a later
  transition? It CAN — a later step-k event might leave a smaller gap —
  so greedy is not "reached if any assignment works"; it is its own,
  deterministic, industry-standard semantic, and the oracle replays
  exactly it;
- output: one row per funnel prefix, (step_idx, step, n_users) with
  n_users = users whose greedy match reached at least that step.

Scale shape (one shuffle): groupBy user collects (epoch, type) structs,
array_sort + a codegen aggregate() fold walk each user's history — no
Python, no window over the raw stream, state O(1) per user. Timestamps
fold as epoch seconds (exact integers). A pathological user with
millions of events makes one big array; bound upstream with a per-user
event cap if the source allows it (documented, matching the coalescer's
hot-conversation guard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int = 86400,
) -> DataFrame:
    """(step_idx, step, n_users) for each funnel prefix; n_users is
    monotone non-increasing by construction."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct: {steps}")
    if max_gap_seconds < 0:
        raise ValueError("max_gap_seconds must be >= 0")
    spark = df.sparkSession
    ev = df.select(
        F.col(user_col).alias("_u"),
        F.struct(
            F.unix_timestamp(F.col(ts_col)).alias("ep"),
            F.col(type_col).alias("t"),
        ).alias("_e"),
    ).filter(F.col("_e.ep").isNotNull() & F.col("_e.t").isNotNull())
    per_user = ev.groupBy("_u").agg(
        F.array_sort(F.collect_list("_e")).alias("_h")
    )
    # greedy fold: acc = (stage, ts of last matched step)
    step_case = " ".join(
        f"WHEN acc.stage = {i} AND x.t = '{s}' THEN "
        f"named_struct('stage', {i + 1}, 'last', x.ep)"
        for i, s in enumerate(steps)
    )
    fold = (
        "aggregate(_h, named_struct('stage', 0, 'last', CAST(0 AS BIGINT)), "
        "(acc, x) -> CASE "
        # gap check first: an event that WOULD advance but arrives too
        # late after the previous match simply doesn't advance
        f"WHEN acc.stage > 0 AND acc.stage < {len(steps)} "
        f"AND x.t = element_at(array({', '.join(repr(s) for s in steps)}), acc.stage + 1) "
        f"AND x.ep - acc.last > {int(max_gap_seconds)} THEN acc "
        + step_case
        + " ELSE acc END).stage"
    )
    reached = per_user.select(F.expr(fold).alias("_stage"))
    counts = reached.groupBy("_stage").agg(F.count(F.lit(1)).alias("_n"))
    # prefix counts as a pure DF op (round 7: the collect+createDataFrame
    # round trip is gone): each funnel prefix joins every stage count it
    # subsumes — a broadcast >= join of one K-row literal relation
    # against <= K+1 aggregated rows, so the "loop" is data-parallel and
    # the query plan has no driver synchronization point
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step_idx int, step string",
    )
    return (
        F.broadcast(steps_df)
        .join(counts, counts["_stage"] >= steps_df["step_idx"], "left")
        .groupBy("step_idx", "step")
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_users"))
    )


def funnel_counts_sql(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int = 86400,
) -> str:
    """DuckDB re-derivation: same (epoch, type) sort, same greedy
    gap-bounded fold, same prefix counting. DuckDB's list_reduce needs a
    SAME-TYPE accumulator (the oracles_xxh64.py limitation), so after
    sorting by the (ep, t) struct the fold runs over BIGINTs: each event
    encodes as step_code * 2^44 + epoch (code = 1-based position in
    ``steps``, 0 = not a step; epochs < 2^44 hold until year ~559444),
    and the accumulator as stage * 2^44 + last_matched_epoch — the
    decode/advance rules are then EXACTLY the Spark fold's."""
    two44 = 1 << 44
    code_case = " ".join(
        f"WHEN x['t'] = '{s}' THEN {i + 1}" for i, s in enumerate(steps)
    )
    prefix_rows = ", ".join(f"({i + 1}, '{s}')" for i, s in enumerate(steps))
    return f"""
WITH ev AS (
  SELECT {user_col} AS u,
         {{'ep': CAST(epoch(date_trunc('second', {ts_col})) AS BIGINT),
           't': {type_col}}} AS e
  FROM {table}
  WHERE {ts_col} IS NOT NULL AND {type_col} IS NOT NULL),
hist AS (
  SELECT u,
         list_transform(
           list_sort(list(e)),
           x -> (CASE {code_case} ELSE 0 END) * {two44}::BIGINT + x['ep']
         ) AS h
  FROM ev GROUP BY u),
folded AS (
  SELECT u, list_reduce(
    list_prepend(CAST(0 AS BIGINT), h),
    (acc, x) -> CASE
      WHEN x // {two44} = acc // {two44} + 1
           AND (acc // {two44} = 0
                OR x % {two44} - acc % {two44} <= {int(max_gap_seconds)})
      THEN (acc // {two44} + 1) * {two44}::BIGINT + x % {two44}
      ELSE acc END) // {two44} AS stage
  FROM hist),
prefixes(step_idx, step) AS (VALUES {prefix_rows})
SELECT p.step_idx, p.step,
       CAST((SELECT COUNT(*) FROM folded f WHERE f.stage >= p.step_idx)
            AS BIGINT) AS n_users
FROM prefixes p
"""
