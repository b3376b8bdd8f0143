"""Token-budget training-mix allocation — turn "40% web / 30% books /
20% code / 10% reference BY TOKENS" into per-source sampling rates
derived from the corpus actually on disk, then apply them with the
repo's deterministic sampler.

The planning step every mix recipe needs between "target proportions"
and functions/sampling.py's "rates": proportions are over OUTPUT tokens,
but sources differ wildly in size, so the rates depend on measured
per-source token totals and on the binding constraint (no source can be
sampled above rate 1).

Semantics (all INTEGER arithmetic, re-derived verbatim by the DuckDB
gate oracle):
- token count per doc: ``size(split(text, ' '))`` (the text.py counting
  convention);
- feasible budget (when not given): the largest output size whose mix is
  achievable, B = min over targeted sources of
  ``tokens_s * 1000 div target_milli_s`` — the source that runs out
  first binds;
- desired tokens per source D_s = ``B * target_milli_s div 1000``; rate
  ``rate_milli_s = min(1000, 1000 * D_s div tokens_s)``;
- keep iff ``sample_key(id) < rate_milli * 2^32 div 1000`` — the
  threshold computed in pure integers (a float rate would double-round),
  the key the overflow-free Knuth hash shared with stratified_sample, so
  retries/resumes/oracles all keep identical rows;
- sources absent from ``targets_milli`` are DROPPED (explicit quotas,
  sampling.py's convention); a targeted source that is missing or empty
  raises, and an explicit budget past feasibility raises — no silent
  caps, ever (the repo-wide accounting discipline).

Scale shape: one aggregation measures per-source totals (driver state is
O(sources)); the apply step is a pure codegen filter at the scan —
sampled tokens then track ``rate * tokens_s`` by the law of large
numbers at 10^9 docs/source, while the ACCOUNTING (tokens_kept) is
always exact, so drift is observable, never assumed away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.sampling import _KEY_SPACE, sample_key


def measure_tokens(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> dict[str, int]:
    """Per-group total token counts (one aggregate job; O(groups) driver
    state)."""
    rows = (
        df.groupBy(group_col)
        .agg(F.sum(F.size(F.split(F.col(text_col), " "))).alias("t"))
        .collect()
    )
    return {r[group_col]: int(r["t"]) for r in rows}


def plan_token_mix(
    tokens_by_source: dict[str, int],
    targets_milli: dict[str, int],
    budget_tokens: int | None = None,
) -> dict:
    """Derive per-source rates from measured totals. Returns
    {"budget": B, "rates_milli": {source: r}, "desired": {source: D}}."""
    if not targets_milli or any(t <= 0 for t in targets_milli.values()):
        raise ValueError("targets_milli must be positive per source")
    if sum(targets_milli.values()) > 1000:
        raise ValueError(
            f"targets_milli sum to {sum(targets_milli.values())} > 1000"
        )
    missing = [
        s for s in targets_milli
        if tokens_by_source.get(s, 0) <= 0
    ]
    if missing:
        raise ValueError(
            f"targeted sources missing or empty in the corpus: {missing}"
        )
    feasible = min(
        tokens_by_source[s] * 1000 // tm for s, tm in targets_milli.items()
    )
    if budget_tokens is None:
        budget = feasible
    elif budget_tokens > feasible:
        raise ValueError(
            f"budget {budget_tokens} infeasible: the binding source "
            f"supports at most {feasible} output tokens at this mix"
        )
    else:
        budget = budget_tokens
    desired = {s: budget * tm // 1000 for s, tm in targets_milli.items()}
    rates = {
        s: min(1000, 1000 * desired[s] // tokens_by_source[s])
        for s in targets_milli
    }
    return {"budget": budget, "rates_milli": rates, "desired": desired}


def apply_token_mix(
    df: DataFrame,
    rates_milli: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic keep: sample_key(id) < rate_milli * 2^32 div 1000,
    thresholds in pure integer arithmetic (un-targeted sources drop)."""
    key = sample_key(F.col(id_col))
    thr = F.lit(0)
    for s, r in sorted(rates_milli.items()):
        thr = F.when(
            F.col(group_col) == s, F.lit(int(r) * _KEY_SPACE // 1000)
        ).otherwise(thr)
    return df.filter(key < thr)


def token_mix_report(
    df: DataFrame,
    targets_milli: dict[str, int],
    budget_tokens: int | None = None,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end accounting: (group, tokens_total, rate_milli, n_kept,
    tokens_kept) for every targeted source — the record a pipeline logs
    before materializing the mix."""
    spark = df.sparkSession
    totals = measure_tokens(df, group_col, text_col)
    plan = plan_token_mix(totals, targets_milli, budget_tokens)
    rates = plan["rates_milli"]
    kept = apply_token_mix(df, rates, group_col, id_col)
    kept_agg = kept.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("tokens_kept"),
    )
    plan_df = spark.createDataFrame(
        [(s, totals[s], rates[s]) for s in sorted(rates)],
        f"{group_col} string, tokens_total long, rate_milli long",
    )
    out = plan_df.join(kept_agg, group_col, "left")
    return out.select(
        group_col, "tokens_total", "rate_milli",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
    )


def token_mix_report_sql(
    table: str,
    targets_milli: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB re-derivation (derived-budget mode): same token counting,
    same integer budget/desired/rate chain, same Knuth-hash keep
    thresholds — bit-for-bit."""
    targets = ", ".join(
        f"('{s}', {int(tm)})" for s, tm in sorted(targets_milli.items())
    )
    return f"""
WITH tok AS (
  SELECT {group_col} AS g, {id_col} AS id,
         len(string_split({text_col}, ' ')) AS nt
  FROM {table}),
tot AS (SELECT g, CAST(SUM(nt) AS BIGINT) AS tokens_total FROM tok GROUP BY 1),
tgt(g, tm) AS (VALUES {targets}),
b AS (SELECT MIN(tokens_total * 1000 // tm) AS budget
      FROM tot JOIN tgt USING (g)),
rates AS (
  SELECT t.g, t.tokens_total,
         least(1000, 1000 * ((b.budget * tg.tm // 1000)) // t.tokens_total)
           AS rate_milli
  FROM tot t JOIN tgt tg USING (g) CROSS JOIN b),
keyed AS (
  SELECT g, id, nt,
    (((f % 65536) * 2654435761) % 4294967296
     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296 AS k
  FROM (SELECT g, id, nt, xor(id % 4294967296, id // 4294967296) AS f
        FROM tok)),
kept AS (
  SELECT k2.g, COUNT(*) AS n_kept, CAST(SUM(nt) AS BIGINT) AS tokens_kept
  FROM keyed k2 JOIN rates r USING (g)
  WHERE k2.k < r.rate_milli * 4294967296 // 1000
  GROUP BY 1)
SELECT r.g AS {group_col}, r.tokens_total,
       CAST(r.rate_milli AS BIGINT) AS rate_milli,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.tokens_kept, 0) AS tokens_kept
FROM rates r LEFT JOIN kept k USING (g)
"""
