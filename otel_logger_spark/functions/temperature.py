"""Temperature-based source mixing — multinomial alpha-sampling of
training sources, the standard low-resource up-weighting recipe
(Lample & Conneau 2019 arXiv:1901.07291 §3.1; XLM-R arXiv:1911.02116;
mT5 arXiv:2010.11934 uses alpha=0.3): sample source s with probability
p_s proportional to n_s^alpha, so alpha=1 is proportional sampling and
alpha -> 0 approaches uniform, boosting small sources.

Where mixer.py's token_mix takes EXPLICIT target proportions, this
operator DERIVES them from measured corpus statistics — the planning
step a multilingual / multi-source pretraining mix runs first.

Exact-integer discipline (the repo-wide oracle contract): alpha is
restricted to {1, 1/2, 1/4}, whose weights are computable in pure
integer arithmetic via floor-isqrt (corrected double sqrt — sqrt is
IEEE correctly-rounded on both engines, and the two integer
corrections make the floor exact regardless). A float n^0.3 would
round differently across engines; we trade alpha generality for
bit-reproducible quotas. Weight definitions (t = per-source token
total, capped at MAX_TOKENS so every product below stays inside
int64):

- alpha=1:    w = t
- alpha=1/2:  w = isqrt(t * 10^6)            (~ sqrt(t) * 1000)
- alpha=1/4:  w = isqrt(isqrt(t * 10^6) * 10^6)   (~ t^0.25 * 31623)

Shares and quotas are largest-remainder allocations under a TOTAL
order (remainder DESC, source ASC), so Sum(share)=10^6 and
Sum(quota)=budget EXACTLY and the plan is deterministic in any engine:

  share_micro_s = (10^6 * w_s) div W   (+1 to the R largest remainders)
  quota_s       = (B * share_micro_s) div 10^6   (+1 to the L largest)
  rate_milli_s  = min(1000, (1000 * quota_s) div t_s)

The keep rule is the shared overflow-free Knuth-hash threshold
(sampling.sample_key), so engine, oracle, retries and resumes keep
identical rows. rate is capped at 1000 — no replacement; a small
source whose quota exceeds its size shows quota > tokens_kept in the
report instead of silently borrowing (the no-silent-caps discipline).

Scale shape (100 TB): ONE aggregation reduces the corpus to an
O(sources) frame; all planning windows run on that tiny frame (a
single-partition window over ~10^3 rows, not data); the apply step is
a broadcast join of the plan frame plus a codegen filter at the scan —
document text never shuffles, and unlike mixer.measure_tokens there is
no driver-side collect anywhere in the chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from otel_logger_spark.functions.sampling import _KEY_SPACE, sample_key

# isqrt(t * 10^6) must stay in int64: t <= 9*10^12 keeps t*10^6 within
# 9*10^18 < 2^63-1 and (isqrt+1)^2 within range for the correction.
MAX_TOKENS_PER_SOURCE = 9_000_000_000_000

ALPHAS = ("1", "0.5", "0.25")

_MICRO = 1_000_000


# floor(sqrt(2^63 - 1)): s0 is clamped here so both correction squares
# below stay inside int64 for ANY non-negative int64 input.
_ISQRT_CAP = 3_037_000_499


def _isqrt(x: Column) -> Column:
    """Exact floor(sqrt(x)) for any int64 x >= 0: hardware sqrt is
    within 1 ulp, so one correction in each direction pins the integer
    floor — identical on any IEEE engine. s0 is clamped to
    isqrt(2^63-1) and the upward probe only evaluates below the clamp
    (nested WHEN, guaranteed-lazy), so no intermediate overflows under
    ANSI mode."""
    cap = F.lit(_ISQRT_CAP)
    s0 = F.least(F.floor(F.sqrt(x.cast("double"))).cast("long"), cap)
    s1 = s0 - F.when(s0 * s0 > x, F.lit(1)).otherwise(F.lit(0))
    up = F.when(s1 < cap, (s1 + 1) * (s1 + 1) <= x).otherwise(F.lit(False))
    return s1 + F.when(up, F.lit(1)).otherwise(F.lit(0))


def _weight(tokens: Column, alpha: str) -> Column:
    guard = F.when(
        tokens > MAX_TOKENS_PER_SOURCE,
        F.raise_error(F.concat(
            F.lit(f"temperature_mix: tokens_total exceeds {MAX_TOKENS_PER_SOURCE} "
                  "for a source; shard the weight computation: "),
            tokens.cast("string"),
        )),
    )
    if alpha == "1":
        w = tokens
    elif alpha == "0.5":
        w = _isqrt(tokens * _MICRO)
    elif alpha == "0.25":
        w = _isqrt(_isqrt(tokens * _MICRO) * _MICRO)
    else:
        raise ValueError(f"alpha must be one of {ALPHAS}: {alpha!r}")
    return guard.otherwise(w)


def temperature_mix_report(
    df: DataFrame,
    budget_tokens: int,
    alpha: str = "0.5",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, tokens_total, weight, share_micro, quota_tokens,
    rate_milli, n_kept, tokens_kept): the full temperature-mix plan plus
    the exact accounting of the rows the deterministic sampler keeps."""
    if budget_tokens < 1 or budget_tokens > MAX_TOKENS_PER_SOURCE:
        raise ValueError(
            f"budget_tokens must be in [1, {MAX_TOKENS_PER_SOURCE}]: "
            f"{budget_tokens}"
        )
    if alpha not in ALPHAS:
        raise ValueError(f"alpha must be one of {ALPHAS}: {alpha!r}")
    n_tok = F.size(F.split(F.col(text_col), " "))
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("tokens_total"),
    )
    # planning windows: the frame is O(sources) rows — a deliberate
    # single-partition window over the AGGREGATE, never over data.
    # All divisions are Spark SQL's integral `div` (double `/` + floor
    # double-rounds above 2^53 and would diverge from the oracle's `//`).
    all_w = Window.partitionBy()
    agg = agg.withColumn("weight", _weight(F.col("tokens_total"), alpha))
    agg = (
        agg.withColumn("_W", F.sum("weight").over(all_w))
        .withColumn("_snum", F.lit(_MICRO) * F.col("weight"))
        .withColumn("_share0", F.expr("_snum div _W"))
        .withColumn("_srem", F.expr("_snum % _W"))
    )
    srank = Window.partitionBy().orderBy(
        F.col("_srem").desc(), F.col(group_col).asc()
    )
    sleft = F.lit(_MICRO) - F.sum("_share0").over(all_w)
    agg = agg.withColumn(
        "share_micro",
        F.col("_share0")
        + F.when(F.row_number().over(srank) <= sleft, 1).otherwise(0),
    )
    b = F.lit(int(budget_tokens))
    agg = (
        agg.withColumn("_qnum", b * F.col("share_micro"))
        .withColumn("_quota0", F.expr(f"_qnum div {_MICRO}"))
        .withColumn("_qrem", F.expr(f"_qnum % {_MICRO}"))
    )
    qrank = Window.partitionBy().orderBy(
        F.col("_qrem").desc(), F.col(group_col).asc()
    )
    qleft = b - F.sum("_quota0").over(all_w)
    agg = agg.withColumn(
        "quota_tokens",
        F.col("_quota0")
        + F.when(F.row_number().over(qrank) <= qleft, 1).otherwise(0),
    )
    agg = agg.withColumn(
        "rate_milli",
        F.when(F.col("tokens_total") <= 0, F.lit(0))
        .otherwise(
            F.expr("least(1000L, (1000 * quota_tokens) div tokens_total)")
        )
        .cast("long"),
    )
    plan = agg.select(
        group_col, "n_docs", "tokens_total", "weight",
        "share_micro", "quota_tokens", "rate_milli",
    )
    kept = (
        df.join(
            F.broadcast(plan.select(group_col, "rate_milli")), group_col
        )
        .filter(
            sample_key(F.col(id_col))
            < F.expr(f"(rate_milli * {_KEY_SPACE}L) div 1000")
        )
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(n_tok).alias("tokens_kept"),
        )
    )
    out = plan.join(kept, group_col, "left")
    return out.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens_total").cast("long").alias("tokens_total"),
        F.col("weight").cast("long").alias("weight"),
        F.col("share_micro").cast("long").alias("share_micro"),
        F.col("quota_tokens").cast("long").alias("quota_tokens"),
        "rate_milli",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("tokens_kept", F.lit(0)).cast("long").alias("tokens_kept"),
    )


def apply_temperature_mix(
    df: DataFrame,
    budget_tokens: int,
    alpha: str = "0.5",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``df`` the plan keeps (schema unchanged): broadcast the
    O(sources) plan frame, filter on the shared Knuth key at the scan."""
    plan = temperature_mix_report(
        df, budget_tokens, alpha, group_col, id_col, text_col
    ).select(group_col, "rate_milli")
    keep = (
        sample_key(F.col(id_col))
        < F.expr(f"(rate_milli * {_KEY_SPACE}L) div 1000")
    )
    return (
        df.join(F.broadcast(plan), group_col)
        .filter(keep)
        .select(*df.columns)  # USING-join puts the key first; restore order
    )


def _isqrt_sql(x: str) -> str:
    """The DuckDB rendering of _isqrt — same corrected double sqrt with
    the same int64-edge clamp and lazily-guarded upward probe."""
    s0 = f"LEAST(CAST(FLOOR(SQRT(CAST(({x}) AS DOUBLE))) AS BIGINT), {_ISQRT_CAP})"
    s1 = f"({s0} - CASE WHEN {s0}*{s0} > ({x}) THEN 1 ELSE 0 END)"
    up = (f"CASE WHEN {s1} < {_ISQRT_CAP} "
          f"THEN ({s1}+1)*({s1}+1) <= ({x}) ELSE FALSE END")
    return f"({s1} + CASE WHEN {up} THEN 1 ELSE 0 END)"


def _weight_sql(t: str, alpha: str) -> str:
    if alpha == "1":
        return t
    if alpha == "0.5":
        return _isqrt_sql(f"({t}) * {_MICRO}")
    if alpha == "0.25":
        return _isqrt_sql(f"{_isqrt_sql(f'({t}) * {_MICRO}')} * {_MICRO}")
    raise ValueError(f"alpha must be one of {ALPHAS}: {alpha!r}")


def temperature_mix_report_sql(
    table: str,
    budget_tokens: int,
    alpha: str = "0.5",
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB re-derivation: identical token counting, weight function,
    largest-remainder chains and Knuth-hash keep thresholds."""
    w = _weight_sql("tokens_total", alpha)
    b = int(budget_tokens)
    return f"""
WITH tok AS (
  SELECT {group_col} AS g, {id_col} AS id,
         len(string_split({text_col}, ' ')) AS nt
  FROM {table}),
agg AS (
  SELECT g, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS tokens_total
  FROM tok GROUP BY 1),
wts AS (
  SELECT *, CAST({w} AS BIGINT) AS weight FROM agg),
w1 AS (
  SELECT *, SUM(weight) OVER () AS wsum FROM wts),
w2 AS (
  SELECT *, ({_MICRO} * weight) // wsum AS share0,
            ({_MICRO} * weight) % wsum AS srem
  FROM w1),
w3 AS (
  SELECT *, {_MICRO} - SUM(share0) OVER () AS sleft,
    ROW_NUMBER() OVER (ORDER BY srem DESC, g ASC) AS srnk
  FROM w2),
shares AS (
  SELECT *, share0 + CASE WHEN srnk <= sleft THEN 1 ELSE 0 END AS share_micro
  FROM w3),
q1 AS (
  SELECT *, ({b} * share_micro) // {_MICRO} AS quota0,
            ({b} * share_micro) % {_MICRO} AS qrem
  FROM shares),
q2 AS (
  SELECT *, {b} - SUM(quota0) OVER () AS qleft,
    ROW_NUMBER() OVER (ORDER BY qrem DESC, g ASC) AS qrnk
  FROM q1),
quotas AS (
  SELECT *, quota0 + CASE WHEN qrnk <= qleft THEN 1 ELSE 0 END AS quota_tokens
  FROM q2),
plan AS (
  SELECT g, n_docs, tokens_total, weight, share_micro, quota_tokens,
    CASE WHEN tokens_total <= 0 THEN 0
         ELSE least(1000, (1000 * quota_tokens) // tokens_total)
    END AS rate_milli
  FROM quotas),
keyed AS (
  SELECT g, id, nt,
    (((f % 65536) * 2654435761) % 4294967296
     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296 AS k
  FROM (SELECT g, id, nt, xor(id % 4294967296, id // 4294967296) AS f
        FROM tok)),
kept AS (
  SELECT k2.g, COUNT(*) AS n_kept, CAST(SUM(nt) AS BIGINT) AS tokens_kept
  FROM keyed k2 JOIN plan p USING (g)
  WHERE k2.k < p.rate_milli * {_KEY_SPACE} // 1000
  GROUP BY 1)
SELECT p.g AS {group_col},
  CAST(p.n_docs AS BIGINT) AS n_docs, p.tokens_total,
  CAST(p.weight AS BIGINT) AS weight,
  CAST(p.share_micro AS BIGINT) AS share_micro,
  CAST(p.quota_tokens AS BIGINT) AS quota_tokens,
  CAST(p.rate_milli AS BIGINT) AS rate_milli,
  COALESCE(k.n_kept, 0) AS n_kept,
  COALESCE(k.tokens_kept, 0) AS tokens_kept
FROM plan p LEFT JOIN kept k USING (g)
"""
