"""Count-min sketch — bounded-memory per-key frequency estimation and
heavy-hitter detection, the counting counterpart to HLL's cardinality
(queries_extra.approx_distinct).

At 100 TB an exact per-key count is a full groupBy of every key; a CMS
is ``d x w`` integers however many keys exist, merges by cell-wise
addition (partition partials, micro-batches, daily sketches all compose),
and answers point queries with a one-sided guarantee:
``exact <= estimate <= exact + eps * N`` with probability 1 - delta at
w = ceil(e/eps), d = ceil(ln 1/delta). The canonical uses this engine
needs it for: hot-join-key detection feeding the salting path
(operators/skew.py) and per-key rate limits over streams.

Semantics (re-derived bit-for-bit by the DuckDB gate oracle):
- row ``i`` of the sketch hashes ``key || chr(30) || i`` with Spark's
  ``xxhash64`` (seed 42) — one hash family, row index mixed into the
  input, so the DuckDB XXH64 CTE chain (oracles_xxh64.py) replays it
  exactly;
- ``w`` must be a power of two: the bucket is the hash's low bits
  (``& (w-1)``), identical on Spark's SIGNED int64 and the oracle's
  unsigned u64 because 2^64 ≡ 0 (mod w) — a non-power-of-two w would
  make the two renderings disagree on negative hashes;
- the estimate for a key is the MIN over its d cells (0 when a cell is
  empty); NULL keys are excluded (filtered, documented).

Scale shape (pinned by tests/test_cms.py):
- the sketch is ONE aggregation: explode d rows per input (a projection)
  -> groupBy (row, bucket) with full map-side partials -> at most d*w
  cells, whatever N is. Raw keys cross no other operator;
- estimates broadcast the d*w-cell sketch against the candidate keys —
  no shuffle of the candidate side;
- ``cms_merge`` is union + sum over (row, bucket): sketches from
  different partitions/days/streams compose exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RS = "\x1e"  # record separator between key and row index

DEFAULT_D = 4
DEFAULT_W = 512


def _check_w(w: int) -> None:
    if w < 2 or (w & (w - 1)) != 0:
        raise ValueError(
            f"w must be a power of two >= 2 (got {w}): the bucket is the "
            "hash's low bits, and signed/unsigned renderings only agree "
            "mod a power of two"
        )


def _bucket_expr(key_col: str, row_col: str, w: int):
    return F.expr(
        f"xxhash64(concat({key_col}, '{_RS}', cast({row_col} as string)))"
        f" & {w - 1}"
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """The sketch as a tiny DataFrame (row int, bucket long, cnt long) —
    at most d*w cells. NULL keys are excluded."""
    _check_w(w)
    if d < 1:
        raise ValueError("d must be >= 1")
    rows = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("_k"),
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
        )
    )
    return (
        rows.groupBy("row", _bucket_expr("_k", "row", w).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the composition law that makes per-partition,
    per-day and per-micro-batch sketches add up exactly."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Point estimates for a candidate key set: (key_col, est) with
    est = min over the key's d cells, 0 for never-seen keys. The sketch
    (<= d*w cells) broadcasts; the candidate side never shuffles."""
    _check_w(w)
    cand = (
        keys.filter(F.col(key_col).isNotNull())
        .select(F.col(key_col).cast("string").alias(key_col))
        .distinct()
        .select(
            key_col,
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("row"),
        )
        .withColumn("bucket", _bucket_expr(key_col, "row", w))
    )
    joined = cand.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Keys whose CMS estimate reaches ``threshold`` — a SUPERSET of the
    true heavy hitters (one-sided overcount), which is the useful
    direction for skew guards: a hot key is never missed. Returns
    (key_col, est)."""
    sketch = cms_sketch(df, key_col, d, w)
    return cms_estimate(sketch, df.select(key_col), key_col, d, w).filter(
        F.col("est") >= threshold
    )


def skew_advisor(
    df: DataFrame,
    key_col: str,
    rows_per_task: int,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Pre-join skew report: keys whose (one-sided, never-undercounting)
    CMS estimate exceeds ``rows_per_task``, with the salt factor the
    salted two-phase path (operators/skew.py) would need to split them:
    ``salt = ceil(est / rows_per_task)``. Because the estimate only
    overcounts, a hot key is never missed — the failure mode of a
    sampled key histogram — at the cost of an occasional cold key
    salted harmlessly. One sketch aggregation + a broadcast estimate:
    the diagnosis costs no full groupBy of the join key."""
    if rows_per_task < 1:
        raise ValueError("rows_per_task must be >= 1")
    sketch = cms_sketch(df, key_col, d, w)
    est = cms_estimate(sketch, df.select(key_col), key_col, d, w)
    # ceil(est / rows_per_task): Spark's `div` truncates toward zero, so
    # -(-est div N) is FLOOR for positive est (round-7 advisor) — the
    # add-then-divide form is the actual ceiling
    return est.filter(F.col("est") > rows_per_task).select(
        key_col,
        "est",
        F.expr(
            f"CAST((est + {rows_per_task - 1}) div {rows_per_task} AS INT)"
        ).alias("salt"),
    )


def cms_counts_sql(
    keys_cte: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> str:
    """DuckDB re-derivation of sketch + estimate + exact over a CTE
    ``{keys_cte}(k)``: per-row XXH64 of k || chr(30) || i, low-bits
    bucket, cell counts, min-over-rows estimate, exact GROUP BY —
    returning (k, est, exact). Appends to a caller-supplied WITH chain."""
    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    return f"""
 , rowsx AS (
   SELECT k, i, k || chr(30) || CAST(i AS VARCHAR) AS tok
   FROM {keys_cte}, LATERAL (SELECT unnest(range({d})) AS i)),
 vocab AS (SELECT DISTINCT tok FROM rowsx),{xxh64_ctes()},
 hashed AS (
   SELECT r.k, r.i, CAST(h.h64 % {w}::UHUGEINT AS BIGINT) AS bucket
   FROM rowsx r JOIN hashes h USING (tok)),
 cells AS (
   SELECT i, bucket, COUNT(*) AS cnt FROM hashed GROUP BY i, bucket),
 est AS (
   SELECT hk.k, MIN(c.cnt) AS est
   FROM (SELECT DISTINCT k, i, bucket FROM hashed) hk
   JOIN cells c ON c.i = hk.i AND c.bucket = hk.bucket
   GROUP BY hk.k),
 exact AS (SELECT k, COUNT(*) AS exact FROM {keys_cte} GROUP BY k)
 SELECT e.k, CAST(e.est AS BIGINT) AS est, CAST(x.exact AS BIGINT) AS exact
 FROM est e JOIN exact x USING (k)
"""
