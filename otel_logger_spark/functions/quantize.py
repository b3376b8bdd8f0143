"""Int8 embedding quantization — the memory-scale ANN path: a float32
vector costs 4 bytes/dim, its uint8 code 1 byte/dim, so a 100 TB
embedding corpus becomes 25 TB before any index is built, and the
re-rank distance becomes pure int64 arithmetic.

Scheme (scalar quantization, per-dimension global ranges):
- measure per-dimension (min, max) over the corpus — ONE aggregate job
  (2*D codegen aggregates), O(D) driver state;
- code_i = clamp(floor((v_i - mn_i) * 255.0 / span_i), 0, 255) with
  span_i = max_i - min_i (1.0 when the dimension is constant). The
  float subtract/multiply/divide are per-element IEEE double ops with
  the SAME literals and the SAME association in Spark and DuckDB, so —
  like oracles_lsh.py's hyperplane sums — the codes are bit-exactly
  reproducible across engines;
- quantized distance: sum_i (qa_i - qb_i)^2, pure integer (bounded by
  D * 255^2 — int64-safe through D ~ 1.4e14), order-independent, so the
  fold needs no association discipline at all.

Semantics note (documented, not hidden): quantized-L2 top-k is its OWN
ranking — an approximation of float-L2 whose error is bounded by the
quantization step per dimension — and the gate oracles exactly THAT
ranking, deterministically (distance asc, neighbor id tiebreak). The
float cosine path (functions/similarity.py) remains the exact reference.

Scale shape: the code projection is per-row codegen; top-k broadcasts
the (tiny) query side against the corpus exactly like cosine_topk, and
at full scale the codes feed the SAME bucketed-LSH / IVF candidate
pruning — this module shrinks the bytes those paths move by 4x.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def measure_ranges(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[tuple[float, float]]:
    """Per-dimension (min, max) in one aggregate job."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty corpus: cannot measure ranges")
        dim = int(first["d"])
    aggs = []
    for i in range(dim):
        aggs.append(F.min(F.col(vec_col)[i].cast("double")).alias(f"mn{i}"))
        aggs.append(F.max(F.col(vec_col)[i].cast("double")).alias(f"mx{i}"))
    row = df.agg(*aggs).first()
    return [(float(row[f"mn{i}"]), float(row[f"mx{i}"])) for i in range(dim)]


def quantize_expr(
    vec_col: str, ranges: list[tuple[float, float]]
) -> Column:
    """array<int> of uint8 codes for ``vec_col`` under ``ranges``."""
    cols = []
    for i, (mn, mx) in enumerate(ranges):
        span = (mx - mn) if mx > mn else 1.0
        v = F.col(vec_col)[i].cast("double")
        code = F.floor((v - F.lit(mn)) * F.lit(255.0) / F.lit(span))
        cols.append(
            F.greatest(F.lit(0), F.least(F.lit(255), code)).cast("int")
        )
    return F.array(*cols)


def with_quantized(
    df: DataFrame,
    ranges: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    return df.withColumn(out_col, quantize_expr(vec_col, ranges))


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ranges: list[tuple[float, float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query under quantized L2 (self excluded):
    (query_id, neighbor_id, qdist, rank) — qdist integer-exact, rank by
    (qdist asc, neighbor_id asc). Query side broadcasts; the corpus
    never shuffles (TakeOrderedAndProject after the rank window)."""
    from pyspark.sql import Window

    c = with_quantized(corpus, ranges, vec_col, "_cq").select(
        F.col(id_col).alias("neighbor_id"), "_cq"
    )
    q = with_quantized(queries, ranges, vec_col, "_qq").select(
        F.col(id_col).alias("query_id"), "_qq"
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # zip_with fold, NOT an unrolled per-index sum: element access on the
    # projected code array makes the optimizer inline the whole D-element
    # quantize expression per term (O(D^2) tree, the documented
    # projection-collapse trap — measured 1.6x slower even behind a
    # spark_partition_id barrier). Gate-scale wall time is Catalyst
    # compilation either way; at data scale the fold runs once per pair.
    dist = F.expr(
        "aggregate(zip_with(_cq, _qq, (a, b) -> CAST((a - b) * (a - b) "
        "AS BIGINT)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdist").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("qdist", dist)
        .select("query_id", "neighbor_id", "qdist")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        # long, matching the oracle's ROW_NUMBER (the gate compares dtypes)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def quantized_topk_sql(
    table: str,
    query_pred: str,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB re-derivation: ranges from the SAME min/max aggregates
    (float min/max of identical data is bit-identical), codes from the
    SAME left-associated double expression, distance in BIGINT."""
    rg = ", ".join(
        f"MIN(CAST({vec_col}[{i + 1}] AS DOUBLE)) AS mn{i}, "
        f"MAX(CAST({vec_col}[{i + 1}] AS DOUBLE)) AS mx{i}"
        for i in range(dim)
    )
    code = ", ".join(
        f"GREATEST(0, LEAST(255, CAST(FLOOR((CAST({vec_col}[{i + 1}] AS DOUBLE)"
        f" - mn{i}) * 255.0 / (CASE WHEN mx{i} > mn{i} THEN mx{i} - mn{i}"
        f" ELSE 1.0 END)) AS BIGINT)))"
        for i in range(dim)
    )
    dsum = " + ".join(f"(c.q[{i + 1}] - q.q[{i + 1}]) * (c.q[{i + 1}] - q.q[{i + 1}])"
                      for i in range(dim))
    return f"""
WITH rg AS (SELECT {rg} FROM {table}),
coded AS (SELECT {id_col}, [{code}] AS q FROM {table}, rg),
c AS (SELECT {id_col} AS neighbor_id, q FROM coded),
q AS (SELECT {id_col} AS query_id, q FROM coded
      WHERE {id_col} IN (SELECT {id_col} FROM {table} WHERE {query_pred})),
s AS (SELECT q.query_id, c.neighbor_id, CAST({dsum} AS BIGINT) AS qdist
      FROM c, q WHERE c.neighbor_id != q.query_id)
SELECT query_id, neighbor_id, qdist, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY qdist ASC, neighbor_id ASC) AS rank
  FROM s) WHERE rank <= {k}
"""
