"""DuckDB oracle generator for the hyperplane-LSH ANN query
(similarity.lsh_ann_topk) — the same move that gave simhash_pairs its
XXH64 oracle (oracles_xxh64.py): anything deterministic and seed-derived
can be re-derived in pure SQL, so "uses numpy-seeded hyperplanes" is not a
reason to stay rows-only.

Bit-exactness, not luck: every floating-point step is reproduced with the
IDENTICAL IEEE-754 double operation sequence Spark executes, so the oracle
needs no tolerance:

- the hyperplanes are literal doubles (repr() round-trips exactly);
- each projection is the unrolled LEFT-ASSOCIATED sum
  ``0.0 + e1*p1 + e2*p2 + ...`` — precisely the fold of Spark's
  ``F.aggregate(zip_with(...), lit(0.0), acc+v)`` (functions/similarity._dot),
  never DuckDB's ``list_dot_product`` (summation order unspecified there);
- bucket bits compare that sum ``>= 0`` and sum disjoint powers of two,
  matching ``shiftleft`` + xor;
- cosine is ``(1000000 * dot) / (norm_a * norm_b)`` with the same
  association and ``FLOOR`` as the engine's sim_micro.

The generated SQL is large (~150 KB: n_tables * n_planes * dim literal
terms) but trivially cheap at gate scale, and DuckDB parses it fine.
"""

from __future__ import annotations

from otel_logger_spark.functions.similarity import hyperplanes


def _dot_with_literals(vec_expr: str, plane: list[float]) -> str:
    """0.0 + CAST(vec[1] AS DOUBLE)*(p1) + ... — Spark's fold, unrolled."""
    terms = [
        f"CAST({vec_expr}[{i + 1}] AS DOUBLE)*({p!r})"
        for i, p in enumerate(plane)
    ]
    return "0.0 + " + " + ".join(terms)


def _dot_cols(a_expr: str, b_expr: str, dim: int) -> str:
    terms = [
        f"CAST({a_expr}[{i + 1}] AS DOUBLE)*CAST({b_expr}[{i + 1}] AS DOUBLE)"
        for i in range(dim)
    ]
    return "0.0 + " + " + ".join(terms)


def _bucket_expr(planes: list[list[float]], vec_expr: str) -> str:
    """CASE-per-bit sum of disjoint powers of two == shiftleft+xor."""
    bits = [
        f"CASE WHEN ({_dot_with_literals(vec_expr, p)}) >= 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    ]
    return " + ".join(bits)


def lsh_ann_topk_oracle(
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    k: int = 5,
    seed: int = 42,
    query_pred: str = "vec_id < 20",
) -> str:
    """Oracle for lsh_ann_topk(emb, emb.filter(query_pred), k, ...):
    (query_id, neighbor_id, sim_micro, rank). The query set is a subset of
    the corpus, so one bucket CTE serves both join sides."""
    per_table = [
        f"SELECT vec_id, {t} AS tbl, "
        f"{_bucket_expr(hyperplanes(dim, n_planes, seed + 1000 * t), 'embedding')}"
        " AS bucket FROM embeddings"
        for t in range(n_tables)
    ]
    buckets_sql = "\n  UNION ALL ".join(per_table)
    dot_cq = _dot_cols("ce.embedding", "qe.embedding", dim)
    norm = _dot_cols("embedding", "embedding", dim)
    return f"""
WITH cb AS (
  {buckets_sql}
),
norms AS (SELECT vec_id, SQRT({norm}) AS nrm FROM embeddings),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM cb c JOIN cb q ON c.tbl = q.tbl AND c.bucket = q.bucket
  WHERE q.{query_pred} AND c.vec_id != q.vec_id),
s AS (
  SELECT query_id, neighbor_id,
    CAST(FLOOR((1000000 * ({dot_cq})) / (cn.nrm * qn.nrm)) AS BIGINT) AS sim_micro
  FROM cand
  JOIN embeddings ce ON ce.vec_id = neighbor_id
  JOIN embeddings qe ON qe.vec_id = query_id
  JOIN norms cn ON cn.vec_id = neighbor_id
  JOIN norms qn ON qn.vec_id = query_id)
SELECT query_id, neighbor_id, sim_micro, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) AS rank
  FROM s)
WHERE rank <= {k}
"""
