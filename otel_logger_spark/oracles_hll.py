"""DuckDB oracle for Spark's ``approx_count_distinct`` (HyperLogLog++) in
its small-cardinality regime — the last no-oracle gate goes green.

Spark's HLL++ is fully deterministic given the input values, so "an
approximation" is not "engine-specific noise": at relativeSD 0.05 the
sketch has p = ceil(2*log2(1.106/0.05)) = 9 -> m = 512 registers, register
index = the TOP p BITS of XXH64(value, seed 42), and whenever any register
is untouched the estimator takes the LINEAR COUNTING branch

    estimate = Math.round(m * ln(m / V)),   V = count of zero registers.

A register is zero iff no value hashed into it, so V needs only the
DISTINCT top-9-bit patterns — no rho/max machinery — and the whole
estimate is expressible over the repo's bit-exact DuckDB XXH64
(oracles_xxh64.xxh64_ctes). Empirically pinned against Spark in
tests/test_extra_queries.py: exact match for cardinalities 1..~1200 per
group; the bias-corrected branch (which needs the HLL++ empirical bias
tables) starts around n > 2.5*m ~ 1280, far above the sf0.01 gate's ~150
conversations per role. Outside the linear regime the SQL fails loudly
(FLOOR(inf) cast error on V = 0) rather than approximating the
approximation.

``Math.round`` is floor(x + 0.5) for the positive doubles here, written
exactly that way rather than DuckDB's half-away-from-zero ROUND.
"""

from __future__ import annotations

from otel_logger_spark.oracles_xxh64 import xxh64_ctes

_P = 9
_M = 1 << _P
_SHIFT = 1 << (64 - _P)


def approx_distinct_by_role_oracle(corpus_cte_sql: str) -> str:
    """Oracle for groupBy(role).agg(approx_count_distinct(conv_id),
    countDistinct(conv_id)) over the transcripts CTE ``t``:
    (role, approx_convs, exact_convs) — BOTH columns re-derived, the
    approximate one bit-for-bit via the register-index hash."""
    return (
        corpus_cte_sql
        + """
 , keys AS (SELECT DISTINCT role, conv_id FROM t),
 vocab AS (SELECT DISTINCT conv_id AS tok FROM keys),"""
        + xxh64_ctes()
        + f""",
 regs AS (
   SELECT k.role, k.conv_id, (h.h64 // {_SHIFT}::UHUGEINT) AS reg
   FROM keys k JOIN hashes h ON h.tok = k.conv_id)
 SELECT role,
   CAST(FLOOR({_M}.0 * LN({_M}.0 / ({_M} - COUNT(DISTINCT reg))) + 0.5) AS BIGINT)
     AS approx_convs,
   COUNT(DISTINCT conv_id) AS exact_convs
 FROM regs GROUP BY role"""
    )
