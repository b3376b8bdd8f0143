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
tests/test_training_ops.py: exact for every cardinality whose linear
estimate H stays below the measured branch crossover (linear verified
through H = 1201.4; the bias-corrected branch observed from H = 1233.8 —
at sf0.1's 1500 convs/role Spark yields 1492 vs linear's 1546). The
sf0.01 gate sits at ~150/role, H ~ 150. Outside the modeled regime
(H above the conservative ``_LINEAR_MAX_H``, or V = 0) the SQL emits
NULL — a self-describing "not modeled", never a confident wrong number;
the bias branch itself would need Spark's empirical rawEstimateData /
biasData tables plus its KNN interpolation.

``Math.round`` is floor(x + 0.5) for the positive doubles here, written
exactly that way rather than DuckDB's half-away-from-zero ROUND.
"""

from __future__ import annotations

from otel_logger_spark.oracles_xxh64 import xxh64_ctes

_P = 9
_M = 1 << _P
_SHIFT = 1 << (64 - _P)

# Validity bound for the linear-counting branch, measured against Spark
# (tests pin it): linear estimates verified exact through H = 1201.4;
# the bias-corrected branch observed from H = 1233.8 (sf0.1's 1500
# convs/role: Spark 1492 vs linear 1546). Above this margin the oracle
# emits NULL — "outside the modeled regime", never a confident wrong
# number. Modeling the bias branch would need Spark's empirical
# rawEstimateData/biasData tables + its KNN interpolation; the gate's
# sf0.01 cardinalities (~150/role, H~150) sit far inside the bound.
_LINEAR_MAX_H = 1150


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
   CASE WHEN COUNT(DISTINCT reg) < {_M}
         AND {_M}.0 * LN({_M}.0 / ({_M} - COUNT(DISTINCT reg))) <= {_LINEAR_MAX_H}
        THEN CAST(FLOOR({_M}.0 * LN({_M}.0 / ({_M} - COUNT(DISTINCT reg))) + 0.5) AS BIGINT)
        ELSE NULL END AS approx_convs,
   COUNT(DISTINCT conv_id) AS exact_convs
 FROM regs GROUP BY role"""
    )
