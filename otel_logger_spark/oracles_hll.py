"""DuckDB oracle for Spark's ``approx_count_distinct`` (HyperLogLog++) —
full-regime since round 6: linear counting, bias-corrected, and raw.

Spark's HLL++ is fully deterministic given the input values, so "an
approximation" is not "engine-specific noise". At the default
relativeSD 0.05 the sketch has p = ceil(2*log2(1.106/0.05)) = 9 ->
m = 512 registers; for each value x = XXH64(value, seed 42):

    register index = top p bits of x        (x >>> 55)
    rho           = NLZ((x << p) | 2^(p-1)) + 1
    M(j)          = max rho seen in register j

and the estimate (disassembled from this container's spark-catalyst
4.1.2 jar, ``HyperLogLogPlusPlusHelper.query`` — matching the public
Apache Spark source) is:

    zInverse = sum_j 2^-M(j)   (sequential over j = 0..511, doubles)
    V        = #{j : M(j) = 0}
    e_raw    = alphaM2 / zInverse
    if V > 0 and (H <= THRESHOLDS(p-4) or e_raw <= 2.5*m):
        estimate = H = m * ln(m / V)            # LINEAR branch
    elif e_raw < 5*m:
        estimate = e_raw - estimateBias(e_raw)  # BIAS-CORRECTED branch
    else:
        estimate = e_raw                        # RAW branch
    answer = Math.round(estimate) = floor(estimate + 0.5)

The ``or e_raw <= 2.5*m`` clause is why rounds 2-5 measured linear
behavior far past the paper's 400 threshold (crossover ~n 1200-1230 at
m=512: that's where e_raw crosses 2.5*m = 1280) — the round-5 oracle
modeled only the linear branch and abstained (NULL) above H = 1150.

``estimateBias`` is the paper's KNN: binary-search e_raw into the sorted
201-entry rawEstimateData table, take the contiguous K=6 window starting
at max(nearest-5, 0), slide right while the incoming point is strictly
closer than the outgoing, and average biasData over the final window.
The constant tables (public HLL++ paper appendix, carried verbatim in
Apache Spark source) live in hll_constants.py, extracted bit-for-bit
from the installed jar by tools/extract_hll_constants.py.

Everything is re-derived over the repo's bit-exact DuckDB XXH64
(oracles_xxh64.xxh64_ctes): rho via an exact integer CASE ladder (no
log2 — doubles above 2^53 round), zInverse as an in-register-order
``list_reduce`` fold replicating Java's sequential double summation, and
the KNN window in pure SQL over the literal tables. A pure-Python
replica (``hll_estimate_from_hashes``) is pinned against Spark across a
dense cardinality sweep spanning all three branches in
tests/test_training_ops.py.

``Math.round`` is floor(x + 0.5) for the positive doubles here, written
exactly that way rather than DuckDB's half-away-from-zero ROUND.
"""

from __future__ import annotations

import bisect
import math

from otel_logger_spark.hll_constants import (
    ALPHA_M2,
    BIASES,
    KNN_K,
    M,
    P,
    RAW_ESTIMATES,
    THRESHOLD,
)
from otel_logger_spark.oracles_xxh64 import xxh64_ctes

_SHIFT = 1 << (64 - P)  # 2^55: top-9-bit register index divisor
_LOWMASK = 1 << (64 - P)  # low 55 bits modulus (same value, named for intent)
_N_TAB = len(RAW_ESTIMATES)  # 201 for p=9


# ---------------------------------------------------------------------------
# Pure-Python replica of the estimator (for pinning against Spark in tests).
# ---------------------------------------------------------------------------

def estimate_bias(e: float) -> float:
    """Exact port of HyperLogLogPlusPlusHelper.estimateBias (public Apache
    Spark source; bytecode-verified against the installed jar)."""
    idx = bisect.bisect_left(RAW_ESTIMATES, e)  # == Java binarySearch ins-point
    low = max(idx - KNN_K + 1, 0)
    high = min(low + KNN_K, _N_TAB)

    def dist(i: int) -> float:
        d = e - RAW_ESTIMATES[i]
        return d * d

    while high < _N_TAB and dist(high) < dist(low):
        low += 1
        high += 1
    s = 0.0
    for i in range(low, high):
        s += BIASES[i]
    return s / (high - low)


def hll_estimate_from_hashes(hashes) -> int:
    """Spark's approx_count_distinct result given the XXH64(seed 42) hash
    of each distinct value (signed or unsigned 64-bit ints accepted)."""
    regs = [0] * M
    for h in hashes:
        x = h & 0xFFFFFFFFFFFFFFFF
        j = x >> (64 - P)
        w = ((x << P) & 0xFFFFFFFFFFFFFFFF) | (1 << (P - 1))
        rho = 65 - w.bit_length()  # NLZ(w) + 1; w != 0 (bit p-1 set)
        if rho > regs[j]:
            regs[j] = rho
    z_inverse = 0.0
    v = 0
    for mr in regs:  # register order, sequential double sum — as Spark does
        z_inverse += 1.0 / (1 << mr)
        if mr == 0:
            v += 1
    e_raw = ALPHA_M2 / z_inverse
    if v > 0:
        h_lin = M * math.log(M / v)
        if h_lin <= THRESHOLD or e_raw <= 2.5 * M:
            return math.floor(h_lin + 0.5)
    if e_raw < 5.0 * M:
        return math.floor(e_raw - estimate_bias(e_raw) + 0.5)
    return math.floor(e_raw + 0.5)


# ---------------------------------------------------------------------------
# DuckDB SQL generation.
# ---------------------------------------------------------------------------

def _d(x: float) -> str:
    """A double literal that is bit-exact with the Python float: DuckDB
    parses bare numeric literals as DECIMAL, and DECIMAL->DOUBLE loses a
    ULP on values like ALPHA_M2 — the VARCHAR->DOUBLE path round-trips."""
    return f"'{x!r}'::DOUBLE"


def _rho_case(low_expr: str) -> str:
    """Exact integer CASE ladder: rho for w = (x << 9) | 2^8 given the low
    55 bits of the hash. MSB of w sits 9 positions above the MSB of the
    low bits, so rho = 55 - floor(log2(low)) — computed with UHUGEINT
    comparisons, never doubles (x > 2^53 wouldn't round-trip a double)."""
    arms = [f"WHEN {low_expr} = 0::UHUGEINT THEN 56"]
    for k in range(54, -1, -1):  # 2^54 .. 2^0 -> rho 1 .. 55
        arms.append(f"WHEN {low_expr} >= {1 << k}::UHUGEINT THEN {55 - k}")
    return "CASE " + " ".join(arms) + " END"


def _bias_table_values() -> str:
    rows = ", ".join(
        f"({i}, {_d(RAW_ESTIMATES[i])}, {_d(BIASES[i])})" for i in range(_N_TAB)
    )
    return f"(VALUES {rows})"


def approx_distinct_by_role_oracle(corpus_cte_sql: str) -> str:
    """Oracle for groupBy(role).agg(approx_count_distinct(conv_id),
    countDistinct(conv_id)) over the transcripts CTE ``t``:
    (role, approx_convs, exact_convs) — BOTH columns re-derived, the
    approximate one bit-for-bit across ALL estimator regimes."""
    k = KNN_K
    return (
        corpus_cte_sql
        + """
 , keys AS (SELECT DISTINCT role, conv_id FROM t),
 vocab AS (SELECT DISTINCT conv_id AS tok FROM keys),"""
        + xxh64_ctes()
        + f""",
 rr AS (
   SELECT k.role,
          (h.h64 // {_SHIFT}::UHUGEINT) AS reg,
          {_rho_case(f"(h.h64 % {_LOWMASK}::UHUGEINT)")} AS rho
   FROM keys k JOIN hashes h ON h.tok = k.conv_id),
 regmax AS (SELECT role, reg, MAX(rho) AS mr FROM rr GROUP BY role, reg),
 role_exact AS (
   SELECT role, COUNT(DISTINCT conv_id) AS exact_convs FROM keys GROUP BY role),
 reg_grid AS (
   SELECT ro.role, g.range AS j FROM role_exact ro, range({M}) g),
 full_regs AS (
   SELECT gr.role, gr.j,
          CASE WHEN rm.mr IS NULL THEN 1.0
               ELSE 1.0 / CAST((1::BIGINT << rm.mr) AS DOUBLE) END AS term,
          CASE WHEN rm.mr IS NULL THEN 1 ELSE 0 END AS is_zero
   FROM reg_grid gr
   LEFT JOIN regmax rm ON rm.role = gr.role AND rm.reg = gr.j),
 zsum AS (
   SELECT role,
          list_reduce(list(term ORDER BY j), (acc, x) -> acc + x) AS zinv,
          CAST(SUM(is_zero) AS DOUBLE) AS vzero
   FROM full_regs GROUP BY role),
 est0 AS (
   SELECT role, {_d(ALPHA_M2)} / zinv AS eraw, vzero,
          CASE WHEN vzero > 0 THEN {_d(float(M))} * LN({_d(float(M))} / vzero)
               ELSE NULL END AS lin
   FROM zsum),
 bias_tab(i, est, bias) AS {_bias_table_values()},
 knn_lo AS (
   SELECT e.role, e.eraw,
          GREATEST(CAST((SELECT COUNT(*) FROM bias_tab b
                         WHERE b.est < e.eraw) AS BIGINT) - {k - 1}, 0) AS l0
   FROM est0 e),
 knn_win AS (
   SELECT kk.role,
          (SELECT MIN(a.i) FROM bias_tab a
             LEFT JOIN bias_tab b ON b.i = a.i + {k}
            WHERE a.i >= kk.l0
              AND (b.i IS NULL
                   OR (b.est - kk.eraw) * (b.est - kk.eraw)
                      >= (a.est - kk.eraw) * (a.est - kk.eraw))) AS fl,
          LEAST({k}, {_N_TAB} - kk.l0) AS wlen
   FROM knn_lo kk),
 bias_val AS (
   SELECT w.role,
          (SELECT list_reduce(list(b.bias ORDER BY b.i), (acc, x) -> acc + x)
             FROM bias_tab b
            WHERE b.i >= w.fl AND b.i < w.fl + w.wlen) / w.wlen AS bcorr
   FROM knn_win w)
 SELECT r.role,
   CAST(CASE
     WHEN e.vzero > 0 AND (e.lin <= {_d(THRESHOLD)} OR e.eraw <= {_d(2.5 * M)})
       THEN FLOOR(e.lin + 0.5)
     WHEN e.eraw < {_d(5.0 * M)} THEN FLOOR(e.eraw - bv.bcorr + 0.5)
     ELSE FLOOR(e.eraw + 0.5)
   END AS BIGINT) AS approx_convs,
   r.exact_convs
 FROM role_exact r
 JOIN est0 e USING (role)
 JOIN bias_val bv USING (role)"""
    )
