"""Deterministic training-mix sampling.

A training-data pipeline composes its corpus from per-source quotas ("90%
of books, 25% of web, drop source X"). Requirements at 100 TB:
- NO rand(): re-runs, retried tasks and resumed jobs must keep the exact
  same rows (Spark re-executes partitions; rand-based sampling makes sink
  counts differ between attempts).
- engine-reproducible: the keep/drop decision must be recomputable
  bit-for-bit by the DuckDB oracle — which rules out xxhash64 (Spark-only).

So the sample key is the Knuth multiplicative hash in plain 64-bit integer
arithmetic: key(id) = (fold(id) * 2654435761) mod 2^32, uniform over
[0, 2^32) for sequential or arbitrary ids, identical in any engine. Keep
iff key < floor(rate * 2^32).

Overflow discipline (the whole point of the formulation): a naive
``id * 2654435761`` exceeds 2^63-1 for any id > 3,474,701,543 — Spark
(non-ANSI) would wrap the long negative, silently KEEPING rows in rate-0
strata, while the DuckDB oracle errors on BIGINT overflow. So the key is
computed overflow-free for the FULL unsigned-64 id space:

1. pre-fold to 32 bits:  f = (id mod 2^32) xor (id >>> 32)   (f < 2^32;
   the identity for ids < 2^32, so small-id keys are unchanged)
2. 16-bit-limb modular multiply:  with lo = f & 0xffff, hi = f >> 16,
   key = ((lo*M) mod 2^32 + ((hi*M) mod 2^16) * 2^16) mod 2^32
   Every intermediate stays below 2^48 — exact in int64 on any engine.

Everything is a single whole-stage-codegen filter — no shuffle, no UDF;
at scale the filter pushes into the scan's row-group evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761
_KEY_SPACE = 1 << 32


def sample_key(id_col: Column) -> Column:
    """(fold32(id) * 2654435761) mod 2^32 — engine-portable uniform key,
    overflow-free over the full 64-bit id space (see module docstring).
    Identical to the naive product mod 2^32 for ids < 2^32."""
    x = id_col.cast("long")
    folded = F.pmod(x, F.lit(_KEY_SPACE)).bitwiseXOR(F.shiftrightunsigned(x, 32))
    lo = folded.bitwiseAND(F.lit(0xFFFF))
    hi = F.shiftrightunsigned(folded, 16)
    return (
        (lo * F.lit(KNUTH_MULT)) % F.lit(_KEY_SPACE)
        + ((hi * F.lit(KNUTH_MULT)) % F.lit(1 << 16)) * F.lit(1 << 16)
    ) % F.lit(_KEY_SPACE)


def sample_key_py(i: int) -> int:
    """Pure-Python reference of sample_key (tests + oracle generation)."""
    f = (i % _KEY_SPACE) ^ ((i % (1 << 64)) >> 32)
    return (f * KNUTH_MULT) % _KEY_SPACE


def weighted_sample(
    df: DataFrame,
    weight_milli_col: str,
    base_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-ROW deterministic Bernoulli sample with probability
    min(1, base_rate * weight/1000) — quality-weighted corpus mixing
    (keep high-quality documents at a higher rate) with the same
    guarantees as stratified_sample: no rand() (identical keeps under
    task retry / resume), and every operation in INTEGER arithmetic so
    the DuckDB oracle reproduces the keep set bit-for-bit (a float
    threshold would hit libm/rounding divergence across engines).

    keep iff  key(id) * 10^6  <  floor(base_rate*1000) * w_milli * 2^32
    — the threshold comparison CROSS-MULTIPLIED so there is no division
    anywhere (division is where float rounding would creep in): LHS
    < 2^32 * 10^6 ~ 4.3e15 and RHS <= 1000 * 10^6 * 2^32 ~ 4.3e18, both
    exact in int64, and probabilities >= 1 saturate automatically (the
    RHS exceeds every possible LHS — the min(1, .) cap for free).
    Weights are integer milli-units (text.with_quality's quality_milli).

    Overflow ENFORCEMENT (not just documentation): in non-ANSI Spark an
    RHS past 2^63-1 wraps NEGATIVE and silently drops every row in that
    stratum. So weights are clamped with ``least`` to the largest value
    whose RHS stays in int64. The clamp is SATURATION-EXACT, never a
    probability distortion: it can only trigger once br_milli * w exceeds
    ~2^31 milli^2, i.e. a keep probability over ~2000 — far past the
    min(1, .) saturation point, where every key already passes. base_rate
    itself is bounded so the clamped RHS still exceeds every possible LHS
    (insane rates fail loudly instead of quietly keeping everything)."""
    import math

    br_milli = math.floor(base_rate * 1000)
    if br_milli < 0:
        raise ValueError(f"base_rate must be >= 0: {base_rate!r}")
    if br_milli > 0:
        # largest weight whose RHS = br_milli * w * 2^32 fits in int64
        max_w = (2**63 - 1) // (br_milli * _KEY_SPACE)
        if br_milli * max_w < 1_000_000:
            # clamped RHS below the saturation ceiling (possible only for
            # base_rate past ~2e6): the clamp would alter sub-saturation
            # probabilities — a caller bug, so fail loudly
            raise ValueError(
                f"base_rate {base_rate!r} too large: clamping weights to "
                f"{max_w} milli could alter sub-saturation probabilities"
            )
    w = F.col(weight_milli_col).cast("long")
    if br_milli > 0:
        w = F.least(w, F.lit(max_w))
    lhs = sample_key(F.col(id_col)) * F.lit(1_000_000)
    rhs = F.lit(br_milli) * w * F.lit(_KEY_SPACE)
    return df.filter(lhs < rhs)


def fixed_k_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY min(k, stratum size) rows per stratum — the fixed-size
    eval-subset primitive rate-based sampling can't give (a Bernoulli
    sample's size varies; an eval set must not). Deterministic: rank by
    (sample_key(id), id) per stratum and keep rank <= k — the same
    engine-portable key as stratified_sample, the id tiebreak making
    key collisions unambiguous, so retries, resumes and the DuckDB
    oracle select the identical rows. Adding data to a stratum never
    perturbs which of the SURVIVING rows are chosen beyond the rank
    boundary (hash order is stable, unlike any LIMIT).

    Scale shape: one window per stratum key — a shuffle of (key, id)
    pairs; k is small by construction so the rank cuts early
    (WindowGroupLimit pushes rank <= k below the sort at 3.5+)."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(strata_col).orderBy(
        sample_key(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample: keep a row iff
    sample_key(id) < floor(rate(stratum) * 2^32). Strata absent from
    ``rates`` use ``default_rate`` (0.0 = drop — quotas are explicit, a
    misspelled source name yields zero rows, not a silent 100%)."""
    import math

    key = sample_key(F.col(id_col))
    # floor (not round/truncate-ambiguous) so the DuckDB oracle's
    # CAST(FLOOR(rate * 4294967296) AS BIGINT) lands on the same threshold
    thr: Column = F.lit(math.floor(default_rate * _KEY_SPACE))
    for s, r in sorted(rates.items()):
        thr = F.when(
            F.col(strata_col) == s, F.lit(math.floor(r * _KEY_SPACE))
        ).otherwise(thr)
    return df.filter(key < thr)
