"""Leakage-safe train/val/test splitting.

Splitting a deduplicated corpus by per-DOCUMENT hash still leaks: two
near-duplicate documents can land in train and test, and the eval set
silently contains training data (the same failure benchmark
decontamination guards against, arising from the split itself). The
leakage-safe unit of assignment is the DEDUP CLUSTER: every document in
a near-duplicate family goes to the same split, so no near-duplicate
pair can straddle a split boundary — by construction, not by audit.

Mechanics (all engine-portable integer arithmetic, the sampling.py
discipline): key = sample_key(cluster_id) uniform over [0, 2^32); split
j owns the key interval [cum_{j-1} * 2^32 div 1000, cum_j * 2^32 div
1000) where cum_j is the cumulative ratio in millis (ratios must sum to
1000 — nothing is silently dropped). Deterministic under retries and
resumes (no rand()), and the DuckDB oracle re-derives key, intervals
and assignment bit-for-bit.

Scale shape: the assignment is a pure codegen CASE over an existing
cluster column — zero additional shuffles beyond whatever produced the
clusters (functions/graph.dedup_clusters or semdedup's drop sets); the
report is one aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.sampling import sample_key

_KEY_SPACE = 1 << 32


def _validate(ratios_milli: list[tuple[str, int]]) -> list[tuple[str, int]]:
    if not ratios_milli:
        raise ValueError("ratios_milli must be non-empty")
    names = [n for n, _ in ratios_milli]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    if any(m <= 0 for _, m in ratios_milli):
        raise ValueError(f"every split needs a positive milli share: {ratios_milli}")
    total = sum(m for _, m in ratios_milli)
    if total != 1000:
        raise ValueError(
            f"ratios must sum to 1000 millis (nothing silently dropped), "
            f"got {total}: {ratios_milli}"
        )
    return ratios_milli


def split_thresholds(ratios_milli: list[tuple[str, int]]) -> list[tuple[str, int, int]]:
    """(name, lo, hi) key intervals; hi of the last split is 2^32 so the
    full key space is covered exactly once."""
    out, cum = [], 0
    for name, milli in _validate(ratios_milli):
        lo = (cum * _KEY_SPACE) // 1000
        cum += milli
        hi = (cum * _KEY_SPACE) // 1000
        out.append((name, lo, hi))
    return out


def split_expr(unit_col: Column, ratios_milli: list[tuple[str, int]]) -> Column:
    """The split name for a unit id — one codegen CASE chain."""
    key = sample_key(unit_col)
    expr = None
    for name, _lo, hi in split_thresholds(ratios_milli):
        cond = key < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr  # intervals cover [0, 2^32): the last WHEN always matches


def leakage_safe_split(
    df: DataFrame,
    ratios_milli: list[tuple[str, int]],
    unit_col: str = "cluster_id",
    out_col: str = "split",
) -> DataFrame:
    """Adds ``out_col``: the split every row of this row's unit (dedup
    cluster) belongs to. Rows sharing ``unit_col`` always share the
    split — the no-leakage guarantee."""
    return df.withColumn(out_col, split_expr(F.col(unit_col), ratios_milli))


def split_report(
    df: DataFrame,
    ratios_milli: list[tuple[str, int]],
    unit_col: str = "cluster_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(split, n_docs, n_units, sum_ids) — realized sizes per split (the
    cluster-size distribution, not the ratios, decides exact doc counts;
    the ratios govern the UNIT assignment probabilities)."""
    d = leakage_safe_split(df, ratios_milli, unit_col)
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(unit_col).alias("n_units"),
        F.sum(id_col).alias("sum_ids"),
    )


def split_case_sql(unit_sql: str, ratios_milli: list[tuple[str, int]]) -> str:
    """The identical key + CASE chain in DuckDB SQL (mirrors
    sampling.sample_key's rendering in O_TRAINING_MIX)."""
    key = (
        f"((((xor({unit_sql} % 4294967296, {unit_sql} // 4294967296)) % 65536)"
        " * 2654435761) % 4294967296"
        f" + (((xor({unit_sql} % 4294967296, {unit_sql} // 4294967296)) // 65536)"
        " * 2654435761) % 65536 * 65536) % 4294967296"
    )
    whens = "".join(
        f" WHEN {key} < {hi} THEN '{name}'"
        for name, _lo, hi in split_thresholds(ratios_milli)
    )
    return f"CASE{whens} END"
