"""Deterministic training-mix sampling.

A training-data pipeline composes its corpus from per-source quotas ("90%
of books, 25% of web, drop source X"). Requirements at 100 TB:
- NO rand(): re-runs, retried tasks and resumed jobs must keep the exact
  same rows (Spark re-executes partitions; rand-based sampling makes sink
  counts differ between attempts).
- engine-reproducible: the keep/drop decision must be recomputable
  bit-for-bit by the DuckDB oracle — which rules out xxhash64 (Spark-only).

So the sample key is the Knuth multiplicative hash in plain 64-bit integer
arithmetic: key(id) = (id * 2654435761) mod 2^32, uniform over [0, 2^32)
for sequential or arbitrary ids, identical in any engine. Keep iff
key < rate * 2^32. Safe for ids < 2^32 (the product stays below 2^63);
larger id spaces should pre-fold (id % 2^32 xor id >> 32).

Everything is a single whole-stage-codegen filter — no shuffle, no UDF;
at scale the filter pushes into the scan's row-group evaluation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_MULT = 2654435761
_KEY_SPACE = 1 << 32


def sample_key(id_col: Column) -> Column:
    """(id * 2654435761) mod 2^32 — engine-portable uniform key."""
    return (id_col.cast("long") * F.lit(KNUTH_MULT)) % F.lit(_KEY_SPACE)


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
    key = sample_key(F.col(id_col))
    thr: Column = F.lit(int(default_rate * _KEY_SPACE))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(int(r * _KEY_SPACE))).otherwise(thr)
    return df.filter(key < thr)
