"""DSIR-style importance resampling: select raw documents whose hashed
n-gram distribution matches a TARGET corpus (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling").

The existing selection ops filter on intrinsic signals (quality scores,
repetition, language); none select by *distribution match* — "give me
the raw-web documents that look most like my curated target set", the
standard pretraining data-selection move. DSIR does it with a bag of
hashed n-gram features:

  bucket(g)  = xxhash64(g) mod B           (B a power of two)
  lambda_f   = round(SCALE * (ln p_target(f) - ln p_source(f)))
  score(doc) = sum over the doc's unigram+bigram occurrences of
               lambda_{bucket(g)}          (integer, exact)

with add-alpha smoothing on both distributions. Selection = top-k by
(score DESC, doc_id ASC) — deterministic, no rand().

Exactness contract: bucketing, counting, scoring and ranking are pure
64-bit integer arithmetic, re-derived independently by the DuckDB
oracle (XXH64 bit-for-bit via oracles_xxh64, its own bucket counts, its
own per-doc sums). The ONLY shared code is ``importance_weights`` — the
lambda formula both engines feed their independently-derived counts
into (the ``queries_training`` IVF oracle's "shared Lloyd" precedent:
float math enters once, through one function, driver-side, and its
integer output is embedded as literals on both sides; if either
engine's counts differ the lambdas differ and the gate fails loudly).

Scale shape (100 TB): two B-sized aggregates (bounded driver state,
B ~ 2^10..2^20 — the quantiles.py/ivf.py discipline), then scoring is a
pure per-row projection against ONE array literal of B longs (constant
expression size in B — the round-7 quantize.py lesson), and selection
is a global top-k (TakeOrderedAndProject, no full sort). The target
side is typically tiny (curated corpus) — its scan is the cheap leg.
Feature arrays live inside one projection; token strings never shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 1024
DEFAULT_SCALE = 1_000_000  # lambda in integer micro-nats


def _check_buckets(n_buckets: int) -> int:
    if n_buckets < 2 or n_buckets & (n_buckets - 1):
        raise ValueError(
            f"n_buckets must be a power of two >= 2 (got {n_buckets}): the "
            "oracle's unsigned `h64 % B` only equals Spark's signed masked "
            "hash when B divides 2^64"
        )
    return n_buckets


def with_feature_buckets(
    df: DataFrame, n_buckets: int = DEFAULT_BUCKETS, text_col: str = "text"
) -> DataFrame:
    """Adds ``feats``: the doc's hashed unigram+bigram bucket ids WITH
    multiplicity (DSIR counts occurrences, not presence). Bigram string
    is ``w_i || ' ' || w_{i+1}`` — the whitespace join both engines
    rebuild identically. Pure projection, zero shuffle."""
    _check_buckets(n_buckets)
    words = F.split(F.col(text_col), " ")
    n = F.size(words)

    def bucket(tok: Column) -> Column:
        # pmod(signed, 2^k) == unsigned & (2^k - 1): a bitmask, no branch
        return F.xxhash64(tok).bitwiseAND(F.lit(n_buckets - 1)).cast("int")

    unis = F.transform(words, bucket)
    bis = F.zip_with(
        F.slice(words, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: bucket(F.concat_ws(" ", a, b)),
    )
    return df.withColumn("feats", F.concat(unis, bis))


def bucket_counts(feat_df: DataFrame, n_buckets: int) -> list[int]:
    """Dense occurrence counts per bucket — ONE partial-aggregated
    shuffle of at most B*partitions tiny rows, then a bounded driver
    collect (B values), the quantiles.py/ivf.py bounded-state pattern."""
    rows = (
        feat_df.select(F.explode("feats").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    out = [0] * n_buckets
    for r in rows:
        out[r["b"]] = r["c"]
    return out


def importance_weights(
    target_counts: list[int],
    source_counts: list[int],
    scale: int = DEFAULT_SCALE,
    alpha: int = 1,
) -> list[int]:
    """Integer log-ratio weights from two count vectors. THE shared
    function of the exactness contract (see module docstring): both the
    engine and the oracle call this with their own independently-derived
    counts; everything downstream of its integer output is re-derived
    per engine."""
    if len(target_counts) != len(source_counts):
        raise ValueError("count vectors must have equal length")
    b = len(target_counts)
    t_tot = sum(target_counts) + alpha * b
    s_tot = sum(source_counts) + alpha * b
    return [
        round(
            scale
            * (
                math.log((t + alpha) / t_tot)
                - math.log((s + alpha) / s_tot)
            )
        )
        for t, s in zip(target_counts, source_counts)
    ]


def with_dsir_score(
    feat_df: DataFrame, lambdas: list[int], out_col: str = "dsir_score"
) -> DataFrame:
    """score = sum(lambda[feat]) — a codegen fold against ONE array
    literal of B longs (constant expression size in B; never unroll B
    expressions — functions/quantize.py's round-7 lesson)."""
    lam = F.lit([int(x) for x in lambdas])
    return feat_df.withColumn(
        out_col,
        F.aggregate(
            "feats",
            F.lit(0).cast("long"),
            lambda acc, f: acc + F.element_at(lam, f + F.lit(1)),
        ),
    )


def bucket_counts_within(
    feat_df: DataFrame, target_flag: Column, n_buckets: int
) -> tuple[list[int], list[int]]:
    """(source_counts, target_counts) when the target corpus is a SUBSET
    of the source selected by ``target_flag`` (the common "curated slice
    of the same lake" deployment): ONE corpus traversal and ONE bounded
    driver collect computes both vectors — the two-pass general path
    scans the source lake twice for identical numbers. Values are
    bit-identical to bucket_counts() on the two frames separately."""
    rows = (
        feat_df.select(
            target_flag.alias("_t"), F.explode("feats").alias("b")
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("c_src"),
            F.count(F.when(F.col("_t"), 1)).alias("c_tgt"),
        )
        .collect()
    )
    src = [0] * n_buckets
    tgt = [0] * n_buckets
    for r in rows:
        src[r["b"]] = r["c_src"]
        tgt[r["b"]] = r["c_tgt"]
    return src, tgt


def dsir_select_within(
    source_df: DataFrame,
    target_flag: Column,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """dsir_select for a target that IS a flagged subset of the source:
    identical output (same counts -> same lambdas -> same scores -> same
    top-k), one corpus traversal instead of two for the count vectors."""
    _check_buckets(n_buckets)
    src = with_feature_buckets(source_df, n_buckets, text_col)
    src_counts, tgt_counts = bucket_counts_within(src, target_flag, n_buckets)
    lam = importance_weights(tgt_counts, src_counts)
    return (
        with_dsir_score(src, lam)
        .drop("feats")
        .orderBy(F.col("dsir_score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_select(
    source_df: DataFrame,
    target_df: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k source documents by target-likeness. Ordering is total
    ((score DESC, id ASC)) so selection is deterministic under retries;
    Spark executes the sort+limit as TakeOrderedAndProject — per-
    partition top-k then a k-row driver merge, never a global sort."""
    _check_buckets(n_buckets)
    src = with_feature_buckets(source_df, n_buckets, text_col)
    tgt = with_feature_buckets(target_df, n_buckets, text_col)
    lam = importance_weights(
        bucket_counts(tgt, n_buckets), bucket_counts(src, n_buckets)
    )
    return (
        with_dsir_score(src, lam)
        .drop("feats")
        .orderBy(F.col("dsir_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
