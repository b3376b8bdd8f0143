"""Incremental dedup against a historical corpus, with a Bloom prefilter.

The 100 TB ingestion pattern this models: a new batch of documents arrives
and must be deduplicated against everything already ingested (billions of
digests) without re-shuffling the history. The reference forwarder has the
same at-least-once re-send concern on its exporter path (main.go's batch
processor); here the guard is content-addressed:

1. digest: sha2-256 of the text — 256-bit, so digest equality IS content
   equality for dedup purposes (same contract as ``dedup.exact_dup_groups``).
2. Bloom prefilter (optional, default on): the history's digests fold into
   an m-bit bitmap via k xxhash64-derived bit positions. The build is
   DISTRIBUTED — each digest explodes to k (word, bit) pairs merged by ONE
   ``bit_or`` aggregate over at most m/64 word slots — and only the
   finished m/64-long word array is collected and re-broadcast as an array
   literal, so the membership test is pure whole-stage-codegen per batch
   row: no join, no shuffle, no Python.
3. exact verify: only Bloom CANDIDATES' (id, digest) pairs join the
   history digest store (left-semi on digest — raw text never enters that
   join), and the resulting duplicate-id set anti-joins the batch.

Bloom filters have no false negatives, so the final result is
BIT-IDENTICAL to the plain exact anti-join — which is exactly what the
DuckDB gate oracle checks (``incremental_dedup``): the Bloom stage can
only change performance, never results (tests/test_bloom.py pins
prefilter="bloom" == prefilter="none" == hand dedup).

Sizing: the collected bitmap must fit comfortably on the driver and in a
broadcast literal — ``m_bits`` is capped at 2**27 (16 MiB of longs). At a
1% false-positive target that covers ~14M history keys (m ~= 9.6 n);
beyond that, shard the history by digest range and run one pass per shard
(bitmaps OR together), or pass ``prefilter="none"`` and let the digest
semi-join do the work (the same join the verify step already runs, minus
the pruning).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_M_BITS = 1 << 27  # 16 MiB of packed longs — driver/broadcast bound


def bloom_params(n_keys: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 rounded up to a
    multiple of 64, k = round(m/n * ln 2), both clamped to >= 1 slot."""
    if n_keys <= 0:
        return 64, 1
    if not 0 < fp_rate < 1:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    m = int(math.ceil(-n_keys * math.log(fp_rate) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    if m > _MAX_M_BITS:
        raise ValueError(
            f"bloom bitmap would need {m} bits for n={n_keys} at p={fp_rate}; "
            f"cap is {_MAX_M_BITS} (16 MiB). Shard the history by digest "
            f"range or use prefilter='none'."
        )
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _pos_sql(digest_col: str, i: int, m_bits: int) -> str:
    """Bit position i for a digest, as Spark SQL (xxhash64 seeds the k
    hashes apart by chaining an int literal — hashLong(text)/hashInt(i))."""
    return f"pmod(xxhash64({digest_col}, {i}), {m_bits}L)"


def _validate_m(m_bits: int) -> None:
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if m_bits > _MAX_M_BITS:
        raise ValueError(f"m_bits {m_bits} exceeds the {_MAX_M_BITS} driver bound")


def build_bloom(
    history: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 5,
    digest_col: str | None = None,
) -> list[int]:
    """Distributed Bloom build over the history: explode each digest's k
    positions to (word_idx, bit), merge with ONE bit_or aggregate over at
    most m/64 groups, collect the (tiny) word table. Pass ``digest_col``
    to build from a precomputed digest store — the realistic shape: at
    100 TB the history lives as a digest table, not raw text. Returns the
    packed word list (length m/64, bit b of the bitmap = bit b%64 of
    word b//64)."""
    _validate_m(m_bits)
    if digest_col is None:
        history = history.select(F.sha2(F.col(text_col), 256).alias("_digest"))
        digest_col = "_digest"
    pos_arr = ", ".join(_pos_sql(digest_col, i, m_bits) for i in range(k))
    words = (
        history.select(F.expr(f"explode(array({pos_arr}))").alias("pos"))
        .select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
        .collect()
    )
    packed = [0] * (m_bits // 64)
    for r in words:
        packed[r["word_idx"]] = r["word"]
    return packed


def bloom_hit(bitmap_col: str, digest_col: str, m_bits: int, k: int) -> Column:
    """Membership test as ONE boolean codegen expression: all k derived
    bits set in the array<long> bitmap column. Each position's xxhash64
    is written twice (word index + mask) — 2k 64-byte hashes per row is
    noise next to a join, and keeping it a single expr keeps the whole
    filter inside WholeStageCodegen."""
    _validate_m(m_bits)
    tests = []
    for i in range(k):
        pos = _pos_sql(digest_col, i, m_bits)
        tests.append(
            f"(element_at({bitmap_col}, CAST(({pos}) div 64 AS INT) + 1)"
            f" & shiftleft(1L, CAST(({pos}) % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(tests))


def _with_digest(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("_digest", F.sha2(F.col(text_col), 256))


def dedup_against_history(
    batch: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefilter: str = "bloom",
    m_bits: int = 1 << 20,
    k: int = 5,
    history_digest_col: str | None = None,
) -> DataFrame:
    """Rows of ``batch`` whose content does NOT appear in ``history``.

    prefilter="bloom": build the history bitmap (one aggregate job +
    driver collect of m/64 longs), keep only batch rows whose digest hits
    the bloom as verify-join candidates; the duplicate-id set from the
    exact semi-join then anti-joins the batch on ``id_col``. Raw batch
    text crosses the id anti-join only; history text is projected to its
    digest before anything wide.

    prefilter="none": the same verify join over the whole batch — use
    when the history exceeds the bitmap bound (see module docstring).

    Results are identical between modes (no false negatives); the gate
    oracle is the plain exact anti-join.
    """
    if prefilter not in ("bloom", "none"):
        raise ValueError(f"prefilter must be 'bloom' or 'none', got {prefilter!r}")
    if history_digest_col is None:
        hist_digests = history.select(
            F.sha2(F.col(text_col), 256).alias("_digest")
        ).distinct()
    else:
        hist_digests = history.select(
            F.col(history_digest_col).alias("_digest")
        ).distinct()
    b = _with_digest(batch, text_col)
    cand = b.select(id_col, "_digest")
    if prefilter == "bloom":
        words = build_bloom(
            history, text_col, m_bits, k, digest_col=history_digest_col
        )
        # stage the literal behind the nondeterministic identity guard so
        # CollapseProject materializes ONE array for all k references
        # instead of inlining the 16 KiB+ literal per test
        cand = cand.withColumn(
            "_bloom", F.when(F.spark_partition_id() >= -1, F.lit(words))
        )
        cand = cand.filter(bloom_hit("_bloom", "_digest", m_bits, k)).drop("_bloom")
    dup_ids = cand.join(hist_digests, "_digest", "left_semi").select(id_col)
    return b.join(dup_ids, id_col, "left_anti").drop("_digest")


def incremental_dedup_stats(
    batch: DataFrame,
    history: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """One accounting row for the bloom-prefiltered run: n_batch,
    n_candidates (bloom hits), n_dropped (verified duplicates), n_kept,
    bloom_false_positives (= candidates - dropped; deterministic — the
    hash chain has no randomness). No silent pruning: whatever the bloom
    excludes from the verify join is exactly n_batch - n_candidates, all
    of it provably non-duplicate."""
    words = build_bloom(history, text_col, m_bits, k)
    hist_digests = history.select(
        F.sha2(F.col(text_col), 256).alias("_digest")
    ).distinct()
    b = (
        _with_digest(batch, text_col)
        .select(id_col, "_digest")
        .withColumn("_bloom", F.when(F.spark_partition_id() >= -1, F.lit(words)))
        .withColumn("_hit", bloom_hit("_bloom", "_digest", m_bits, k))
        .drop("_bloom")
    )
    dup = (
        b.filter(F.col("_hit"))
        .join(hist_digests, "_digest", "left_semi")
        .agg(F.count("*").alias("n_dropped"))
    )
    tot = b.agg(
        F.count("*").alias("n_batch"),
        F.sum(F.col("_hit").cast("long")).alias("n_candidates"),
    )
    return (
        tot.crossJoin(dup)
        .withColumn("n_kept", F.col("n_batch") - F.col("n_dropped"))
        .withColumn(
            "bloom_false_positives", F.col("n_candidates") - F.col("n_dropped")
        )
    )
