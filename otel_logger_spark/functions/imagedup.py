"""Image near-duplicate detection over perceptual hashes.

The multimodal analog of MinHash-banded text dedup: decode produces a
64-bit perceptual hash per image (functions/multimodal.py — real
average-hash for BMP payloads, digest fake elsewhere), and near-dup
images are pairs within a small Hamming distance. All-pairs Hamming is
N^2; the scale path is band-LSH over the hash itself:

  band i (of n_bands) = bits [16*i, 16*i+16)  of the phash
  candidates          = pairs sharing ANY (band_idx, band_value)
  verify              = bit_count(xor(pa, pb)) <= max_hamming

Completeness is EXACT by pigeonhole, not probabilistic: a pair with
hamming < n_bands cannot damage every band, so it shares at least one
band unchanged and is guaranteed to surface as a candidate. The
operator therefore requires ``max_hamming < n_bands`` and the DuckDB
oracle can brute-force the same pair set — banding changes the plan,
never the answer (unlike MinHash, where the bands ARE the probabilistic
semantics).

100 TB shape: ONE exchange of (id, phash, band_idx, band_val) rows —
4 narrow rows per image, payloads never shuffle — then a same-key
self-join inside each band bucket; verification is a codegen bit_count.
Uniform digest-derived hashes have no hot buckets; a real corpus with
mass-duplicated images does, so ``max_bucket`` (off by default) reuses
the MinHash hot-bucket cap + accounting discipline
(functions/dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
BAND_BITS = 16


def phash_bands(df: DataFrame, id_col: str = "doc_id", phash_col: str = "phash") -> DataFrame:
    """(id, phash, band_idx, band_val): 4 x 16-bit slices of the hash —
    shiftrightunsigned so the sign bit of int64 can't smear into band
    values."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_idx"),
                F.shiftrightunsigned(F.col(phash_col), BAND_BITS * i)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("band_val"),
            )
            for i in range(N_BANDS)
        ]
    )
    return df.select(
        F.col(id_col), F.col(phash_col), F.explode(bands).alias("b")
    ).select(id_col, phash_col, "b.band_idx", "b.band_val")


def phash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    phash_col: str = "phash",
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) with id_a < id_b and hamming <= max_hamming
    — complete by the pigeonhole bound (max_hamming < N_BANDS required).
    ``max_bucket`` caps pathological band buckets with the dedup.py
    accounting discipline (off by default: exhaustive)."""
    if not (0 <= max_hamming < N_BANDS):
        raise ValueError(
            f"max_hamming must be in [0, {N_BANDS}) for pigeonhole-exact "
            f"candidate completeness: {max_hamming}"
        )
    b = phash_bands(df, id_col, phash_col)
    if max_bucket is not None:
        from otel_logger_spark.functions.dedup import _cap_hot_buckets

        b = _cap_hot_buckets(b, ["band_idx", "band_val"], max_bucket)
    left = b.select(
        F.col(id_col).alias("id_a"),
        F.col(phash_col).alias("pa"),
        "band_idx",
        "band_val",
    )
    right = b.select(
        F.col(id_col).alias("id_b"),
        F.col(phash_col).alias("pb"),
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.expr("pa ^ pb")).cast("long").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
