"""Banded phash image near-dup (functions/imagedup.py, round 8): hand
bands, Python brute-force equality (the pigeonhole completeness claim),
parameter validation, hot-bucket cap path, and gate oracle parity at a
second SF."""

import random

import duckdb
import pytest

from otel_logger_spark.functions.imagedup import (
    N_BANDS,
    phash_bands,
    phash_near_pairs,
)

SF = "/root/testdata/sf0.001"


def _df(spark, hashes):
    return spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, phash long"
    )


def test_bands_hand_case(spark):
    h = 0x0123_4567_89AB_CDEF
    got = {
        (r["band_idx"], r["band_val"])
        for r in phash_bands(_df(spark, [h])).collect()
    }
    assert got == {(0, 0xCDEF), (1, 0x89AB), (2, 0x4567), (3, 0x0123)}


def test_bands_negative_hash_no_sign_smear(spark):
    # top band of a negative int64 must be the plain top 16 bits
    h = -1  # all 64 bits set
    got = {r["band_val"] for r in phash_bands(_df(spark, [h])).collect()}
    assert got == {0xFFFF}


def test_matches_python_brute_force(spark):
    """200 structured hashes incl. planted 1/2/3-bit neighbors and a
    4-bit pair that must NOT appear (above max_hamming): banded == brute
    force, the completeness claim."""
    rng = random.Random(7)
    base = [rng.getrandbits(63) for _ in range(180)]
    planted = []
    for k in (1, 2, 3, 4):
        h = base[k]
        flipped = h
        for bit in range(k):
            flipped ^= 1 << (5 + 7 * bit)
        planted.append(flipped)
    hashes = base + planted
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_pairs(_df(spark, hashes), max_hamming=3).collect()
    }
    exp = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin(hashes[i] ^ hashes[j]).count("1")
            if d <= 3:
                exp.add((i, j, d))
    assert got == exp
    assert {(1, 180, 1), (2, 181, 2), (3, 182, 3)} <= exp
    assert not any(p[:2] == (4, 183) for p in exp)  # 4 bits: excluded


def test_max_hamming_validation(spark):
    df = _df(spark, [1, 2])
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_pairs(df, max_hamming=N_BANDS)


def test_hot_bucket_cap_completes(spark):
    """A flood of identical hashes is quadratic uncapped; with
    max_bucket the job completes on a bounded candidate set (rows kept
    out of pairing, never silently — the dedup.py discipline)."""
    df = _df(spark, [42] * 64 + [1 << 40] * 6)
    full = phash_near_pairs(df, max_hamming=0).count()
    assert full == 64 * 63 // 2 + 6 * 5 // 2
    capped = phash_near_pairs(df, max_hamming=0, max_bucket=8)
    # the 64-strong bucket is excluded whole (its bands all exceed the
    # cap); the 6-strong cluster stays under it and still pairs fully
    assert capped.count() == 6 * 5 // 2
    assert capped.filter("id_a < 64").count() == 0


def test_gate_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_image_near_dup,
        q_image_near_dup,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = {tuple(r) for r in con.sql(_o_image_near_dup()).fetchall()}
    got = {tuple(r) for r in q_image_near_dup(spark, SF).collect()}
    assert got == exp
    # every injected copy pairs with its original at hamming 1
    assert len(exp) > 0 and all(t[2] == 1 for t in exp)
    assert all(t[1] == t[0] + 30000 for t in exp)
