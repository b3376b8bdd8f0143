"""Z-order layout: hand-computed Morton interleave, rewrite safety via
the shared protocol, and the point of it all — per-file min-max column
ranges shrink so footer-stats skipping works for BOTH curve columns."""

from pyspark.sql import functions as F

from otel_logger_spark.operators.zorder import (
    quantize_expr,
    with_zvalue,
    zorder_parquet_dir,
    zvalue_expr,
)


def test_interleave_hand_math(spark):
    """q_user=5 (101b), q_ep=3 (011b) -> z = 1 + 2 + 8 + 16 = 27
    (column 0's bit i lands at 2i, column 1's at 2i+1)."""
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    z = df.select(
        zvalue_expr([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()[0]["z"]
    assert z == 27


def test_quantize_exact_integer_division(spark):
    """Quantization is floor((c-mn)*top/span) in pure integers — check
    boundary values and the clamp at a span where the intermediate
    product (2^40 * 65535 ~ 2^56) already exceeds float53 exactness, and
    that the int64 domain bound raises loudly instead of overflowing."""
    import pytest

    big = 1 << 40
    df = spark.createDataFrame(
        [(0,), (big // 2,), (big,)], "c long"
    )
    out = [
        r["q"] for r in df.select(
            quantize_expr("c", 0, big, bits=16).alias("q")
        ).collect()
    ]
    assert out == [0, 32767, 65535]
    with pytest.raises(ValueError, match="too wide"):
        quantize_expr("c", 0, 1 << 55, bits=16)


def test_zorder_rewrite_shrinks_per_file_ranges(spark, tmp_path):
    """The skipping evidence: after Z-ordering by (user_id, ep), every
    file covers a narrow slab of EACH curve column (footer min-max
    becomes selective), while a hash-layout file spans nearly the whole
    domain. Rows and values must survive the rewrite untouched."""
    path = str(tmp_path / "zt")
    n = 40_000
    df = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("user_id"),
        (F.col("id") * 13 % 100_000).alias("ep"),
        F.col("id").alias("payload"),
    ).withColumn("user_id", F.abs("user_id"))
    df.repartition(16).write.parquet(path)

    def file_stats(p, col):
        return [
            (r["mn"], r["mx"])
            for r in spark.read.parquet(p)
            .groupBy(F.input_file_name())
            .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
            .collect()
        ]

    def hit_frac(stats, keys):
        """Fraction of files a footer-stats reader must OPEN for a point
        predicate, averaged over sample keys — the skipping metric."""
        tot = sum(
            sum(1 for mn, mx in stats if mn <= k <= mx) for k in keys
        )
        return tot / (len(keys) * len(stats))

    ukeys = list(range(25, 1000, 50))
    ekeys = list(range(2500, 100_000, 5000))
    assert hit_frac(file_stats(path, "user_id"), ukeys) > 0.95  # no skipping
    total_before = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("payload")
    ).collect()[0]

    res = zorder_parquet_dir(
        spark, path, ["user_id", "ep"], target_file_bytes=10_000
    )
    assert res["n_rows"] == n
    assert res["files_after"] >= 16  # enough files for ranges to mean anything

    # BOTH curve columns become selective (measured ~0.33 / ~0.23 here —
    # a single-column sort can only serve its leading column)
    assert hit_frac(file_stats(path, "user_id"), ukeys) < 0.6
    assert hit_frac(file_stats(path, "ep"), ekeys) < 0.6
    total_after = spark.read.parquet(path).agg(
        F.count(F.lit(1)), F.sum("payload")
    ).collect()[0]
    assert tuple(total_after) == tuple(total_before)


def test_with_zvalue_rejects_all_null_column(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b long"
    )
    with pytest.raises(ValueError, match="all-NULL"):
        with_zvalue(df, ["a", "b"])


def test_with_zvalue_deterministic(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 50) for i in range(100)], "a long, b long"
    )
    z1 = sorted(r["_z"] for r in with_zvalue(df, ["a", "b"]).collect())
    z2 = sorted(r["_z"] for r in with_zvalue(df, ["a", "b"]).collect())
    assert z1 == z2


def test_zvalue_width_guard(spark):
    """Round 6 (advisor): 4 cols x 16 bits would push z-bit positions to
    64+ where long shifts wrap mod 64 and the + accumulation carries
    across colliding bits — a silently garbage curve. Refuse loudly, at
    the widest still-valid width keep working, and fail from
    zorder_parquet_dir before any job or tmp dir exists."""
    import pytest

    cols = [F.lit(1).cast("long")] * 4
    with pytest.raises(ValueError, match="63 usable bits"):
        zvalue_expr(cols, bits=16)
    with pytest.raises(ValueError, match="at least one"):
        zvalue_expr([], bits=16)
    # 4 cols x 15 bits = 60 <= 63: fine
    df = spark.createDataFrame([(1, 2, 3, 4)], "a long, b long, c long, d long")
    qs = [F.col(c) for c in ("a", "b", "c", "d")]
    assert df.select(zvalue_expr(qs, bits=15).alias("z")).collect()[0]["z"] > 0
    with pytest.raises(ValueError, match="63 usable bits"):
        zorder_parquet_dir(spark, "/nonexistent", ["a", "b", "c", "d"], bits=16)


def test_with_zvalue_precomputed_ranges(spark):
    """Round 6: ranges= skips the measurement agg — explicit ranges equal
    to the data's true min/max produce the bit-identical z column, and a
    range for a non-curve column is rejected."""
    import pytest

    rows = [(i * 7 % 100, i * 13 % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    measured = sorted(
        r["_z"] for r in with_zvalue(df, ["a", "b"], bits=8).collect()
    )
    explicit = sorted(
        r["_z"]
        for r in with_zvalue(
            df, ["a", "b"], bits=8,
            ranges={"a": (min(r[0] for r in rows), max(r[0] for r in rows)),
                    "b": (min(r[1] for r in rows), max(r[1] for r in rows))},
        ).collect()
    )
    assert explicit == measured
    # partial coverage: only 'a' precomputed, 'b' measured — same result
    partial = sorted(
        r["_z"]
        for r in with_zvalue(
            df, ["a", "b"], bits=8,
            ranges={"a": (min(r[0] for r in rows), max(r[0] for r in rows))},
        ).collect()
    )
    assert partial == measured
    with pytest.raises(ValueError, match="non-curve"):
        with_zvalue(df, ["a"], ranges={"zzz": (0, 1)})
