"""Range (interval) join — match point rows to every interval containing
them, per key: clicks inside incident windows, turns inside deploy
windows, reads inside retention spans. Spark's optimizer executes a plain
``point BETWEEN start AND end`` join as BroadcastNestedLoop (or a
cartesian product when neither side broadcasts) — quadratic and undriveable
at 10^12 rows.

Scale formulation (no UDF, no nested loop): quantize time into
``bucket_width_us`` buckets. Each interval registers itself in EVERY
bucket it overlaps (``explode(sequence(floor(start/w), floor(end/w)))``);
each point lives in exactly ONE bucket — so a shuffled equi-join on
(key, bucket) + the exact BETWEEN filter finds every containment pair
exactly once (no dedup step: a (point, interval) pair can only meet in
the point's own bucket). Work is linear in points + intervals x
avg-buckets-per-interval; pick ``bucket_width_us`` near the typical
interval length so that factor stays O(1). This is the standard
bucketized range-join strategy (Databricks' range-join hints, Sedona's
grid join) expressed with stock DataFrame operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _time_us(df: DataFrame, col: str) -> Column:
    """Column-reference-qualified epoch-micros axis: timestamps convert,
    numeric time axes pass through (already in the caller's units)."""
    ref = df[col]
    if "timestamp" in df.schema[col].dataType.typeName():
        return F.unix_micros(ref.cast("timestamp"))
    return ref.cast("long")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: list[str] | tuple[str, ...] = (),
    bucket_width_us: int = 600_000_000,
    how: str = "inner",
) -> DataFrame:
    """All (point, interval) containment pairs: ``start <= point <= end``
    (inclusive both ends), optionally also matching the ``by`` keys.
    Returns the point columns plus the interval's non-key columns;
    ``how="inner"`` drops uncontained points, ``how="left"`` keeps them
    with NULLs. Time columns may be timestamps (epoch-micros internally —
    ``bucket_width_us`` is in microseconds) or already-numeric (bucket
    width shares their units). Intervals with end < start match nothing,
    mirroring SQL BETWEEN."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left: {how!r}")
    by = list(by)
    w = int(bucket_width_us)

    pt = points.withColumn("_pb", F.floor(_time_us(points, point_col) / w))
    iv = intervals.filter(
        _time_us(intervals, start_col) <= _time_us(intervals, end_col)
    ).withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.floor(_time_us(intervals, start_col) / w),
                F.floor(_time_us(intervals, end_col) / w),
            )
        ),
    )
    contained = (_time_us(pt, point_col) >= _time_us(iv, start_col)) & (
        _time_us(pt, point_col) <= _time_us(iv, end_col)
    )
    cond = pt["_pb"] == iv["_ib"]
    for c in by:
        cond = cond & (pt[c] == iv[c])
    cond = cond & contained
    out_cols = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in by
    ]
    # ONE join for both modes: containment lives in the join CONDITION (the
    # equi keys still drive the shuffle/hash; BETWEEN evaluates inside the
    # join), so ``left`` is a plain left-outer — never-contained points come
    # back once with NULL interval columns directly from the join operator.
    # The previous formulation ran the bucketized join TWICE for how="left"
    # (matched + a distinct() marker anti-join) and that anti-join compared
    # every point column null-UNSAFELY, re-emitting matched rows carrying a
    # NULL payload column. Single-join = single execution, no row identity
    # comparison at all.
    return pt.join(iv, cond, how).select(*out_cols)
