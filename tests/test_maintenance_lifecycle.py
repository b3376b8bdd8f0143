"""Composed maintenance lifecycle (maintenance.run_maintenance_lifecycle):
expire -> per-partition rewrite (zorder or compact) over one
date-partitioned sink, proving the three operators' guards compose — a
crashed rewrite's .compact_tmp is recovered/discarded by the NEXT pass
and never mistaken for a partition — with the total Spark-job count
pinned. BENCH/maintenance_lifecycle.md records the measured counts."""

import os
from datetime import date, datetime

from pyspark.sql import functions as F

from otel_logger_spark.maintenance import run_maintenance_lifecycle
from otel_logger_spark.operators.compact import TMP_SUFFIX


def _dated_sink(spark, path, days, rows_per_day=60, files_per_day=6):
    rows = []
    for i, d in enumerate(days):
        ts = datetime(2024, 1, d, 12, 0, 0)
        rows += [
            (f"c{i}-{j}", j, 1000 * d + j, ts) for j in range(rows_per_day)
        ]
    df = spark.createDataFrame(
        rows, "conv_id string, user_id long, ep long, event_ts timestamp"
    )
    (
        df.withColumn("event_date", F.to_date("event_ts"))
        .repartition(files_per_day)
        .write.partitionBy("event_date")
        .parquet(path)
    )


def _counts_by_day(spark, path):
    return {
        r["event_date"].isoformat(): r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_date").agg(F.count("*").alias("n")).collect()
    }


def test_lifecycle_expire_then_zorder_with_crash_leftovers(spark, tmp_path):
    """Full rehearsal: 5 partitions, 2 expired; a completed .compact_tmp
    next to a MISSING kept partition (crash between delete and rename of
    a prior pass — invisible to the partition listing, so only the
    lifecycle's root-level recovery sweep can save it) and a stale tmp
    next to a present one. The lifecycle recovers the first, discards
    the second, deletes the expired two, z-orders the three survivors,
    and loses zero rows."""
    path = str(tmp_path / "sink")
    _dated_sink(spark, path, days=[1, 2, 5, 6, 7])
    before = _counts_by_day(spark, path)

    # crash leftover 1: completed tmp, missing target (mid-swap crash)
    p6 = f"{path}/event_date=2024-01-06"
    os.rename(p6, p6 + TMP_SUFFIX)
    # crash leftover 2: stale tmp next to an intact partition
    p7 = f"{path}/event_date=2024-01-07"
    os.makedirs(p7 + TMP_SUFFIX)
    open(p7 + TMP_SUFFIX + "/part-stale.parquet", "w").close()

    report = run_maintenance_lifecycle(
        spark, path, before=date(2024, 1, 5), zorder_cols=["user_id", "ep"],
        target_file_bytes=1 << 30,
    )

    assert report["mode"] == "zorder"
    assert sorted(e["partition"] for e in report["expire"]["expired"]) == [
        "event_date=2024-01-01", "event_date=2024-01-02",
    ]
    assert sum(e["n_rows"] for e in report["expire"]["expired"]) == 120
    assert sorted(r["partition"] for r in report["rewrites"]) == [
        "event_date=2024-01-05", "event_date=2024-01-06",
        "event_date=2024-01-07",
    ]
    assert report["recovered_pre_pass"] == ["event_date=2024-01-06"]
    by_part = {r["partition"]: r for r in report["rewrites"]}
    # already recovered by the root sweep; the stale tmp next to the
    # intact 01-07 was discarded there too (not a recovery)
    assert by_part["event_date=2024-01-06"]["recovered"] is False
    assert by_part["event_date=2024-01-07"]["recovered"] is False
    assert all(r["n_rows"] == 60 for r in report["rewrites"])
    # no tmp dirs survive the pass
    assert not [d for d in os.listdir(path) if d.endswith(TMP_SUFFIX)]
    # data: expired gone, survivors intact (including the recovered one)
    after = _counts_by_day(spark, path)
    assert after == {k: v for k, v in before.items() if k >= "2024-01-05"}
    # layout: z-ordered partitions are compact (one file per partition
    # at this size) — zorder subsumes compaction, no second rewrite
    for day in ("05", "06", "07"):
        files = [
            f for f in os.listdir(f"{path}/event_date=2024-01-{day}")
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, (day, files)


def test_lifecycle_compact_mode_job_count_pinned(spark, tmp_path):
    """Without curve columns the rewrite stage is compaction; the whole
    lifecycle (expire audit + 3 partition compactions) stays within a
    pinned Spark-job budget — O(1) jobs per partition, not O(files)."""
    path = str(tmp_path / "sink_jobs")
    _dated_sink(spark, path, days=[1, 2, 5, 6, 7])
    sc = spark.sparkContext
    sc.setLocalProperty("spark.jobGroup.id", "lifecycle-jobs")
    try:
        report = run_maintenance_lifecycle(
            spark, path, before=date(2024, 1, 5), target_file_bytes=1 << 30,
        )
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("lifecycle-jobs"))
    # measured 9: expire audit 0 (small root: driver footer reads) + 3
    # O(1) jobs per compacted partition (scan planning + rewrite +
    # verify) — pin the per-partition bound; a regression to per-FILE
    # jobs (6 files/partition here) blows well past it
    assert n_jobs <= 3 * len(report["rewrites"]) + 1, n_jobs
    assert report["expire"]["expired"] and len(report["rewrites"]) == 3
    assert all(
        r["files_after"] < r["files_before"] for r in report["rewrites"]
    )
    assert _counts_by_day(spark, path) == {
        "2024-01-05": 60, "2024-01-06": 60, "2024-01-07": 60,
    }


def test_lifecycle_refuses_bad_curve_before_deleting(spark, tmp_path):
    """Parameter validation composes with destructiveness ordering: an
    over-wide z-curve fails BEFORE the TTL delete touches anything."""
    import pytest

    path = str(tmp_path / "sink_guard")
    _dated_sink(spark, path, days=[1, 6])
    with pytest.raises(ValueError, match="63 usable bits"):
        run_maintenance_lifecycle(
            spark, path, before=date(2024, 1, 5),
            zorder_cols=["a", "b", "c", "d"], bits=16,
        )
    # nothing deleted
    assert _counts_by_day(spark, path) == {"2024-01-01": 60, "2024-01-06": 60}
