"""Partition TTL: expiry deletes exactly the pre-cutoff date partitions,
accounts every removed row before deletion, and dry-run touches nothing."""

from datetime import date, datetime

from pyspark.sql import functions as F

from otel_logger_spark.operators.retention import (
    expire_partitions,
    list_date_partitions,
)


def _dated_sink(spark, path, days):
    rows = []
    for i, d in enumerate(days):
        ts = datetime(2024, 1, d, 12, 0, 0)
        rows += [(f"c{i}-{j}", ts) for j in range(10 * (i + 1))]
    df = spark.createDataFrame(rows, "conv_id string, event_ts timestamp")
    df.withColumn("event_date", F.to_date("event_ts")).write.partitionBy(
        "event_date"
    ).parquet(path)


def test_expire_deletes_only_pre_cutoff(spark, tmp_path):
    path = str(tmp_path / "dated")
    _dated_sink(spark, path, days=[1, 5, 9, 13])
    got = list_date_partitions(spark, path)
    assert [d.isoformat() for d, _ in got] == [
        "2024-01-01", "2024-01-05", "2024-01-09", "2024-01-13"
    ]
    # dry run: full report, nothing deleted
    preview = expire_partitions(spark, path, before=date(2024, 1, 9), dry_run=True)
    assert [e["partition"] for e in preview["expired"]] == [
        "event_date=2024-01-01", "event_date=2024-01-05"
    ]
    assert spark.read.parquet(path).count() == 10 + 20 + 30 + 40
    # real run: exact rows accounted, exact partitions gone
    res = expire_partitions(spark, path, before=date(2024, 1, 9))
    assert [e["n_rows"] for e in res["expired"]] == [10, 20]
    assert all(e["n_files"] >= 1 for e in res["expired"])
    assert res["kept"] == ["2024-01-09", "2024-01-13"]
    left = spark.read.parquet(path)
    assert left.count() == 30 + 40
    assert {r["event_date"].isoformat() for r in left.select("event_date").distinct().collect()} == {
        "2024-01-09", "2024-01-13"
    }


def test_expire_noop_when_all_within_window(spark, tmp_path):
    path = str(tmp_path / "fresh")
    _dated_sink(spark, path, days=[20, 25])
    res = expire_partitions(spark, path, before=date(2024, 1, 10))
    assert res["expired"] == []
    assert spark.read.parquet(path).count() == 30
