"""Partition retention (TTL) — the other half of sink maintenance next to
compaction (operators/compact.py): a 100 TB log store is a rolling
window, and expiry must be a partition-directory DELETE (O(partitions)
metadata work, exactly what the date-partitioned sink layout exists for),
never a filtered rewrite of the table (O(data)). The Iceberg analogue is
``expire_snapshots`` + partition drop; this is the parquet-directory
version with the engine's no-silent-action discipline: every expired
partition is accounted (rows via footer counts, read BEFORE deletion)
and the report is returned to the caller, so an audit trail of what a
TTL pass removed always exists.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import SparkSession

from otel_logger_spark.fsio import HadoopFS, join_path
from otel_logger_spark.operators.sinks import parquet_partition_lineage


def list_date_partitions(
    spark: SparkSession, path: str, partition_col: str = "event_date"
) -> list[tuple[date, str]]:
    """(date, uri) for each first-level <partition_col>=YYYY-MM-DD child."""
    fs = HadoopFS(spark, path)
    out = []
    pat = re.compile(re.escape(partition_col) + r"=(\d{4}-\d{2}-\d{2})$")
    for st in fs._fs.listStatus(fs._p(path)):
        if not st.isDirectory():
            continue
        m = pat.search(st.getPath().getName())
        if m:
            out.append(
                (datetime.strptime(m.group(1), "%Y-%m-%d").date(),
                 st.getPath().toString())
            )
    return sorted(out)


def expire_partitions(
    spark: SparkSession,
    path: str,
    before: date,
    partition_col: str = "event_date",
    dry_run: bool = False,
) -> dict:
    """Delete every <partition_col>=D partition with D < ``before``.
    Returns {"expired": [{"partition", "n_rows", "n_files"}...],
    "kept": [dates...]} — counts read from footers BEFORE deletion, so the
    audit record exists even though the data no longer does. ``dry_run``
    reports without deleting (the operational preview)."""
    fs = HadoopFS(spark, path)
    expired, kept = [], []
    for d, uri in list_date_partitions(spark, path, partition_col):
        if d >= before:
            kept.append(d.isoformat())
            continue
        parts = parquet_partition_lineage(spark, uri)
        entry = {
            "partition": f"{partition_col}={d.isoformat()}",
            "n_rows": sum(p["n_rows"] for p in parts),
            "n_files": len(parts),
        }
        if not dry_run:
            fs._fs.delete(fs._p(uri), True)
        expired.append(entry)
    return {"expired": expired, "kept": kept, "dry_run": dry_run}
