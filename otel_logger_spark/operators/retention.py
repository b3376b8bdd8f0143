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

The audit is ONE accounting pass however many partitions expire (a year x
4 sinks is ~1,500 partitions — per-partition lineage calls would be 1,500
sequential footer loops or Spark jobs): small tables get a single
recursive listing + driver footer reads; big ones get a single
distributed empty-required-schema job over exactly the expired
directories (the same two-tier strategy as sinks.parquet_partition_lineage,
chosen by one ContentSummary gateway call). tests/test_retention.py pins
the job count.
"""

from __future__ import annotations

import re
from datetime import date, datetime

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from otel_logger_spark.fsio import HadoopFS
from otel_logger_spark.operators.sinks import SMALL_SINK_MAX_FILES


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


def _audit_expired(
    spark: SparkSession, root: str, uris: list[str]
) -> dict[str, dict]:
    """{partition-dir-name: {"n_rows", "n_files"}} for every uri, in ONE
    accounting pass:

    - small table (one ContentSummary call decides): one recursive listing
      of the root + driver footer reads — zero Spark jobs;
    - otherwise: ONE distributed job over exactly the expired directories
      (empty required schema; row counts served from footer metadata),
      grouped by ``input_file_name()``.

    File-to-partition attribution is pure-Python prefix work after a single
    ``relativize_many`` against the root (O(1) extra gateway calls)."""
    fs = HadoopFS(spark, root)
    names = {u.rstrip("/").rsplit("/", 1)[-1] for u in uris}
    per = {n: {"n_rows": 0, "n_files": 0} for n in names}

    if fs.file_count(root) <= 2 * SMALL_SINK_MAX_FILES + 4:
        files = fs.list_files_recursive(root, ".parquet")
        counted = [
            (f, rel.split("/", 1)[0])
            for f, rel in zip(files, fs.relativize_many(root, files))
            if rel.split("/", 1)[0] in names
        ]
        pairs = [(head, fs.parquet_row_count(f)) for f, head in counted]
    else:
        from pyspark.errors import AnalysisException

        try:
            rows = (
                spark.read.parquet(*uris)
                .groupBy(F.input_file_name().alias("file"))
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .collect()
            )
        except AnalysisException:
            # Every expired partition is parquet-empty (markers/_SUCCESS
            # only), so schema inference has nothing to read. Same outcome
            # as the small branch on empty dirs: zero-count audit entries,
            # expiry proceeds. (One non-empty partition in the batch is
            # enough to infer the schema; empty ones then just contribute
            # no rows — only the ALL-empty case lands here.)
            rows = []
        rels = fs.relativize_many(root, [r["file"] for r in rows])
        pairs = [
            (rel.split("/", 1)[0], int(r["n_rows"]))
            for rel, r in zip(rels, rows)
        ]
    for head, n in pairs:
        if head in per:
            per[head]["n_rows"] += n
            per[head]["n_files"] += 1
    return per


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
    reports without deleting (the operational preview). The audit is one
    batched pass (listing or Spark job) across ALL expired partitions."""
    fs = HadoopFS(spark, path)
    to_expire, kept = [], []
    for d, uri in list_date_partitions(spark, path, partition_col):
        (kept.append(d.isoformat()) if d >= before else to_expire.append((d, uri)))
    audit = _audit_expired(spark, path, [u for _, u in to_expire]) if to_expire else {}
    expired = []
    for d, uri in to_expire:
        name = uri.rstrip("/").rsplit("/", 1)[-1]
        counts = audit.get(name, {"n_rows": 0, "n_files": 0})
        if not dry_run:
            fs._fs.delete(fs._p(uri), True)
        expired.append({
            "partition": f"{partition_col}={d.isoformat()}",
            "n_rows": counts["n_rows"],
            "n_files": counts["n_files"],
        })
    return {"expired": expired, "kept": kept, "dry_run": dry_run}
