"""Small-file compaction — the maintenance operator every streaming sink
needs at scale: foreachBatch writes one directory per micro-batch
(exactly-once per (sink, batchId)), which after a week of 5-second
triggers is ~120k directories of kilobyte files; object-store listings
and scan planning degrade long before the data does. Iceberg calls this
rewrite_data_files; this is the parquet-directory analogue, with the same
no-rows-lost discipline as the sinks (A5).

Safety protocol (crash anywhere leaves a recoverable state, and NEVER a
state where rows are lost):
1. rewrite the directory's rows into ``<dir>.compact_tmp`` with
   ``repartition(n)`` sized from the measured input bytes;
2. VERIFY the tmp: _SUCCESS present and footer row count == source row
   count (the lineage primitive, sinks.parquet_partition_lineage);
3. swap: delete the source, rename tmp into place. A crash between 3's
   two steps leaves a complete verified tmp next to a missing dir —
   ``recover_compaction`` (called automatically at the start of every
   compaction) finishes the rename, mirroring the manifest's .tmp
   recovery (fsio.write_text_atomic).

Verification reads footers only (no data pages); the one full read is the
rewrite itself — you cannot compact cheaper than one read + one write.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from otel_logger_spark.fsio import HadoopFS
from otel_logger_spark.operators.sinks import parquet_partition_lineage

TMP_SUFFIX = ".compact_tmp"


def recover_compaction(spark: SparkSession, path: str) -> bool:
    """Finish a compaction interrupted between delete and rename: if the
    target is ABSENT but a completed tmp exists, rename it into place.
    Returns True if a recovery happened. A tmp next to a still-present
    target is a pre-swap leftover (crash before the verify passed or
    before the delete) — the source is intact, so the stale tmp is simply
    removed."""
    fs = HadoopFS(spark, path)
    tmp = path + TMP_SUFFIX
    if not fs.exists(tmp):
        return False
    if fs.exists(path):
        fs._fs.delete(fs._p(tmp), True)  # source intact: tmp is garbage
        return False
    fs._fs.rename(fs._p(tmp), fs._p(path))
    return True


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 512 * 1024 * 1024,
    codec: str = "snappy",
) -> dict:
    """Compact one parquet directory to ~``target_file_bytes`` files.
    Returns {"n_rows", "files_before", "files_after", "recovered"}.
    No-op (beyond recovery) when the directory already meets the target
    file count — rewriting well-sized files would double the IO for
    nothing."""
    recovered = recover_compaction(spark, path)
    fs = HadoopFS(spark, path)
    files = fs.list_files_recursive(path, ".parquet")
    if not files:
        return {"n_rows": 0, "files_before": 0, "files_after": 0,
                "recovered": recovered}
    # ONE gateway call for the byte total (marker/.crc bytes are noise at
    # compaction-worthy sizes) — a per-file getFileStatus loop would be
    # thousands of py4j round-trips on exactly the directories this
    # operator exists for
    total_bytes = int(fs._fs.getContentSummary(fs._p(path)).getLength())
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    if len(files) <= n_target:
        return {"n_rows": sum(
            p["n_rows"] for p in parquet_partition_lineage(spark, path)
        ), "files_before": len(files), "files_after": len(files),
            "recovered": recovered}

    src_rows = sum(p["n_rows"] for p in parquet_partition_lineage(spark, path))
    tmp = path + TMP_SUFFIX
    (
        spark.read.parquet(path)
        .repartition(n_target)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(tmp)
    )
    tmp_parts = parquet_partition_lineage(spark, tmp)
    tmp_rows = sum(p["n_rows"] for p in tmp_parts)
    if tmp_rows != src_rows:
        # leave the source untouched; remove the bad rewrite
        fs._fs.delete(fs._p(tmp), True)
        raise RuntimeError(
            f"compaction verify failed at {path}: source {src_rows} rows, "
            f"rewrite {tmp_rows} — source left untouched"
        )
    fs._fs.delete(fs._p(path), True)
    fs._fs.rename(fs._p(tmp), fs._p(path))
    return {
        "n_rows": src_rows,
        "files_before": len(files),
        "files_after": len(tmp_parts),
        "recovered": recovered,
    }


def compact_streaming_sink(
    spark: SparkSession,
    out_dir: str,
    sink: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> dict:
    """Compact a foreachBatch sink's accumulated batchid=<id> partitions
    into one well-sized flat directory. The batchid column exists for
    WRITE idempotence (retried micro-batches overwrite their own
    partition); once batches are final (the stream is stopped or the
    horizon has passed), the directory-per-batch layout has served its
    purpose. Compaction collapses the directories; batchid survives as an
    ordinary low-cardinality column in the compacted files, so readers
    that selected it still can — row counts and values are untouched."""
    import os

    return compact_parquet_dir(
        spark, os.path.join(out_dir, sink), target_file_bytes
    )
