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
from otel_logger_spark.operators.sinks import (
    SMALL_SINK_MAX_FILES,
    parquet_partition_lineage,
)

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


def _file_fingerprints(
    spark: SparkSession, fs: HadoopFS, path: str
) -> set[tuple[str, int]]:
    """{(uri, byte length)} of every part file. Doubles as the
    concurrent-writer change detector: an appended, replaced, or removed
    part file changes the set.

    Two-tier like the lineage primitive (one ContentSummary call decides):
    small dirs use the driver RemoteIterator (statuses carry the lengths —
    no per-file getFileStatus, but still one py4j round-trip per file);
    big dirs — the compaction-worthy ones — use Spark's ``binaryFile``
    reader with only (path, length) selected, so the recursive listing
    runs JVM-side and no content bytes are read. Measured at 5,000 files:
    31.6 s (iterator) -> 1.0-2.0 s (BENCH/compact_scale.md)."""
    if fs.file_count(path) <= 2 * SMALL_SINK_MAX_FILES + 4:
        it = fs._fs.listFiles(fs._p(path), True)
        out = set()
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(".parquet"):
                out.add((p, int(st.getLen())))
        return out
    rows = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "length")
        .collect()
    )
    return {(r["path"], int(r["length"])) for r in rows}


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
    nothing.

    Concurrency contract: the directory must have no ACTIVE writer (stop
    the stream / pause the pipeline first) — compaction replaces the
    directory wholesale, and rows written after the rewrite's scan cannot
    be in the rewrite. The contract is ENFORCED, not assumed: part files
    (name + length) are fingerprinted before the rewrite and re-listed
    just before the swap; any change aborts with the source untouched and
    the tmp removed. The unclosable residue is the recheck->delete instant
    itself — the same window every non-transactional rewrite bottoms out
    in (a table format closes it with commit-conflict retries)."""
    return rewrite_verify_swap(
        spark,
        path,
        transform=lambda df, n_target: df.repartition(n_target),
        target_file_bytes=target_file_bytes,
        codec=codec,
        skip_if_compact=True,
    )


def rewrite_verify_swap(
    spark: SparkSession,
    path: str,
    transform,
    target_file_bytes: int = 512 * 1024 * 1024,
    codec: str = "snappy",
    skip_if_compact: bool = False,
    expected_rows=None,
) -> dict:
    """The shared maintenance-rewrite protocol (compaction, Z-ordering,
    any whole-directory layout change): fingerprint -> rewrite
    ``transform(df, n_target)`` into tmp -> footer-verify row counts ->
    re-fingerprint (concurrent-writer guard) -> swap. Crash anywhere
    leaves a recoverable state (recover_compaction); any row-count or
    listing discrepancy aborts with the source untouched.

    ``expected_rows``: by default the verify demands tmp == source
    (layout-only rewrites). A row-REMOVING rewrite (operators/forget.py)
    passes a callable ``src_rows -> expected`` computed from its own
    matched-row accounting, and the verify demands that instead — the
    row delta is still asserted, never waived."""
    recovered = recover_compaction(spark, path)
    fs = HadoopFS(spark, path)
    fps = _file_fingerprints(spark, fs, path)
    files = sorted(p for p, _ in fps)
    if not files:
        return {"n_rows": 0, "files_before": 0, "files_after": 0,
                "recovered": recovered}
    # byte total straight from the listing statuses (exact part-file
    # bytes; no ContentSummary call, no marker/.crc noise) — still zero
    # per-file gateway round-trips
    total_bytes = sum(length for _, length in fps)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    if skip_if_compact and len(files) <= n_target:
        return {"n_rows": sum(
            p["n_rows"] for p in parquet_partition_lineage(spark, path)
        ), "files_before": len(files), "files_after": len(files),
            "recovered": recovered}

    src_rows = sum(p["n_rows"] for p in parquet_partition_lineage(spark, path))
    tmp = path + TMP_SUFFIX
    (
        transform(spark.read.parquet(path), n_target)
        .write.mode("overwrite")
        .option("compression", codec)
        .parquet(tmp)
    )
    tmp_parts = parquet_partition_lineage(spark, tmp)
    tmp_rows = sum(p["n_rows"] for p in tmp_parts)
    want_rows = src_rows if expected_rows is None else expected_rows(src_rows)
    if tmp_rows != want_rows:
        # leave the source untouched; remove the bad rewrite
        fs._fs.delete(fs._p(tmp), True)
        raise RuntimeError(
            f"rewrite verify failed at {path}: expected {want_rows} rows "
            f"(source {src_rows}), rewrite {tmp_rows} — source left "
            "untouched"
        )
    fps_now = _file_fingerprints(spark, fs, path)
    if fps_now != fps:
        fs._fs.delete(fs._p(tmp), True)
        raise RuntimeError(
            f"concurrent writer detected at {path}: "
            f"{len(fps_now - fps)} part file(s) appeared and "
            f"{len(fps - fps_now)} changed or vanished since the rewrite "
            "began — compaction aborted, source left untouched (stop the "
            "writer before compacting)"
        )
    fs._fs.delete(fs._p(path), True)
    fs._fs.rename(fs._p(tmp), fs._p(path))
    return {
        # == src_rows for layout-only rewrites; the post-delete count for
        # row-removing ones (verified against expected_rows either way)
        "n_rows": tmp_rows,
        "rows_removed": src_rows - tmp_rows,
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
