"""Sessionization: split conversations into sessions by event-time gaps.

A standard log-pipeline operator (idle-gap sessionization): a new session
starts when the gap since the previous turn exceeds the threshold. Same
running-sum window shape as the multiline coalescer (S4) — one ordered pass
over the existing conv_id partitioning, no extra shuffle when composed
with the pipeline. Streaming equivalent: ``F.session_window`` (noted in
streaming/pipeline.py's watermark discussion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sessions(
    df: DataFrame,
    gap_seconds: int = 300,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("conv_id",),
    order_col: str = "turn_idx",
) -> DataFrame:
    """Adds ``session_id`` (0-based within the conversation)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    ts = F.col(ts_col).cast("timestamp")  # parquet NTZ -> instant (session tz UTC)
    gap_us = F.unix_micros(ts) - F.unix_micros(F.lag(ts).over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_id", F.sum(is_new).over(run) - F.lit(1))


def session_stats(
    df: DataFrame, gap_seconds: int = 300, ts_col: str = "ts"
) -> DataFrame:
    """Per-conversation session rollup: session count, largest session,
    total idle gaps exceeding the threshold."""
    s = with_sessions(df, gap_seconds, ts_col)
    per_session = s.groupBy("conv_id", "session_id").agg(
        F.count("*").alias("n_turns"),
        F.unix_micros(F.max(F.col(ts_col).cast("timestamp"))).alias("end_us"),
        F.unix_micros(F.min(F.col(ts_col).cast("timestamp"))).alias("start_us"),
    )
    return per_session.groupBy("conv_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.max("n_turns").alias("max_session_turns"),
        F.sum("n_turns").alias("n_turns"),
        F.max(F.col("end_us") - F.col("start_us")).alias("max_session_span_us"),
    )
