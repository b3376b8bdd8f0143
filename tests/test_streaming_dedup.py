"""Streaming ingest dedup: redelivered rows (same keys / same content, a
later micro-batch) must be dropped while state stays watermark-bounded."""

import os
from datetime import datetime

import pandas as pd

from otel_logger_spark.schemas import TRANSCRIPT_SCHEMA
from otel_logger_spark.streaming.dedup import (
    dedup_stream_by_content,
    dedup_stream_exact,
)

T0 = datetime(2024, 1, 15, 10, 30, 0)


def _write(d, name, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]", "tool": "string"})
    pdf.to_parquet(os.path.join(d, name), index=False)


def _drain(spark, df, tmp_path, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_dedup_exact_drops_cross_batch_redelivery(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # batch 1: three rows; batch 2 redelivers two of them (same keys,
    # within the horizon) plus one genuinely new row
    _write(in_dir, "b1.parquet", [
        ("c1", 0, "user", "hello", None, T0),
        ("c1", 1, "assistant", "hi", None, T0),
        ("c2", 0, "user", "x", None, T0),
    ])
    _write(in_dir, "b2.parquet", [
        ("c1", 0, "user", "hello", None, T0),          # redelivered
        ("c2", 0, "user", "x", None, T0),              # redelivered
        ("c2", 1, "assistant", "y", None, T0),         # new
    ])
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    rows = _drain(
        spark, dedup_stream_exact(stream, horizon="10 minutes"), tmp_path, "sde"
    )
    got = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    assert got == [("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1)]


def test_stream_dedup_by_content_keys_on_digest(spark, tmp_path):
    in_dir = str(tmp_path / "cin")
    os.makedirs(in_dir)
    _write(in_dir, "b1.parquet", [
        ("c1", 0, "user", "same text", None, T0),
        ("c1", 1, "user", "unique a", None, T0),
    ])
    _write(in_dir, "b2.parquet", [
        ("c9", 7, "tool", "same text", None, T0),  # different keys, same text
        ("c9", 8, "tool", "unique b", None, T0),
    ])
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    rows = _drain(
        spark,
        dedup_stream_by_content(stream, horizon="10 minutes"),
        tmp_path,
        "sdc",
    )
    texts = sorted(r["text"] for r in rows)
    assert texts == ["same text", "unique a", "unique b"]
    assert "_content_sha" not in rows[0].asDict()  # helper column dropped


def test_stream_dedup_matches_batch_dedup_on_synth(spark, tmp_path):
    """Streaming-vs-batch parity: the drained streaming dedup equals
    dropDuplicates on the same (duplicated) input."""
    from otel_logger_spark.synth import synthesize_pandas

    in_dir = str(tmp_path / "pin")
    os.makedirs(in_dir)
    pdf = synthesize_pandas(10, seed=3)
    _write_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pdf = pdf[_write_cols]
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(os.path.join(in_dir, "b1.parquet"), index=False)
    # second file redelivers an overlapping slice
    pdf.iloc[half // 2 :].to_parquet(os.path.join(in_dir, "b2.parquet"), index=False)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    rows = _drain(
        spark, dedup_stream_exact(stream, horizon="365 days"), tmp_path, "sdp"
    )
    got = sorted((r["conv_id"], r["turn_idx"]) for r in rows)
    exp = sorted(
        (r["conv_id"], r["turn_idx"])
        for r in spark.read.parquet(in_dir)
        .dropDuplicates(["conv_id", "turn_idx"])
        .collect()
    )
    assert got == exp
