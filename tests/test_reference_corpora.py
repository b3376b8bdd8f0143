"""Integration parity with the reference's own corpora: the table-driven
cases from integration_test.go:15-103 and the example fixture files
(/root/reference/examples/*.txt) run through the full Spark pipeline.
Skipped when the reference checkout isn't present."""

import os

import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.parse import parse_entry
from otel_logger_spark.pipeline import build_parsed
from otel_logger_spark.sources.textfile import read_log_files

REF = "/root/reference/examples"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not present")

# integration_test.go:24-76, verbatim inputs/expectations
CASES = [
    (
        "standard_json",
        [
            '{"timestamp": "2024-01-15T10:30:45Z", "level": "info", "message": "User logged in", "user_id": 12345}',
            '{"timestamp": "2024-01-15T10:30:46Z", "level": "error", "message": "Database connection failed", "error": "timeout"}',
            '{"timestamp": "2024-01-15T10:30:47Z", "level": "debug", "message": "Cache hit", "key": "user:12345"}',
        ],
        dict(ts_fields=("timestamp",), level_fields=("level",), msg_fields=("message",)),
        ["info", "error", "debug"],
    ),
    (
        "logstash",
        [
            '{"@timestamp": "2024-01-15T10:30:45Z", "level": "INFO", "message": "Application started", "version": "1.0.0"}',
            '{"@timestamp": "2024-01-15T10:30:46Z", "level": "WARN", "message": "High memory usage", "memory": "85%"}',
        ],
        dict(ts_fields=("@timestamp",), level_fields=("level",), msg_fields=("message",)),
        ["INFO", "WARN"],
    ),
    (
        "prefixed_custom_regex",
        [
            '2024-01-15T10:30:45Z {"level": "info", "message": "Prefixed log entry"}',
            '2024-01-15T10:30:46.123Z {"level": "error", "message": "Error with milliseconds"}',
        ],
        dict(json_prefix=r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}[.\d]*Z?\s*)?(.*)$"),
        ["info", "error"],
    ),
    (
        "mixed_valid_invalid",
        [
            '{"level": "info", "message": "Valid JSON"}',
            "This is not JSON at all",
            '{"level": "error", "message": "Another valid JSON"}',
            '{"malformed": "json", "missing_quote: "should_fail"}',
        ],
        dict(),
        ["info", "info", "error", "info"],
    ),
]


@pytest.mark.parametrize("name,lines,cfg,expected_levels", CASES)
def test_integration_cases(name, lines, cfg, expected_levels):
    import re

    from otel_logger_spark.functions.parse import (
        DEFAULT_LEVEL_FIELDS,
        DEFAULT_MESSAGE_FIELDS,
        DEFAULT_PREFIX_RE,
        DEFAULT_TIMESTAMP_FIELDS,
    )

    prefix = re.compile(cfg["json_prefix"]) if "json_prefix" in cfg else DEFAULT_PREFIX_RE
    levels = [
        parse_entry(
            line,
            prefix,
            cfg.get("ts_fields", DEFAULT_TIMESTAMP_FIELDS),
            cfg.get("level_fields", DEFAULT_LEVEL_FIELDS),
            cfg.get("msg_fields", DEFAULT_MESSAGE_FIELDS),
        )[1]
        for line in lines
    ]
    assert levels == expected_levels  # zero entries dropped: len equality implicit


@needs_ref
def test_example_files_end_to_end(spark, tmp_path):
    """Every reference example corpus flows through the full pipeline:
    nothing is dropped, every entry gets a severity, raw is preserved."""
    import shutil

    d = tmp_path / "examples"
    d.mkdir()
    for f in ("json-logs.txt", "mixed-logs.txt", "prefixed-logs.txt",
              "logstash-format.txt", "winston-format.txt", "custom-format.txt"):
        shutil.copy(os.path.join(REF, f), d / f)
    transcripts = read_log_files(spark, str(d))
    routed = build_parsed(transcripts)
    rows = routed.collect()
    assert len(rows) > 0
    assert all(r["severity_num"] in (1, 5, 9, 13, 17, 21) for r in rows)
    assert all(r["raw"] for r in rows)
    # per-file entry counts match the batch coalescer (no silent drops)
    from otel_logger_spark.operators.multiline import coalesce_entries

    expected = {
        r["conv_id"]: r["n"]
        for r in coalesce_entries(transcripts).groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    got = {}
    for r in rows:
        got[r["conv_id"]] = got.get(r["conv_id"], 0) + 1
    assert got == expected


@needs_ref
def test_parallelsort_single_entry(spark, tmp_path):
    """examples/parallellsort.json (32 KB pretty-printed JSON array) must
    coalesce to exactly ONE logical entry (integration_test.go:627-660),
    and — being an array, not an object — take the plain-text fallback."""
    import shutil

    d = tmp_path / "psort"
    d.mkdir()
    shutil.copy(os.path.join(REF, "parallellsort.json"), d / "parallellsort.json")
    routed = build_parsed(read_log_files(spark, str(d)))
    rows = routed.collect()
    assert len(rows) == 1
    assert not rows[0]["json_ok"]
    assert rows[0]["raw"].lstrip().startswith("[")
