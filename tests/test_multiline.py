"""Multiline coalescer golden tests, ported from
/root/reference/multiline_test.go:11-256 (every case). Each input line
becomes one transcript turn; expected output is the list of coalesced
entry texts in (conv_id, turn_idx) order.

Both formulations are tested: the window/running-sum plan (production,
scales) and the applyInPandas sequential cross-check.
"""

from datetime import datetime

import pytest

from otel_logger_spark.operators.multiline import (
    coalesce_entries,
    coalesce_entries_pandas,
)

CASES = {
    "single_line": (
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "2024-01-15T10:30:10Z DEBUG Processing user request",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "2024-01-15T10:30:10Z DEBUG Processing user request",
        ],
    ),
    "space_indent": (
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "  - Configuration loaded",
            "  - Database connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "  Exception: NullPointerException",
            "    at com.example.Service.process(Service.java:42)",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application\n  - Configuration loaded\n  - Database connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request\n  Exception: NullPointerException\n    at com.example.Service.process(Service.java:42)",
        ],
    ),
    "tab_indent": (
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "\tConfiguration loaded",
            "\tDatabase connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "\tException: NullPointerException",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application\n\tConfiguration loaded\n\tDatabase connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request\n\tException: NullPointerException",
        ],
    ),
    "orphaned_continuations_dropped": (
        [
            "  - Orphaned continuation line at start",
            "    Another orphaned line",
            "2024-01-15T10:30:00Z INFO Starting application",
            "  - Configuration loaded",
            "  - Database connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "  Exception: NullPointerException",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application\n  - Configuration loaded\n  - Database connection established",
            "2024-01-15T10:30:05Z ERROR Failed to process request\n  Exception: NullPointerException",
        ],
    ),
    "empty_lines_skipped_dont_break_entries": (
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "",
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            "  Exception: NullPointerException",
            "",
            "2024-01-15T10:30:10Z DEBUG Processing user request",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "2024-01-15T10:30:05Z ERROR Failed to process request\n  Exception: NullPointerException",
            "2024-01-15T10:30:10Z DEBUG Processing user request",
        ],
    ),
    "java_stack_trace": (
        [
            "2024-01-15T10:30:05Z ERROR Failed to process request",
            '  java.lang.NullPointerException: Cannot invoke "String.length()" because "str" is null',
            "\tat com.example.service.UserService.validateUser(UserService.java:45)",
            "\t... 23 more",
            "2024-01-15T10:30:10Z INFO Request completed",
        ],
        [
            '2024-01-15T10:30:05Z ERROR Failed to process request\n  java.lang.NullPointerException: Cannot invoke "String.length()" because "str" is null\n\tat com.example.service.UserService.validateUser(UserService.java:45)\n\t... 23 more',
            "2024-01-15T10:30:10Z INFO Request completed",
        ],
    ),
    "whitespace_only_lines_are_orphans": (["", "", "   "], []),
    "json_array_spanning_lines": (
        [
            "[",
            "  {",
            '    "timestamp": "2024-01-15T10:30:00Z",',
            '    "level": "INFO",',
            '    "message": "First entry"',
            "  },",
            "  {",
            '    "message": "Second entry"',
            "  }",
            "]",
        ],
        [
            '[\n  {\n    "timestamp": "2024-01-15T10:30:00Z",\n    "level": "INFO",\n    "message": "First entry"\n  },\n  {\n    "message": "Second entry"\n  }\n]'
        ],
    ),
    "json_object_spanning_lines": (
        [
            "{",
            '  "Plan": {',
            '    "Node Type": "Limit",',
            '    "Total Cost": 258339.57',
            "  },",
            '  "Execution Time": 4725.163',
            "}",
        ],
        [
            '{\n  "Plan": {\n    "Node Type": "Limit",\n    "Total Cost": 258339.57\n  },\n  "Execution Time": 4725.163\n}'
        ],
    ),
    "two_arrays": (
        ["[", '  {"message": "First array"}', "]", "[", '  {"message": "Second array"}', "]"],
        [
            '[\n  {"message": "First array"}\n]',
            '[\n  {"message": "Second array"}\n]',
        ],
    ),
    "mixed_json_and_text": (
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            "[",
            '  {"data": "json array"}',
            "]",
            "2024-01-15T10:30:05Z ERROR Failed to process",
        ],
        [
            "2024-01-15T10:30:00Z INFO Starting application",
            '[\n  {"data": "json array"}\n]',
            "2024-01-15T10:30:05Z ERROR Failed to process",
        ],
    ),
    "inline_brackets_not_continuation": (
        [
            "2024-01-15T10:30:00Z INFO Data: [1, 2, 3]",
            "2024-01-15T10:30:01Z INFO Next log entry",
        ],
        [
            "2024-01-15T10:30:00Z INFO Data: [1, 2, 3]",
            "2024-01-15T10:30:01Z INFO Next log entry",
        ],
    ),
}


def _to_df(spark, lines):
    ts0 = datetime(2024, 1, 15, 10, 30, 0)
    rows = [("c0", i, "assistant", line, None, ts0) for i, line in enumerate(lines)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("impl", [coalesce_entries, coalesce_entries_pandas])
def test_multiline_golden(spark, name, impl):
    lines, expected = CASES[name]
    out = impl(_to_df(spark, lines)).orderBy("turn_idx").collect()
    assert [r["text"] for r in out] == expected
    # entry turn_idx = the start line's turn index
    starts = [r["turn_idx"] for r in out]
    assert starts == sorted(starts)


def test_multiline_multiple_conversations(spark):
    # entries never merge across conversations; conv boundary == stream boundary
    ts0 = datetime(2024, 1, 15, 10, 30, 0)
    rows = [
        ("a", 0, "assistant", "start A", None, ts0),
        ("a", 1, "assistant", "  cont A", None, ts0),
        ("b", 0, "assistant", "  orphan B", None, ts0),
        ("b", 1, "assistant", "start B", None, ts0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = {(r["conv_id"], r["text"]) for r in coalesce_entries(df).collect()}
    assert out == {("a", "start A\n  cont A"), ("b", "start B")}


def test_partitioned_coalescer_matches_window(spark, tmp_path):
    """The shuffle-free per-partition coalescer must equal the window
    coalescer on the textfile source (one file = one ordered stream)."""
    from otel_logger_spark.operators.multiline import (
        coalesce_entries,
        coalesce_entries_partitioned,
    )
    from otel_logger_spark.sources.textfile import read_log_files

    d = tmp_path / "logsA"
    d.mkdir()
    for i in range(6):
        (d / f"f{i}.log").write_text(
            f"2024-01-15T10:30:0{i}Z ERROR boom {i}\n"
            "  at Frame.one(File.java:1)\n"
            "  orphan-free continuation\n"
            f"plain line {i}\n"
            "}\n"  # bare closer attaches to the open entry
        )
    src = read_log_files(spark, str(d))
    key = lambda r: (r["conv_id"], r["turn_idx"], r["text"], r["n_lines"])
    a = sorted(map(key, coalesce_entries(src).collect()))
    b = sorted(map(key, coalesce_entries_partitioned(src).collect()))
    assert a == b and a


def test_limit_early_exit_over_coalesced_stream(spark, tmp_path):
    """Reference parity for pull-based early exit (multiline_test.go:258-294):
    limit(k) over the shuffle-free coalesced stream must NOT read the whole
    input. An Observation on the line stream counts rows actually scanned —
    CollectLimit runs input partitions incrementally when no exchange sits
    in between."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from otel_logger_spark.operators.multiline import coalesce_entries_partitioned
    from otel_logger_spark.sources.textfile import read_log_files

    d = tmp_path / "logsB"
    d.mkdir()
    n_files, lines_per_file = 32, 40
    for i in range(n_files):
        (d / f"f{i:02d}.log").write_text(
            "".join(f"2024-01-15T10:30:45Z INFO line {j}\n  cont {j}\n"
                    for j in range(lines_per_file // 2))
        )
    total_lines = n_files * lines_per_file

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    try:
        src = read_log_files(spark, str(d))
        obs = Observation()
        observed = src.observe(obs, F.count(F.lit(1)).alias("n_scanned"))
        got = coalesce_entries_partitioned(observed).limit(3).collect()
        assert len(got) == 3
        scanned = obs.get["n_scanned"]
        assert scanned < total_lines / 4, (
            f"limit(3) scanned {scanned}/{total_lines} lines — no early exit"
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
