"""Golden tests for the parse stage, ported from the reference's
table-driven tests: prefix extraction (main_test.go:25-68), timestamp
conformance (main_test.go:70-125), full parse semantics
(main_test.go:127-264), field precedence (main_test.go:327-368), severity
map (main_test.go:286-311), prefixed-message cases (main_test.go:370-409).
"""

from datetime import datetime, timezone

import pytest

from otel_logger_spark.functions.parse import (
    extract_json,
    parse_entry,
    parse_go_timestamp,
)


def utc(*a):
    return datetime(*a, tzinfo=timezone.utc)


# --- ExtractJSON (main_test.go:25-68) ---------------------------------------

JSON = '{"level": "info", "message": "test"}'


@pytest.mark.parametrize(
    "line",
    [
        JSON,  # pure JSON
        "2024-01-15T10:30:45.123Z " + JSON,  # ISO prefix
        "2024-01-15 10:30:45 " + JSON,  # space-separated prefix
        "2024-01-15T10:30:45+02:00 " + JSON,  # tz-offset prefix
    ],
)
def test_extract_json_strips_prefix(line):
    assert extract_json(line) == JSON


def test_extract_json_multiline_passthrough():
    # Go's RE2 `$` is end-of-text: multiline entries never match the prefix
    # regex and pass through whole (main.go:156-171)
    s = "2024-01-15T10:30:45Z line1\n  line2"
    assert extract_json(s) == s


# --- parseTimestamp (main_test.go:70-125; layouts main.go:250-257) ----------


@pytest.mark.parametrize(
    "s,expected",
    [
        ("2024-01-15T10:30:45Z", utc(2024, 1, 15, 10, 30, 45)),
        ("2024-01-15T10:30:45.123Z", utc(2024, 1, 15, 10, 30, 45, 123000)),
        ("2024-01-15T10:30:45.123456789Z", utc(2024, 1, 15, 10, 30, 45, 123456)),
        ("2024-01-15T10:30:45+02:00", utc(2024, 1, 15, 8, 30, 45)),
        ("2024-01-15T10:30:45-05:30", utc(2024, 1, 15, 16, 0, 45)),
        ("2024-01-15 10:30:45", utc(2024, 1, 15, 10, 30, 45)),
        ("2024-01-15T10:30:45", utc(2024, 1, 15, 10, 30, 45)),
    ],
)
def test_parse_timestamp_ok(s, expected):
    assert parse_go_timestamp(s) == expected


@pytest.mark.parametrize(
    "s",
    [
        "not a timestamp",
        "2024-01-15",  # date only — no layout matches
        "10:30:45",
        "2024-01-15 10:30:45+02:00",  # space separator never carries a zone
        "2024-13-15T10:30:45Z",  # invalid month
        "",
    ],
)
def test_parse_timestamp_fail(s):
    assert parse_go_timestamp(s) is None


# --- ParseLogEntry (main_test.go:127-264) ------------------------------------


def test_parse_standard_json():
    ts, level, msg, attrs, ok = parse_entry(
        '{"timestamp":"2024-01-15T10:30:45Z","level":"info","message":"test message","service":"api"}'
    )
    assert ok
    assert ts == utc(2024, 1, 15, 10, 30, 45)
    assert level == "info"
    assert msg == "test message"
    assert attrs == {"service": "api"}


def test_parse_logstash_alt_keys():
    ts, level, msg, attrs, ok = parse_entry(
        '{"@timestamp":"2024-01-15T10:30:45.123Z","level":"INFO","message":"logstash message"}'
    )
    assert ok and level == "INFO" and msg == "logstash message"
    assert ts == utc(2024, 1, 15, 10, 30, 45, 123000)


def test_parse_custom_keys_use_defaults():
    # "priority" is a default level key; custom ts/message keys are not
    ts, level, msg, attrs, ok = parse_entry(
        '{"created_at":"2024-01-15T10:30:45Z","priority":"high","description":"custom format"}'
    )
    assert ok and level == "high"
    assert msg == "Log entry"  # default (main.go:239)
    assert ts is None  # created_at not in default ts keys -> now() fallback
    assert attrs == {"created_at": "2024-01-15T10:30:45Z", "description": "custom format"}


def test_parse_unix_timestamp():
    ts, level, msg, attrs, ok = parse_entry(
        '{"timestamp":1705315845,"level":"debug","message":"unix timestamp"}'
    )
    assert ok and level == "debug" and msg == "unix timestamp"
    assert ts == datetime.fromtimestamp(1705315845, tz=timezone.utc)


def test_parse_malformed_json_fallback():
    line = '{"invalid": "json", "missing_quote: "should_fail"}'
    ts, level, msg, attrs, ok = parse_entry(line)
    assert not ok
    assert level == "info" and msg == line and attrs == {}
    assert ts is None


def test_parse_plain_text_fallback():
    ts, level, msg, attrs, ok = parse_entry("This is not JSON at all")
    assert not ok and level == "info" and msg == "This is not JSON at all"


def test_parse_json_array_is_not_object():
    # json.Unmarshal into map[string]any fails for arrays -> fallback
    line = '[{"message": "First entry"}]'
    ts, level, msg, attrs, ok = parse_entry(line)
    assert not ok and msg == line


def test_parse_empty_object_defaults():
    ts, level, msg, attrs, ok = parse_entry("{}")
    assert ok and level == "info" and msg == "Log entry" and attrs == {}


# --- field precedence: first-PRESENT-key wins (main_test.go:327-368) ---------


def test_ts_precedence_first_key_wins():
    ts, *_ = parse_entry(
        '{"timestamp":"2024-01-15T12:30:45Z","ts":"2024-01-15T01:01:01Z","message":"m"}'
    )
    assert ts == utc(2024, 1, 15, 12, 30, 45)


def test_ts_first_present_key_wins_even_if_unparseable():
    # "timestamp" present but garbage: Go deletes it, breaks, falls back to
    # now() — it does NOT try "ts" (main.go:194-207)
    ts, level, msg, attrs, ok = parse_entry(
        '{"timestamp":"garbage","ts":"2024-01-15T01:01:01Z","message":"m"}'
    )
    assert ts is None
    assert "timestamp" not in attrs and attrs == {"ts": "2024-01-15T01:01:01Z"}


def test_level_only_string_values_match():
    # numeric "level" doesn't type-assert to string -> falls through to
    # "severity" (main.go:217); the numeric level stays in attrs
    ts, level, msg, attrs, ok = parse_entry('{"level":3,"severity":"warn","message":"m"}')
    assert level == "warn"
    assert attrs == {"level": "3"}


def test_msg_precedence():
    _, _, msg, attrs, _ = parse_entry('{"msg":"from msg","text":"from text"}')
    assert msg == "from msg"
    assert attrs == {"text": "from text"}


def test_promoted_keys_deleted():
    _, _, _, attrs, _ = parse_entry(
        '{"timestamp":"2024-01-15T10:30:45Z","level":"warn","message":"x","ts":"keep","lvl":"keep2"}'
    )
    # only the FIRST matching key per family is deleted
    assert attrs == {"ts": "keep", "lvl": "keep2"}


# --- prefixed messages (main_test.go:370-409) --------------------------------


@pytest.mark.parametrize(
    "line,expected_msg",
    [
        ('2024-01-15T10:30:45Z {"message": "test"}', "test"),
        ('2024-01-15 10:30:45 {"level": "warn", "message": "warning"}', "warning"),
        ("2024-01-15T10:30:45.123Z error message", "2024-01-15T10:30:45.123Z error message"),
    ],
)
def test_prefixed_lines(line, expected_msg):
    # prefixed JSON parses; prefixed plain text falls back to the WHOLE
    # trimmed line as message (raw preserved)
    _, _, msg, _, _ = parse_entry(line)
    assert msg == expected_msg


# --- attribute stringification (main.go:281-295) ------------------------------


def test_nested_attrs_marshaled():
    _, _, _, attrs, _ = parse_entry(
        '{"message":"m","memoryUsage":{"rss":1048576,"heap":524288},"tags":["a","b"],"ok":true,"ratio":0.75,"count":42}'
    )
    assert attrs == {
        "memoryUsage": '{"heap":524288,"rss":1048576}',
        "tags": '["a","b"]',
        "ok": "true",
        "ratio": "0.75",
        "count": "42",
    }


# --- crash-safety fixes (round 2 advice) -------------------------------------


def test_parse_timestamp_tz_offset_out_of_range():
    # Go's time.Time represents these; Python's datetime cannot — the
    # zero-rows-dropped invariant demands graceful None, not OverflowError.
    assert parse_go_timestamp("0001-01-01T00:00:00+01:00") is None
    assert parse_go_timestamp("9999-12-31T23:59:59-01:00") is None
    # in-range offsets near the edges still parse
    assert parse_go_timestamp("0001-01-01T02:00:00+01:00") == utc(1, 1, 1, 1)


def test_parse_timestamp_overflow_falls_back_in_entry():
    ets, level, msg, attrs, ok = parse_entry(
        '{"ts":"0001-01-01T00:00:00+01:00","level":"warn","message":"m"}'
    )
    assert ets is None and ok and level == "warn" and msg == "m"


def test_lone_surrogate_escapes_scrubbed():
    # {"a":"\ud800"} is valid JSON text; Go's Unmarshal yields U+FFFD.
    ets, level, msg, attrs, ok = parse_entry(
        '{"message":"bad \\ud800 one","level":"\\udfff","k\\ud801":"v\\ud802"}'
    )
    assert ok
    assert msg == "bad � one"
    assert level == "�"
    assert attrs == {"k�": "v�"}
    for s in (msg, level, *attrs, *attrs.values()):
        s.encode("utf-8")  # Arrow-serializable


def test_valid_surrogate_pairs_untouched():
    ets, level, msg, attrs, ok = parse_entry('{"message":"hi \\ud83d\\ude00"}')
    assert msg == "hi \U0001f600"
