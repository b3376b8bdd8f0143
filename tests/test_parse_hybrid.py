"""Parity: the hybrid (JVM fast path + UDF) parse plan must produce
byte-identical results to the pure pandas-UDF plan on every input — the
fast path is an optimization, never a semantics change.

The corpus is the synthetic generator's full style mix plus adversarial
lines chosen to sit exactly on the eligibility boundaries (duplicate keys,
numeric/bool promoted values, unsafe numbers, \\u escapes, nested objects,
multiline JSON, offset edge cases)."""

from datetime import datetime

import pandas as pd
import pytest

from otel_logger_spark.functions.parse import with_parsed
from otel_logger_spark.synth import synthesize_pandas

TS = datetime(2024, 1, 15, 10, 30, 0)

ADVERSARIAL = [
    # fast-path eligible shapes
    '{"timestamp":"2024-01-15T10:30:45Z","level":"warn","message":"m","k":"v"}',
    '{"@timestamp":"2024-01-15T10:30:45.123Z","severity":"ERROR","msg":"m"}',
    '2024-01-15T10:30:45Z {"level":"info","message":"prefixed","attempt":3}',
    '2024-01-15 10:30:45 {"level":"info","message":"space prefix"}',
    '{"ts":"2024-01-15T10:30:45+05:30","lvl":"debug","text":"offset"}',
    '{"ts":"2024-01-15 10:30:45","message":"space-sep ts"}',
    '{"ts":"not-a-time","timestamp":"2024-01-15T10:30:45Z","message":"first key wins"}',
    '{"ok":true,"done":false,"n":42,"neg":-7,"z":0,"message":"bools and ints"}',
    '{ "level" : "warn" ,\t"message" : "inner ws" }',
    "{}",
    '{"level":"","message":""}',  # empty strings are valid promoted values
    '{"escape":"a\\n\\t\\"b\\\\c\\/d","message":"escapes"}',
    '{"timestamp":"0001-01-01T00:00:00Z","message":"go zero time"}',
    '{"timestamp":"2024-01-15T10:30:45.1234567Z","message":"7-digit frac"}',
    '{"timestamp":"2024-13-01T10:30:45Z","message":"bad month"}',
    '{"timestamp":"2024-01-15T10:30:60Z","message":"leap second"}',
    '{"timestamp":"0001-01-01T00:00:00+01:00","message":"underflow offset"}',
    '{"timestamp":"9999-12-31T23:59:59-01:00","message":"overflow offset"}',
    '{"timestamp":"2024-01-15 10:30:45+02:00","message":"space sep with tz"}',
    # numeric epochs on the consumed ts key are JVM-handled
    '{"time":1705312200,"message":"numeric epoch"}',
    '{"time":1705312200.9,"message":"float epoch"}',
    # (-62135596800 == 0001-01-01 is valid in both plans but PySpark's
    # driver-side fromInternal cannot collect year-1 timestamps)
    '{"time":-62130000000,"message":"epoch year one"}',
    '{"time":-62135596801,"message":"epoch below year one"}',
    '{"time":253402300800,"message":"epoch out of range"}',
    '{"time":99999999999999999999,"message":"epoch overflow"}',
    '{"ts":"2024-01-15T10:30:45Z","time":1705312200,"message":"string wins, numeric unconsumed"}',
    '{"msg":"say \\"time\\": 5 ok","time":1705312200}',  # probe vs escaped quote
    # UDF-routed shapes (must still be identical end-to-end)
    '{"a":"1","a":"2","message":"dup keys"}',
    '{"a":"1"}x',  # Jackson tolerates trailing garbage; Go/Python reject
    '{"a":"1"}}',
    '{"a":"1"} {"b":"2"}',
    "{'a':'b'}",  # single quotes
    '{"a":NaN}',
    '{"a":01}',
    '{"a":5.}',
    '{"v":-0e3,"message":"neg zero exp"}',
    '{"ts":true,"timestamp":"2024-01-15T10:30:45Z","message":"bool ts skipped"}',
    '{"level":5,"lvl":"warn","message":"numeric level skipped"}',
    '{"big":12345678901234567890,"message":"huge int"}',
    '{"n":1234567,"message":"7-digit int"}',
    '{"v":97.31,"message":"decimal"}',
    '{"v":-0,"message":"negative zero"}',
    '{"v":1e3,"message":"exponent"}',
    '{"v":null,"message":"null attr"}',
    '{"nested":{"a":1},"message":"nested"}',
    '{"arr":[1,2],"message":"array"}',
    '{"u":"\\u00e9\\ud83d\\ude00","message":"unicode escapes"}',
    '{"u":"\\ud800","message":"lone surrogate"}',
    '{"malformed":"json"x}',
    '  {"level":"warn","message":"leading space"}',
    '{"level":"warn","message":"trailing newline"}\n',
    '{\n  "level": "warn",\n  "message": "multiline json"\n}',
    "plain text line",
    "    unicode-padded plain 　 ",
    "INFO: something happened (42.7%)",
    "2024-01-15T10:30:45Z INFO prefixed plain",
    "text with { brace but not json",
    "",
    None,
    "\tat com.example.Svc.m1(Svc.java:10)",
]


def _results(spark, texts, **kw):
    rows = [("c", i, "assistant", t, None, TS) for i, t in enumerate(texts)]
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"ts": "datetime64[us]"})
    df = spark.createDataFrame(pdf)
    out = with_parsed(df, **kw).orderBy("turn_idx")
    return [
        (r["turn_idx"], r["event_ts"], r["level"], r["message"],
         dict(r["attrs"]), r["json_ok"])
        for r in out.collect()
    ]


def test_hybrid_parity_adversarial(spark):
    fast = _results(spark, ADVERSARIAL, hybrid=True)
    slow = _results(spark, ADVERSARIAL, hybrid=False)
    for f, s in zip(fast, slow):
        assert f == s, f"hybrid diverges on line {ADVERSARIAL[f[0]]!r}: {f} != {s}"


def test_hybrid_parity_synth_corpus(spark):
    texts = synthesize_pandas(n_convs=120, seed=77)["text"].tolist()
    fast = _results(spark, texts, hybrid=True)
    slow = _results(spark, texts, hybrid=False)
    assert fast == slow


def test_hybrid_parity_custom_fields(spark):
    kw = dict(
        ts_fields=("created_at",), level_fields=("prio",), msg_fields=("body",)
    )
    lines = [
        '{"created_at":"2024-01-15T10:30:45Z","prio":"fatal","body":"b","x":"y"}',
        '{"level":"error","message":"not promoted here"}',
        '{"created_at":"bad","body":"fallback ts"}',
    ]
    fast = _results(spark, lines, hybrid=True, **kw)
    slow = _results(spark, lines, hybrid=False, **kw)
    assert fast == slow
    # custom mappings: the default keys land in attrs
    assert fast[1][4] == {"level": "error", "message": "not promoted here"}


def test_hybrid_covers_majority_of_synth(spark):
    """The fast path only pays off if it actually captures the bulk of the
    corpus — guard against routing regressions silently sending everything
    to Python."""
    from otel_logger_spark.functions.parse import hybrid_routing_counts

    pdf = synthesize_pandas(n_convs=150, seed=5)
    df = spark.createDataFrame(pdf)
    c = hybrid_routing_counts(df)
    total = sum(c.values())
    # the pay-off metric: few rows cross to Python
    assert c["python"] / total < 0.25, c
    assert c["fast"] / total > 0.2, c


def test_hybrid_env_var_normalization(monkeypatch):
    """Unset/empty and the usual negative spellings must all mean OFF —
    the env var opts IN to the (measured-slower) hybrid path, so a user
    exporting OTEL_SPARK_PARSE_HYBRID="" or "no" must not enable it."""
    from otel_logger_spark.functions.parse import _hybrid_env_enabled

    monkeypatch.delenv("OTEL_SPARK_PARSE_HYBRID", raising=False)
    assert _hybrid_env_enabled() is False
    for off in ("", "0", "false", "FALSE", "no", " No ", "off"):
        monkeypatch.setenv("OTEL_SPARK_PARSE_HYBRID", off)
        assert _hybrid_env_enabled() is False, f"{off!r} wrongly enabled hybrid"
    for on in ("1", "true", "ON", "yes"):
        monkeypatch.setenv("OTEL_SPARK_PARSE_HYBRID", on)
        assert _hybrid_env_enabled() is True, f"{on!r} failed to enable hybrid"
