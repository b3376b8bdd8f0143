"""The vectorized parse stage.

Re-expresses the reference's extract/parse semantics
(/root/reference/main.go:142-266) as an Arrow-batched pandas UDF:

- P1 prefix strip  (ExtractJSON, main.go:156-171; default regex main.go:148)
- P2 JSON parse with plain-text fallback (ParseLogEntry, main.go:173-246)
- P3 timestamp field coalesce, first-PRESENT-key-wins (main.go:193-212)
- P4 multi-format timestamp parse (parseTimestamp, main.go:248-266)
- P5/P6 level/message coalesce (main.go:215-240)
- P8 attribute stringification (ProcessLogEntry, main.go:281-295)
- P9 raw preservation (log.record.original, main.go:298) — the input text
  column is carried through untouched as ``raw``.

Deviation (documented in SURVEY.md §7): the reference falls back to
``time.Now()`` for missing/unparseable timestamps (main.go:187,211); for
determinism we use the row's own ``ts`` column instead.

Design: one pandas UDF returning a struct; regexes compile once per Python
worker at module import (mirrors the reference's compile-once extractor,
main.go:142-154). The loop is per-Arrow-batch Python, but the JVM<->Python
boundary is Arrow-columnar, and everything downstream (enrich, route, agg)
stays JVM-side in whole-stage codegen.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from otel_logger_spark.gofmt import render_attr

# --- P1: prefix extraction -------------------------------------------------

# Go default (main.go:148): ^(\d{4}-\d{2}-\d{2}[T\s]\d{2}:\d{2}:\d{2}[.\d]*[Z\-+\d:]*\s*)?(.*)$
# Go RE2 `$` = end-of-text and `.` excludes \n, so multiline entries never
# match and pass through whole. Python `$` also matches before a trailing
# newline, so we anchor with \Z to keep RE2 semantics.
DEFAULT_PREFIX_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}[T\s]\d{2}:\d{2}:\d{2}[.\d]*[Z\-+\d:]*\s*)?(.*)\Z"
)

DEFAULT_TIMESTAMP_FIELDS = ("timestamp", "ts", "time", "@timestamp")
DEFAULT_LEVEL_FIELDS = ("level", "lvl", "severity", "priority")
DEFAULT_MESSAGE_FIELDS = ("message", "msg", "text", "content")

DEFAULT_LEVEL = "info"
DEFAULT_MESSAGE = "Log entry"


def extract_json(line: str, prefix_re: re.Pattern = DEFAULT_PREFIX_RE) -> str:
    """ExtractJSON (main.go:156-171): last capture group if nonempty."""
    if prefix_re is DEFAULT_PREFIX_RE and line and line[0] == "{":
        # fast path: the default prefix starts with \d{4}, so a '{' line has
        # an empty prefix group and group2 == line — skip the regex
        return line
    m = prefix_re.search(line)
    if m is None:
        return line
    groups = m.groups()
    if groups:
        last = groups[-1]
        if last:
            return last
    return line


# --- P4: multi-format timestamp parse ---------------------------------------

# The 6 Go layouts (main.go:250-257) collapse to: ISO date, 'T' or ' '
# separator, seconds required, optional fraction (Go accepts an input
# fraction even when absent from the layout), optional tz — but ' '
# separator only in the tz-less layout. Zero time (year 1) is "IsZero".
_TS_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})([T ])(\d{2}):(\d{2}):(\d{2})(?:\.(\d+))?(Z|[+-]\d{2}:\d{2})?$"
)

_GO_ZERO = datetime(1, 1, 1, tzinfo=timezone.utc)


def parse_go_timestamp(s: str) -> datetime | None:
    """parseTimestamp (main.go:248-266) -> UTC-aware datetime, or None."""
    m = _TS_RE.match(s)
    if m is None:
        return None
    y, mo, d, sep, hh, mm, ss, frac, tz = m.groups()
    if sep == " " and tz is not None:
        return None  # no space-separated layout carries a zone
    micros = int((frac or "").ljust(6, "0")[:6]) if frac else 0
    try:
        dt = datetime(int(y), int(mo), int(d), int(hh), int(mm), int(ss), micros)
    except ValueError:
        return None
    if tz and tz != "Z":
        sign = 1 if tz[0] == "+" else -1
        off = timedelta(hours=int(tz[1:3]), minutes=int(tz[4:6]))
        try:
            dt = dt - sign * off
        except OverflowError:
            # 0001-01-01T00:00:00+01:00 / 9999-12-31T23:59:59-01:00 leave
            # Python's datetime range; Go's time.Time handles them, but the
            # zero-rows-dropped invariant wins — treat as unparseable and let
            # the caller fall back to the row ts.
            return None
    return dt.replace(tzinfo=timezone.utc)


# --- P2/P3/P5/P6/P8: full entry parse ---------------------------------------


def _reject_const(name):  # Go json has no NaN/Infinity literals
    raise ValueError(name)


# json.loads accepts lone-surrogate escapes (e.g. {"a":"\ud800"} is valid
# JSON text) but the resulting string is not UTF-8-encodable, so Arrow
# serialization of the UDF output would kill the task. Go's json.Unmarshal
# replaces each invalid surrogate with U+FFFD (main.go Unmarshal semantics);
# mirror that. Unpaired surrogates can ONLY enter via \uXXXX escapes (raw
# Spark strings are already valid UTF-8), so callers gate on '\\u' presence.
_SURROGATE_RE = re.compile("[\ud800-\udfff]")


def _scrub_surrogates(s: str) -> str:
    return _SURROGATE_RE.sub("�", s)


def parse_entry(
    line: str,
    prefix_re: re.Pattern = DEFAULT_PREFIX_RE,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
):
    """ParseLogEntry (main.go:173-246), pure.

    Returns (event_ts | None, level, message, attrs: dict[str,str], json_ok).
    event_ts None means "reference would use time.Now()" — caller substitutes
    the row's own ts.
    """
    json_str = extract_json(line, prefix_re)
    # cheap pre-check: an Unmarshal-into-map can only succeed when the first
    # non-space byte is '{' — skips the exception machinery for plain text
    c = json_str[:1]
    if c != "{" and (c not in " \t\r\n" or json_str.lstrip()[:1] != "{"):
        return None, DEFAULT_LEVEL, line.strip(), {}, False
    try:
        data = json.loads(json_str, parse_constant=_reject_const)
        if not isinstance(data, dict):
            raise ValueError("not an object")  # Unmarshal-into-map fails
    except Exception:
        # fallback path (main.go:184-190)
        return None, DEFAULT_LEVEL, line.strip(), {}, False

    event_ts = None
    # first-PRESENT-key wins: the loop breaks (and deletes) on the first key
    # holding a string or number, even if the string doesn't parse
    # (main.go:194-207). Non-string/number values fall through to later keys.
    for f in ts_fields:
        v = data.get(f)
        if isinstance(v, str):
            t = parse_go_timestamp(v)
            if t is not None and t != _GO_ZERO:
                event_ts = t
            del data[f]
            break
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            try:
                event_ts = datetime.fromtimestamp(int(v), tz=timezone.utc)
            except (OverflowError, OSError, ValueError):
                event_ts = None  # out of range -> deterministic fallback
            del data[f]
            break

    level = None
    for f in level_fields:
        v = data.get(f)
        if isinstance(v, str):  # only string values match (main.go:217)
            level = v
            del data[f]
            break
    if level is None:
        level = DEFAULT_LEVEL

    message = None
    for f in msg_fields:
        v = data.get(f)
        if isinstance(v, str):
            message = v
            del data[f]
            break
    if message is None:
        message = DEFAULT_MESSAGE

    attrs = {k: render_attr(v) for k, v in data.items()}
    if "\\u" in json_str:  # only escapes can smuggle in lone surrogates
        level = _scrub_surrogates(level)
        message = _scrub_surrogates(message)
        attrs = {
            _scrub_surrogates(k): _scrub_surrogates(v) for k, v in attrs.items()
        }
    return event_ts, level, message, attrs, True


# --- Spark surface -----------------------------------------------------------

PARSED_STRUCT = T.StructType(
    [
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("level", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("json_ok", T.BooleanType()),
    ]
)


def make_parse_udf(
    json_prefix: str | None = None,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
):
    """Build the parse pandas UDF with a given config (mirrors the
    configurable FieldMappings / --json-prefix of the reference,
    main.go:125-129, main.go:621-633)."""
    prefix_re = re.compile(json_prefix) if json_prefix else DEFAULT_PREFIX_RE
    ts_fields = tuple(ts_fields)
    level_fields = tuple(level_fields)
    msg_fields = tuple(msg_fields)

    @pandas_udf(PARSED_STRUCT)
    def parse_udf(text: pd.Series, fallback_ts: pd.Series) -> pd.DataFrame:
        n = len(text)
        out_ts = [None] * n
        out_level = [None] * n
        out_msg = [None] * n
        out_attrs = [None] * n
        out_ok = [False] * n
        fb = fallback_ts.tolist()
        for i, line in enumerate(text.tolist()):
            if line is None:
                line = ""
            ets, level, msg, attrs, ok = parse_entry(
                line, prefix_re, ts_fields, level_fields, msg_fields
            )
            if ets is None:
                ets = fb[i]
            elif ets.tzinfo is not None:
                ets = ets.replace(tzinfo=None)  # session tz is UTC
            out_ts[i] = ets
            out_level[i] = level
            out_msg[i] = msg
            out_attrs[i] = attrs
            out_ok[i] = ok
        return pd.DataFrame(
            {
                "event_ts": pd.Series(out_ts, dtype="object"),
                "level": out_level,
                "message": out_msg,
                "attrs": out_attrs,
                "json_ok": out_ok,
            }
        )

    return parse_udf


def with_parsed(
    df,
    text_col: str = "text",
    ts_col: str = "ts",
    json_prefix: str | None = None,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
    keep_text: bool = False,
):
    """Apply the parse stage: adds event_ts, level, message, attrs, json_ok
    and ``raw`` (the untouched input text — main.go:298 parity).

    ``raw`` is the input column RENAMED, not copied: carrying two identical
    string columns through persist/joins/writes doubles memory traffic,
    which is the single-box scaling ceiling. keep_text=True restores the
    duplicate for callers that still need ``text`` downstream."""
    udf = make_parse_udf(json_prefix, ts_fields, level_fields, msg_fields)
    parsed = df.withColumn("_p", udf(F.col(text_col), F.col(ts_col)))
    if keep_text:
        parsed = parsed.withColumn("raw", F.col(text_col))
    else:
        parsed = parsed.withColumnRenamed(text_col, "raw")
    return (
        parsed.withColumn("event_ts", F.col("_p.event_ts"))
        .withColumn("level", F.col("_p.level"))
        .withColumn("message", F.col("_p.message"))
        .withColumn("attrs", F.col("_p.attrs"))
        .withColumn("json_ok", F.col("_p.json_ok"))
        .drop("_p")
    )


def severity_expr(level_col: Column) -> Column:
    """Pure-expression severity mapping (logLevelToSeverity,
    main.go:311-328) — stays inside whole-stage codegen; the broadcast-join
    variant lives in operators/enrich.py."""
    lv = F.lower(level_col)
    return (
        F.when(lv == "trace", F.lit(1))
        .when(lv == "debug", F.lit(5))
        .when(lv == "info", F.lit(9))
        .when((lv == "warn") | (lv == "warning"), F.lit(13))
        .when(lv == "error", F.lit(17))
        .when(lv == "fatal", F.lit(21))
        .otherwise(F.lit(9))
    )
