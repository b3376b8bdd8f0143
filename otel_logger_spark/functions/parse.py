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


# Precompiled decoder: json.loads(s, parse_constant=...) constructs a fresh
# JSONDecoder on EVERY call (measured ~10% of parse time); decode() has
# identical leading/trailing-whitespace semantics.
_STDLIB_DECODER = json.JSONDecoder(parse_constant=_reject_const)

# orjson (4x faster than stdlib on the loads hot path) rejects NaN/Infinity
# (which we reject anyway) and lone-surrogate escapes, so those retry
# through the stdlib path. Ints outside [i64min, u64max] it parses LOSSILY
# as float instead of rejecting (stdlib yields a bigint) — harmless here
# because go_v renders every number through Go's float64 formatting (Go's
# json.Unmarshal into interface{} is float64 too), so both decoders produce
# identical rendered output; parity suite + oracles unchanged.
try:
    import orjson as _orjson
except ImportError:  # pragma: no cover - present in this environment
    _orjson = None


def _loads_go(json_str: str):
    if _orjson is not None:
        try:
            return _orjson.loads(json_str)
        except Exception:
            pass
    return _STDLIB_DECODER.decode(json_str)


# json.loads accepts lone-surrogate escapes (e.g. {"a":"\ud800"} is valid
# JSON text) but the resulting string is not UTF-8-encodable, so Arrow
# serialization of the UDF output would kill the task. Go's json.Unmarshal
# replaces each invalid surrogate with U+FFFD (main.go Unmarshal semantics);
# mirror that. Unpaired surrogates can ONLY enter via \uXXXX escapes (raw
# Spark strings are already valid UTF-8), so callers gate on '\\u' presence.
_SURROGATE_RE = re.compile("[\ud800-\udfff]")


def _scrub_surrogates(s: str) -> str:
    return _SURROGATE_RE.sub("�", s)


# epoch-micros bounds of Python's datetime range (year 1 .. 9999)
_MIN_US = -62135596800_000_000
_MAX_US = 253402300799_999_999
_EPOCH_ORD = 719163  # date(1970,1,1).toordinal()


def parse_go_timestamp_us(s: str) -> int | None:
    """parse_go_timestamp, micros-native: the UDF hot path avoids building
    tz-aware datetimes entirely (datetime.replace alone was ~7% of worker
    time). Returns epoch micros, or None for unparseable/out-of-range."""
    m = _TS_RE.match(s)
    if m is None:
        return None
    y, mo, d, sep, hh, mm, ss, frac, tz = m.groups()
    if sep == " " and tz is not None:
        return None  # no space-separated layout carries a zone
    hh_i, mm_i, ss_i = int(hh), int(mm), int(ss)
    if hh_i > 23 or mm_i > 59 or ss_i > 59:  # Go rejects 24:00 / leap seconds
        return None
    try:
        days = datetime(int(y), int(mo), int(d)).toordinal() - _EPOCH_ORD
    except ValueError:
        return None
    micros = int(frac.ljust(6, "0")[:6]) if frac else 0
    us = (days * 86400 + hh_i * 3600 + mm_i * 60 + ss_i) * 1_000_000 + micros
    if tz and tz != "Z":
        off = (int(tz[1:3]) * 3600 + int(tz[4:6]) * 60) * 1_000_000
        us = us - off if tz[0] == "+" else us + off
        if not (_MIN_US <= us <= _MAX_US):
            return None  # OverflowError parity (see parse_go_timestamp)
    return us


def parse_entry_us(
    line: str,
    prefix_re: re.Pattern = DEFAULT_PREFIX_RE,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
):
    """ParseLogEntry (main.go:173-246), pure, micros-native (the UDF hot
    path; parse_entry wraps it with a datetime for the golden tests).

    Returns (event_us | None, level, message, attrs: dict[str,str],
    json_ok). event_us None means "reference would use time.Now()" — the
    caller substitutes the row's own ts.
    """
    json_str = extract_json(line, prefix_re)
    # cheap pre-check: an Unmarshal-into-map can only succeed when the first
    # non-space byte is '{' — skips the exception machinery for plain text
    c = json_str[:1]
    if c != "{" and (c not in " \t\r\n" or json_str.lstrip()[:1] != "{"):
        return None, DEFAULT_LEVEL, line.strip(), {}, False
    try:
        data = _loads_go(json_str)
        if type(data) is not dict:
            raise ValueError("not an object")  # Unmarshal-into-map fails
    except Exception:
        # fallback path (main.go:184-190)
        return None, DEFAULT_LEVEL, line.strip(), {}, False

    event_us = None
    # first-PRESENT-key wins: the loop breaks (and deletes) on the first key
    # holding a string or number, even if the string doesn't parse
    # (main.go:194-207). Non-string/number values fall through to later keys.
    # (type() checks: bool is excluded automatically, and they dodge the
    # isinstance machinery — 21M isinstance calls showed in the profile.)
    for f in ts_fields:
        v = data.get(f)
        tv = type(v)
        if tv is str:
            t = parse_go_timestamp_us(v)
            if t is not None and t != _MIN_US:  # IsZero check (main.go:201)
                event_us = t
            del data[f]
            break
        if tv is int or tv is float:
            try:
                sec = int(v)  # OverflowError on inf (1e400 via stdlib retry)
                # datetime.fromtimestamp range parity (year 1..9999)
                if -62135596800 <= sec <= 253402300799:
                    event_us = sec * 1_000_000
            except (OverflowError, ValueError):
                pass  # out of range -> deterministic fallback
            del data[f]
            break

    level = None
    for f in level_fields:
        v = data.get(f)
        if type(v) is str:  # only string values match (main.go:217)
            level = v
            del data[f]
            break
    if level is None:
        level = DEFAULT_LEVEL

    message = None
    for f in msg_fields:
        v = data.get(f)
        if type(v) is str:
            message = v
            del data[f]
            break
    if message is None:
        message = DEFAULT_MESSAGE

    attrs = {
        k: (v if type(v) is str else render_attr(v)) for k, v in data.items()
    }
    if "\\u" in json_str:  # only escapes can smuggle in lone surrogates
        level = _scrub_surrogates(level)
        message = _scrub_surrogates(message)
        attrs = {
            _scrub_surrogates(k): _scrub_surrogates(v) for k, v in attrs.items()
        }
    return event_us, level, message, attrs, True


def parse_entry(
    line: str,
    prefix_re: re.Pattern = DEFAULT_PREFIX_RE,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
):
    """ParseLogEntry (main.go:173-246), pure — datetime-typed wrapper over
    parse_entry_us (the golden-test / reference-parity surface).

    Returns (event_ts | None, level, message, attrs: dict[str,str], json_ok).
    event_ts None means "reference would use time.Now()" — caller substitutes
    the row's own ts.
    """
    us, level, message, attrs, ok = parse_entry_us(
        line, prefix_re, ts_fields, level_fields, msg_fields
    )
    ets = None
    if us is not None:
        ets = datetime.fromtimestamp(us // 1_000_000, tz=timezone.utc).replace(
            microsecond=us % 1_000_000
        )
    return ets, level, message, attrs, ok


# --- JVM fast path (hybrid parse, OPT-IN — measured slower on this corpus) ----
#
# Hypothesis: the pandas UDF is the single-box throughput ceiling
# (~142k rows/s/core), so rows whose semantics the JVM can reproduce EXACTLY
# are parsed with from_json + expressions; only the rest cross to Python.
# Anything ambiguous falls back to the UDF, so the hybrid is
# semantics-preserving by construction (tests/test_parse_hybrid.py asserts
# bitwise parity against the pure-UDF plan on adversarial corpora).
#
# Measured outcome (37M-turn pipeline A/B, see with_parsed): the pure UDF
# WINS on the transcript corpus — Go-parity guards cost ~20 JVM expressions
# per row (~22us) vs one C-speed json.loads (~7us). Default OFF; the
# machinery stays for long-simple-JSON corpora and as a worked example of
# the optimizer traps below.
#
# Design (from_json-FIRST — a full JSON-grammar Java regex was tried and
# measured at ~10 MB/s/core, slower than the Python parse it replaced):
#  1. cheap structural pre-route: exactly one '{' and one '}' in the line
#     (nested objects change attr rendering to Go's map[...] form — Python
#     owns those; this also kills Jackson's tolerance of `{..}{..}` trailing
#     objects), and no "\u" escape (lone-surrogate parity stays in Python).
#  2. from_json with STRICT Jackson options, which then agrees with
#     Go/Python JSON acceptance except for trailing garbage (guarded by a
#     must-end-with-'}' probe).
#  3. cheap post-hoc probes route residual stringification/type ambiguities
#     to Python: duplicate keys (element_at returns the FIRST, Go takes the
#     last), null values (Go renders "<nil>"), values Jackson re-renders
#     through double/long where Java's toString can differ from Go's %v
#     (ints >= 7 digits, anything decimal/exponent, integer -0), promoted
#     level/message keys with non-string values (the first-present-key loop
#     skips those, main.go:215-240), non-consumed numeric timestamp keys,
#     and boolean-valued timestamp keys (main.go:194-207).
# Numeric epochs on the CONSUMED timestamp key are handled JVM-side
# (string-vs-number read off the raw text: a raw `"key":` sequence can only
# occur at key position in strict JSON, so `"key"\s*:\s*"` iff the value is
# a string).

_STRICT_JSON_OPTS = {
    "allowSingleQuotes": "false",
    "allowNumericLeadingZeros": "false",
    "allowNonNumericNumbers": "false",
    "allowBackslashEscapingAnyCharacter": "false",
    "allowUnquotedControlChars": "false",
    "allowUnquotedFieldNames": "false",
    "allowComments": "false",
}

# mirror of DEFAULT_PREFIX_RE restricted to ASCII whitespace and a '{' body:
# a JVM match implies the Python regex extracts the same json_str; a JVM
# non-match routes to Python (never wrong, at most slower)
_J_PREFIX_EXTRACT = (
    r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}[.\d]*[Z\-+\d:]*[ \t]*(\{.*)\z"
)
# Go layouts, JVM side (same shape as _TS_RE; space separator carries no tz)
_J_TS_VALUE = (
    r"^\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:\d{2})?"
    r"| \d{2}:\d{2}:\d{2}(?:\.\d+)?)\z"
)
# JSON inter-token whitespace (what Jackson/Go/Python all accept)
_J_JWS = r"[ \t\r\n]*"
# map values that must render via gofmt (Python): ints of >= 7 digits (Go
# unmarshals numbers to float64 and %v switches to e-notation at 1e7 —
# strconv 'g' shortest uses %e when the decimal exponent exceeds 6; Java
# prints plain digits), anything decimal/exponent (Java Double.toString vs
# Go shortest-repr differ on integral floats "5.0"/"5", <1e-3, >=1e7, and
# rare non-shortest JDK17 cases), and raw object/array values
_J_BAD_VALUE = r"^(?:-?\d{7,}$|-?\d+[.eE]|[\[{])"
# Python str.strip() whitespace set, spelled out for Java (Java \s is
# ASCII-only; Python's is the isspace() set)
_J_PY_WS = (
    "[\\t\\n\\u000B\\f\\r\\u001C-\\u001F \\u0085\\u00A0\\u1680"
    "\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]"
)

_KEY_SAFE = re.compile(r"^[\x20-\x7e]+$")


def _hybrid_applicable(json_prefix, ts_fields, level_fields, msg_fields) -> bool:
    if json_prefix is not None:
        return False  # fast path mirrors only the default prefix regex
    sets = [set(ts_fields), set(level_fields), set(msg_fields)]
    if sets[0] & sets[1] or sets[0] & sets[2] or sets[1] & sets[2]:
        return False  # overlapping field sets change deletion order
    for k in (*ts_fields, *level_fields, *msg_fields):
        if not _KEY_SAFE.match(k) or '"' in k or "\\" in k:
            return False
    return True


def _str_valued_probe(js: Column, key: str) -> Column:
    """True iff ``key``'s value is written as a JSON string in the raw text.
    Sound for pre-routed flat objects: a raw (unescaped) `"key":` sequence
    can only occur at key position — raw quotes inside string values are
    illegal in strict JSON, and escaped ones are excluded by the
    lookbehind."""
    pat = rf'(?<!\\)"{re.escape(key)}"{_J_JWS}:{_J_JWS}"'
    return js.rlike(pat)


def _first_key_probe(js: Column, key_col: Column, fields) -> Column:
    """String-valued-ness of the (dynamically) consumed key: a when-chain
    over the static field set, so every probe regex stays foldable."""
    expr = None
    for f in fields:
        cond = key_col == F.lit(f)
        probe = _str_valued_probe(js, f)
        expr = F.when(cond, probe) if expr is None else expr.when(cond, probe)
    return F.coalesce(expr, F.lit(False))


def _first_present_key(m: Column, fields) -> Column:
    expr = None
    for f in fields:
        cond = F.map_contains_key(m, F.lit(f))
        expr = (
            F.when(cond, F.lit(f)) if expr is None else expr.when(cond, F.lit(f))
        )
    return expr


def _jvm_ts_raw_parse(v: Column) -> Column:
    """Go-layout timestamp parse as pure expressions (offset applied, no
    validity clamps yet) — parity with parse_go_timestamp. The caller MUST
    stage this as its own column: it is referenced by several clamp
    predicates, and the final parse project is interpreted (map lambdas are
    codegen-incompatible), where repeated subexpressions are re-evaluated
    per reference."""
    v6 = F.regexp_replace(v, r"(\.\d{6})\d+", "$1")  # truncate to micros
    naive = F.translate(
        F.regexp_replace(v6, r"(?:Z|[+-]\d{2}:\d{2})\z", ""), "T", " "
    ).try_cast("timestamp")
    sign = F.regexp_extract(v, r"([+-])\d{2}:\d{2}\z", 1)
    hh = F.regexp_extract(v, r"[+-](\d{2}):\d{2}\z", 1).try_cast("int")
    mm = F.regexp_extract(v, r"[+-]\d{2}:(\d{2})\z", 1).try_cast("int")
    offs = F.coalesce(hh, F.lit(0)) * 3600 + F.coalesce(mm, F.lit(0)) * 60
    signed = (
        F.when(sign == "+", offs).when(sign == "-", -offs).otherwise(F.lit(0))
    )
    return F.timestamp_add("SECOND", -signed, naive)


def _jvm_ts_clamped(v: Column, pts: Column) -> Column:
    """Validity rules over the staged raw parse ``pts``: Go layout shape,
    IsZero (main.go:201), and Python's datetime range (parity with the
    OverflowError fallback). NULL means 'caller substitutes the row ts'."""
    shape_ok = v.rlike(_J_TS_VALUE)
    zero = F.expr("TIMESTAMP'0001-01-01 00:00:00'")
    mx = F.expr("TIMESTAMP'9999-12-31 23:59:59.999999'")
    return F.when(shape_ok & pts.isNotNull() & (pts > zero) & (pts <= mx), pts)


def _with_fast_flags(df, text_col, ts_fields, level_fields, msg_fields):
    """Stages the fast-path routing machinery as columns: ``_js`` (extracted
    JSON body), ``_m`` (strict from_json map), ``_tk``/``_lk``/``_mk``
    (consumed keys), ``_tv`` (raw ts value), ``_tnum`` (consumed ts key is
    numeric), ``_fast`` (row is JVM-parseable). Shared by the hybrid plan
    and the routing diagnostics."""
    line = F.col(text_col)
    is_plain = line.isNull() | ~line.contains("{")
    # structural pre-route (cheap scans, no JSON parse): single brace pair,
    # no \u escape. Rows failing it skip from_json entirely and go straight
    # to the UDF — double-scanning the heavy nested/malformed rows is what
    # made the previous grammar-regex design a net loss.
    candidate = (
        ~is_plain
        & (F.regexp_count(line, F.lit(r"\{")) == 1)
        & (F.regexp_count(line, F.lit(r"\}")) == 1)
        & ~line.contains("\\u")
    )
    # extract the JSON body: '{'-start lines verbatim (Python's fast path,
    # extract_json main.go:156-171); otherwise the ASCII prefix strip. The
    # prefix path refuses newlines: Python's `.` never spans them, so a
    # prefixed multiline row falls back — the UDF owns that case.
    js_raw = F.when(line.startswith("{"), line).otherwise(
        F.when(
            ~line.contains("\n"), F.regexp_extract(line, _J_PREFIX_EXTRACT, 1)
        ).otherwise(F.lit(""))
    )
    df = df.withColumn("_js", F.when(candidate, js_raw).otherwise(F.lit("")))
    df = df.withColumn(
        "_m", F.from_json("_js", "map<string,string>", _STRICT_JSON_OPTS)
    )
    m = F.col("_m")
    js = F.col("_js")
    df = (
        df.withColumn("_tk", _first_present_key(m, ts_fields))
        .withColumn("_lk", _first_present_key(m, level_fields))
        .withColumn("_mk", _first_present_key(m, msg_fields))
    )
    tk, lk, mk = F.col("_tk"), F.col("_lk"), F.col("_mk")
    df = df.withColumn("_tv", F.try_element_at(m, tk))
    # consumed ts key is numeric iff its raw value is unquoted
    df = df.withColumn(
        "_tnum", tk.isNotNull() & ~_first_key_probe(js, tk, ts_fields)
    )

    # post-hoc guards: every residual Jackson-vs-Go/Python divergence routes
    # to the UDF (see module comment)
    ks = F.map_keys(m)
    no_dups = F.size(ks) == F.size(F.array_distinct(ks))
    no_null_vals = ~F.exists(F.map_values(m), lambda v: v.isNull())
    # the consumed ts key is exempt from the value-shape check: its numeric
    # value takes the epoch path, never Go-rendering into attrs
    vals_ok = ~F.exists(
        F.map_entries(m),
        lambda e: ~e["key"].eqNullSafe(tk) & e["value"].rlike(_J_BAD_VALUE),
    )
    ends_ok = js.rlike(r"\}[ \t\r\n]*\z")  # Jackson tolerates trailing junk
    no_neg_zero = ~js.rlike(r":[ \t\r\n]*-0(?![0-9.eE])")  # Go renders "-0"
    lvl_ok = lk.isNull() | _first_key_probe(js, lk, level_fields)
    msg_ok = mk.isNull() | _first_key_probe(js, mk, msg_fields)
    # a non-consumed ts key with a numeric value would land in attrs with
    # Java rendering; a boolean consumed ts key is not consumed by Go
    bad_ts = F.lit(False)
    for f in ts_fields:
        bad_ts = bad_ts | (
            F.map_contains_key(m, F.lit(f))
            & ~tk.eqNullSafe(F.lit(f))
            & ~_str_valued_probe(js, f)
        )
    ts_bool = F.col("_tnum") & F.col("_tv").isin("true", "false")
    return df.withColumn(
        "_fast",
        m.isNotNull()
        & no_dups
        & no_null_vals
        & vals_ok
        & ends_ok
        & no_neg_zero
        & lvl_ok
        & msg_ok
        & ~bad_ts
        & ~ts_bool,
    )


def hybrid_routing_counts(
    df,
    text_col: str = "text",
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
) -> dict:
    """Diagnostics: how many rows each parse route handles — ``fast`` (JVM
    expressions), ``plain`` (JVM fallback), ``python`` (pandas UDF). Used by
    plan audits and the coverage-guard test."""
    line = F.col(text_col)
    flags = _with_fast_flags(
        df, text_col, tuple(ts_fields), tuple(level_fields), tuple(msg_fields)
    )
    is_plain = line.isNull() | ~line.contains("{")
    row = flags.select(
        F.count_if(F.col("_fast")).alias("fast"),
        F.count_if(~F.col("_fast") & is_plain).alias("plain"),
        F.count_if(~F.col("_fast") & ~is_plain).alias("python"),
    ).collect()[0]
    return {"fast": row["fast"], "plain": row["plain"], "python": row["python"]}


def _with_hybrid_parsed(
    df,
    text_col: str,
    ts_col: str,
    udf,
    ts_fields,
    level_fields,
    msg_fields,
):
    """Adds the five parse output columns, each as its own
    when(JVM-eligible, expression parse).when(plain, fallback expr)
    .otherwise(pandas UDF result) — the UDF sees only the hard rows (masked
    to NULL elsewhere, which it skips in O(1)).

    Two structural rules, both load-bearing (measured: violating either
    makes the hybrid ~2.5-10x SLOWER than the pure UDF):
    - Expensive shared subexpressions (from_json map, consumed keys, raw ts
      parse) are staged as real columns in separate projections. Spark's subexpression elimination does not merge
      duplicates across when() branches, the final project is interpreted
      (map lambdas are codegen-incompatible) where every reference
      re-evaluates, and CollapseProject leaves multi-referenced non-cheap
      aliases alone — staging guarantees compute-once.
    - The outputs are five flat columns, NOT one struct-of-CASE:
      SimplifyExtractValueOps cannot push a field extraction through CASE,
      so a struct would force every consumer (even a level-only query) to
      compute all five fields including map_filter and the ts regexes."""
    line = F.col(text_col)
    fallback_ts = F.col(ts_col)
    is_plain = line.isNull() | ~line.contains("{")
    df = _with_fast_flags(df, text_col, ts_fields, level_fields, msg_fields)
    m = F.col("_m")
    tk, lk, mk = F.col("_tk"), F.col("_lk"), F.col("_mk")

    df = df.withColumn("_pts", _jvm_ts_raw_parse(F.col("_tv")))
    masked = F.when(~F.col("_fast") & ~is_plain, line)  # else NULL -> UDF skips
    df = df.withColumn("_pu", udf(masked, F.unix_micros(fallback_ts.cast("timestamp"))))

    pu = F.col("_pu")
    udf_out = {
        "event_ts": F.timestamp_micros(pu["event_ts_us"]),
        "level": pu["level"],
        "message": pu["message"],
        "attrs": F.from_json(pu["attrs_json"], "map<string,string>"),
        "json_ok": pu["json_ok"],
    }
    trimmed = F.regexp_replace(line, f"^{_J_PY_WS}+|{_J_PY_WS}+\\z", "")

    def pick(fast_expr, plain_expr, udf_field):
        case = (
            F.when(F.col("_fast"), fast_expr)
            .when(is_plain, plain_expr)
            .otherwise(udf_out[udf_field])
        )
        # Optimizer barrier, value-neutral: spark_partition_id() marks the
        # expression nondeterministic, which stops PushDownPredicates from
        # substituting it into pushed filters and CollapseProject from
        # inlining it into consumers. Without it, a filter or time-window
        # over a parse output absorbs the whole staging chain with
        # exponential expression duplication — measured: a 9.4 MB optimized
        # plan with 361 copies of from_json (~1 ms/row) for a simple
        # windowed count. (rand() >= -1 does NOT survive: Spark 4's
        # OptimizeRand folds out-of-range rand comparisons.)
        return F.when(F.spark_partition_id() >= -1, case)

    # event_ts: epoch semantics for a numeric consumed key
    # (datetime.fromtimestamp(int(v)) parity: truncate toward zero, Python
    # datetime range, NO IsZero exclusion — main.go:204-206), Go-layout
    # string parse otherwise
    secs = F.col("_tv").try_cast("double").try_cast("long")
    epoch_ts = F.when(
        secs.between(-62135596800, 253402300799), F.timestamp_seconds(secs)
    )
    out = {
        "_pe": pick(
            F.coalesce(
                F.when(F.col("_tnum"), epoch_ts).otherwise(
                    _jvm_ts_clamped(F.col("_tv"), F.col("_pts"))
                ),
                fallback_ts,
            ),
            fallback_ts,
            "event_ts",
        ),
        "_pl": pick(
            F.coalesce(F.try_element_at(m, lk), F.lit(DEFAULT_LEVEL)),
            F.lit(DEFAULT_LEVEL),
            "level",
        ),
        "_pm": pick(
            F.coalesce(F.try_element_at(m, mk), F.lit(DEFAULT_MESSAGE)),
            F.when(line.isNull(), F.lit("")).otherwise(trimmed),
            "message",
        ),
        "_pa": pick(
            F.map_filter(
                m,
                lambda k, _v: ~k.eqNullSafe(tk)
                & ~k.eqNullSafe(lk)
                & ~k.eqNullSafe(mk),
            ),
            F.from_json(F.lit("{}"), "map<string,string>"),
            "attrs",
        ),
        "_po": pick(F.lit(True), F.lit(False), "json_ok"),
    }
    return df.withColumns(out).drop(
        "_js", "_m", "_fast", "_tk", "_lk", "_mk", "_tv", "_tnum", "_pts", "_pu"
    )


# --- Spark surface -----------------------------------------------------------

# The UDF exchanges ONLY cheap Arrow types. Timestamps cross as epoch
# MICROS (int64, unix_micros on the way in / timestamp_micros on the way
# out) and the attrs map crosses as an orjson-dumped JSON string decoded by
# from_json JVM-side: Arrow serialization of object-dtype datetime columns
# and list-of-dict map columns is per-element Python work that measured
# ~6x the cost of the parse itself (UDF throughput 47k rows/s/core against
# 304k rows/s for the bare parse loop); ints and strings are memcpy-class.
PARSED_STRUCT = T.StructType(
    [
        T.StructField("event_ts_us", T.LongType()),
        T.StructField("level", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("attrs_json", T.StringType()),
        T.StructField("json_ok", T.BooleanType()),
    ]
)

_EPOCH_NAIVE = datetime(1970, 1, 1)

_dumps = (
    (lambda d: _orjson.dumps(d).decode())
    if _orjson is not None
    else (lambda d: json.dumps(d, ensure_ascii=False, separators=(",", ":")))
)


def _dt_to_us(dt: datetime) -> int:
    td = dt - _EPOCH_NAIVE
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def make_parse_udf(
    json_prefix: str | None = None,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
):
    """Build the parse pandas UDF with a given config (mirrors the
    configurable FieldMappings / --json-prefix of the reference,
    main.go:125-129, main.go:621-633). Callers feed unix_micros(ts) and
    re-materialize event_ts/attrs JVM-side — see with_parsed."""
    prefix_re = re.compile(json_prefix) if json_prefix else DEFAULT_PREFIX_RE
    ts_fields = tuple(ts_fields)
    level_fields = tuple(level_fields)
    msg_fields = tuple(msg_fields)

    @pandas_udf(PARSED_STRUCT)
    def parse_udf(text: pd.Series, fallback_us: pd.Series) -> pd.DataFrame:
        n = len(text)
        out_us = [None] * n
        out_level = [None] * n
        out_msg = [None] * n
        out_attrs = [None] * n
        out_ok = [False] * n
        if fallback_us.isna().any():  # null ts -> float64 NaN from Arrow
            fb = [None if v != v else int(v) for v in fallback_us.tolist()]
        else:
            fb = fallback_us.tolist()
        dumps = _dumps
        parse = parse_entry_us
        for i, line in enumerate(text.tolist()):
            if line is None:
                # parse_entry("") result, inlined — also the O(1) skip for
                # rows the hybrid plan masked out (JVM-parsed rows arrive
                # here as NULL and their UDF output is discarded)
                out_us[i] = fb[i]
                out_level[i] = DEFAULT_LEVEL
                out_msg[i] = ""
                out_attrs[i] = "{}"
                continue
            us, level, msg, attrs, ok = parse(
                line, prefix_re, ts_fields, level_fields, msg_fields
            )
            out_us[i] = fb[i] if us is None else us
            out_level[i] = level
            out_msg[i] = msg
            out_attrs[i] = dumps(attrs) if attrs else "{}"
            out_ok[i] = ok
        return pd.DataFrame(
            {
                "event_ts_us": pd.array(out_us, dtype="Int64"),
                "level": out_level,
                "message": out_msg,
                "attrs_json": out_attrs,
                "json_ok": out_ok,
            }
        )

    return parse_udf


def _hybrid_env_enabled() -> bool:
    """OTEL_SPARK_PARSE_HYBRID opts IN to the (measured-slower) hybrid
    path: unset/empty and the usual negative spellings all mean OFF."""
    import os

    return os.environ.get(
        "OTEL_SPARK_PARSE_HYBRID", ""
    ).strip().lower() not in ("", "0", "false", "no", "off")


def with_parsed(
    df,
    text_col: str = "text",
    ts_col: str = "ts",
    json_prefix: str | None = None,
    ts_fields=DEFAULT_TIMESTAMP_FIELDS,
    level_fields=DEFAULT_LEVEL_FIELDS,
    msg_fields=DEFAULT_MESSAGE_FIELDS,
    keep_text: bool = False,
    hybrid: bool | None = None,
    attrs_format: str = "map",
):
    """Apply the parse stage: adds event_ts, level, message, attrs, json_ok
    and ``raw`` (the untouched input text — main.go:298 parity).

    ``attrs_format``: "map" (default) materializes ``attrs`` as
    map<string,string> via from_json; "json" keeps the UDF's already-built
    JSON string — semantically the same key-values (OTLP attributes are a
    storage-format choice), but the string skips from_json, moves through
    UnsafeRow copies as one flat buffer instead of a map, and parquet-
    encodes as a plain BYTE_ARRAY column: the sink-write A/B in
    BENCH/AB_attrs_format.md quantifies the difference. Map consumers
    re-parse on demand (from_json is cheap on the tiny filtered slices
    that actually inspect attrs). Under the opt-in hybrid path the JVM
    branch's map goes through to_json — identical key-values, but key
    ORDER may differ from the UDF's insertion-ordered rendering.

    ``raw`` is the input column RENAMED, not copied: carrying two identical
    string columns through persist/joins/writes doubles memory traffic,
    which is the single-box scaling ceiling. keep_text=True restores the
    duplicate for callers that still need ``text`` downstream.

    ``hybrid``: the JVM fast path (strict from_json + expressions for
    JVM-expressible rows, pandas UDF only for the hard ones; bitwise
    parity asserted by tests/test_parse_hybrid.py). Default None = the
    OTEL_SPARK_PARSE_HYBRID env var, itself defaulting OFF: a 37M-turn A/B
    at local[8] and local[32] measured the pure Arrow-batched UDF FASTER
    (363k vs 218k turns/s at 8 cores; 468k vs 391k at 32) — C-speed
    json.loads beats the ~20-expression JVM guard stack that Go-parity
    semantics require (per-row cost ~22us in JVM machinery vs ~7us in the
    UDF loop). Kept as an opt-in experiment: corpora whose rows are long,
    simple JSON (where from_json wins on bytes scanned) can flip it on."""
    import os

    if hybrid is None:
        hybrid = _hybrid_env_enabled()
    if attrs_format not in ("map", "json"):
        raise ValueError(f"attrs_format must be 'map' or 'json': {attrs_format!r}")
    udf = make_parse_udf(json_prefix, ts_fields, level_fields, msg_fields)
    if hybrid and _hybrid_applicable(
        json_prefix, ts_fields, level_fields, msg_fields
    ):
        parsed = _with_hybrid_parsed(
            df,
            text_col,
            ts_col,
            udf,
            tuple(ts_fields),
            tuple(level_fields),
            tuple(msg_fields),
        )
        renames = {"_pe": "event_ts", "_pl": "level", "_pm": "message",
                   "_pa": "attrs", "_po": "json_ok"}
    else:
        parsed = df.withColumn(
            "_p", udf(F.col(text_col), F.unix_micros(F.col(ts_col).cast("timestamp")))
        )
        renames = None
    if keep_text:
        parsed = parsed.withColumn("raw", F.col(text_col))
    else:
        parsed = parsed.withColumnRenamed(text_col, "raw")
    if renames:
        for src, dst in renames.items():
            parsed = parsed.withColumnRenamed(src, dst)
        if attrs_format == "json":
            parsed = parsed.withColumn("attrs", F.to_json(F.col("attrs")))
        return parsed
    attrs_col = (
        F.col("_p.attrs_json")
        if attrs_format == "json"
        else F.from_json(F.col("_p.attrs_json"), "map<string,string>")
    )
    return (
        parsed.withColumn("event_ts", F.timestamp_micros(F.col("_p.event_ts_us")))
        .withColumn("level", F.col("_p.level"))
        .withColumn("message", F.col("_p.message"))
        .withColumn("attrs", attrs_col)
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
