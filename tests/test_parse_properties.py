"""Property-based tests (hypothesis) for the parse stage invariants —
the reference's implicit contracts that golden tables can't enumerate:

- ParseLogEntry never fails; every input becomes an entry (main.go:184-190)
- raw input is always preserved verbatim
- promoted keys are deleted exactly once, first-present-key-wins
- attrs values round-trip Go's stringification rules
- the prefix extractor returns either the full line or a suffix of it
"""

import json
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from otel_logger_spark.functions.parse import (
    DEFAULT_LEVEL_FIELDS,
    DEFAULT_MESSAGE_FIELDS,
    DEFAULT_TIMESTAMP_FIELDS,
    extract_json,
    parse_entry,
    parse_go_timestamp,
)
from otel_logger_spark.gofmt import go_json_dumps, render_attr

KEYS = st.text(string.ascii_lowercase + "_@", min_size=1, max_size=12)
SCALARS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
)
JSON_VALUES = st.recursive(
    SCALARS,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4), st.dictionaries(KEYS, inner, max_size=4)
    ),
    max_leaves=8,
)
JSON_OBJECTS = st.dictionaries(KEYS, JSON_VALUES, max_size=8)


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_parse_never_raises_and_preserves_raw(line):
    ets, level, msg, attrs, ok = parse_entry(line)
    assert isinstance(level, str) and isinstance(msg, str)
    assert isinstance(attrs, dict)
    if not ok:
        # fallback: whole trimmed line is the message (main.go:186)
        assert msg == line.strip()
        assert level == "info" and attrs == {}


@given(JSON_OBJECTS)
@settings(max_examples=300, deadline=None)
def test_parse_json_field_promotion(obj):
    line = json.dumps(obj)
    ets, level, msg, attrs, ok = parse_entry(line)
    assert ok
    promoted = set(obj) - set(attrs)
    # at most one key promoted per family (first present string/number)
    for fam, pred in (
        (DEFAULT_TIMESTAMP_FIELDS, lambda v: isinstance(v, (str, int, float)) and not isinstance(v, bool)),
        (DEFAULT_LEVEL_FIELDS, lambda v: isinstance(v, str)),
        (DEFAULT_MESSAGE_FIELDS, lambda v: isinstance(v, str)),
    ):
        matches = [k for k in fam if k in obj and pred(obj[k])]
        fam_promoted = promoted & set(fam)
        if matches:
            assert matches[0] in fam_promoted or obj[matches[0]] is None
    # everything not promoted survives in attrs with Go rendering
    for k in set(obj) & set(attrs):
        assert attrs[k] == render_attr(obj[k])
    # level/message defaults or extracted string values
    lv_match = [k for k in DEFAULT_LEVEL_FIELDS if isinstance(obj.get(k), str)]
    assert level == (obj[lv_match[0]] if lv_match else "info")
    msg_candidates = {k: v for k, v in obj.items() if k in DEFAULT_MESSAGE_FIELDS}
    msg_match = [k for k in DEFAULT_MESSAGE_FIELDS if isinstance(msg_candidates.get(k), str)]
    assert msg == (obj[msg_match[0]] if msg_match else "Log entry")


@given(JSON_VALUES)
@settings(max_examples=300, deadline=None)
def test_go_json_dumps_is_valid_json(v):
    out = go_json_dumps(v)
    # must parse back; numeric equality modulo int/float unification
    parsed = json.loads(out)

    def norm(x):
        if isinstance(x, bool) or x is None or isinstance(x, str):
            return x
        if isinstance(x, (int, float)):
            return float(x)
        if isinstance(x, list):
            return [norm(i) for i in x]
        if isinstance(x, dict):
            return {k: norm(i) for k, i in x.items()}
        raise TypeError(x)

    assert norm(parsed) == norm(v)


@given(st.text(max_size=120))
@settings(max_examples=300, deadline=None)
def test_extract_json_returns_line_or_suffix(line):
    out = extract_json(line)
    assert out == line or (line.endswith(out) if out else True)


from datetime import datetime as _dt


@given(st.datetimes(min_value=_dt(1000, 1, 1), max_value=_dt(9999, 12, 31)))
@settings(max_examples=200, deadline=None)
def test_timestamp_roundtrip_iso(dt):
    # years < 1000 strftime as 3 digits, which Go's "2006" layout rejects
    # too — the parser is faithful; the property holds on 4-digit years
    s = dt.strftime("%Y-%m-%dT%H:%M:%S") + "Z"
    parsed = parse_go_timestamp(s)
    assert parsed is not None
    assert parsed.replace(tzinfo=None) == dt.replace(microsecond=0)
