"""Go-compatible value rendering for attribute stringification.

The reference stringifies leftover JSON fields into OTel string attributes
(/root/reference/main.go:281-295): nested objects/arrays go through
``json.Marshal``; scalars go through ``fmt.Sprintf("%v", v)``. Because Go's
``encoding/json`` unmarshals every JSON number to ``float64``, faithful
parity requires reproducing:

- ``%v`` on float64 == ``strconv.FormatFloat(f, 'g', -1, 64)``: shortest
  round-trip digits, scientific notation iff decimal exponent < -4 or >= 6
  (strconv's shortest-'g' uses eprec=6), exponent rendered as ``e+06``.
- ``json.Marshal`` float64: shortest digits, fixed notation iff
  1e-6 <= |x| < 1e21, else 'e' form with minimal exponent digits;
  map keys sorted; compact separators; HTML-escaped (<, >, & -> \\u003c...)
  and U+2028/U+2029 escaped.
- ``%v`` on bool -> ``true``/``false``; on nil -> ``<nil>``.

These are pure functions so they unit-test without Spark and run inside the
Arrow-batched parse UDF with zero JVM round-trips.
"""

from __future__ import annotations

import math
from decimal import Decimal


def _shortest_digits(f: float) -> tuple[str, int]:
    """Return (digits, decimal_exponent) for the shortest round-trip repr.

    digits is the significand with no leading/trailing zeros;
    value == 0.digits * 10**dp  with dp = position of the decimal point,
    i.e. exp10 (Go's digs.dp) such that value = digits * 10**(dp-len(digits)).
    """
    d = Decimal(repr(abs(f)))
    sign, digits, exp = d.as_tuple()
    ds = "".join(map(str, digits))
    # strip trailing zeros (repr('1234567.0') -> digits ...70, exp -1)
    stripped = ds.rstrip("0")
    if stripped == "":
        return "0", 1
    exp += len(ds) - len(stripped)
    ds = stripped
    dp = len(ds) + exp  # value = 0.ds * 10**dp
    return ds, dp


def _fmt_fixed(ds: str, dp: int) -> str:
    if dp <= 0:
        return "0." + "0" * (-dp) + ds
    if dp >= len(ds):
        return ds + "0" * (dp - len(ds))
    return ds[:dp] + "." + ds[dp:]


def _fmt_sci(ds: str, dp: int, min_exp_digits: int) -> str:
    exp = dp - 1
    mant = ds[0] if len(ds) == 1 else ds[0] + "." + ds[1:]
    sign = "+" if exp >= 0 else "-"
    return f"{mant}e{sign}{abs(exp):0{min_exp_digits}d}"


def go_float_g(f: float) -> str:
    """``fmt.Sprintf("%v", f)`` for a float64 (strconv 'g' shortest)."""
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "+Inf" if f > 0 else "-Inf"
    neg = math.copysign(1.0, f) < 0
    if f == 0:
        return "-0" if neg else "0"
    # fast path: inside Go's fixed-notation range [1e-4, 1e6) Python's repr
    # is also fixed-notation with identical shortest digits
    a = abs(f)
    if 1e-4 <= a < 1e6:
        r = repr(f)
        if "e" not in r:
            return r[:-2] if r.endswith(".0") else r
    ds, dp = _shortest_digits(f)
    exp = dp - 1
    if exp < -4 or exp >= 6:
        out = _fmt_sci(ds, dp, 2)
    else:
        out = _fmt_fixed(ds, dp)
    return "-" + out if neg else out


def go_json_float(f: float) -> str:
    """``encoding/json`` rendering of a float64."""
    # Go json errors on NaN/Inf; JSON input can't produce them, so never hit.
    neg = math.copysign(1.0, f) < 0
    if f == 0:
        return "-0" if neg else "0"
    a = abs(f)
    # fast path: json is fixed-notation on [1e-6, 1e21); Python repr is
    # fixed (same shortest digits) up to 1e16
    if 1e-6 <= a < 1e16:
        r = repr(f)
        if "e" not in r:
            return r[:-2] if r.endswith(".0") else r
    ds, dp = _shortest_digits(f)
    if a < 1e-6 or a >= 1e21:
        out = _fmt_sci(ds, dp, 2)
        # json trims e-0X -> e-X (encode.go floatEncoder)
        if "e-0" in out:
            out = out.replace("e-0", "e-")
    else:
        out = _fmt_fixed(ds, dp)
    return "-" + out if neg else out


_STRING_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    " ": "\\u2028",
    " ": "\\u2029",
}


import re as _re

_NEEDS_ESCAPE = _re.compile(r'["\\<>&\u2028\u2029\x00-\x1f]')


def _go_json_string(s: str) -> str:
    if not _NEEDS_ESCAPE.search(s):  # overwhelmingly common
        return f'"{s}"'
    out = ['"']
    for ch in s:
        esc = _STRING_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ch < " ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)  # Go emits UTF-8 raw for printable non-ASCII
    out.append('"')
    return "".join(out)


def go_json_dumps(v) -> str:
    """``json.Marshal`` parity: compact, map keys sorted, HTML-escaped."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, str):
        return _go_json_string(v)
    if isinstance(v, int):
        # Python preserved an exact integer where Go holds float64; while
        # exactly representable (|v| < 2^53 < 1e21) Go renders plain digits
        if -(2**53) < v < 2**53:
            return str(v)
        return go_json_float(float(v))
    if isinstance(v, float):
        return go_json_float(v)
    if isinstance(v, dict):
        items = sorted(v.items())
        return "{" + ",".join(f"{_go_json_string(k)}:{go_json_dumps(x)}" for k, x in items) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(go_json_dumps(x) for x in v) + "]"
    raise TypeError(f"unsupported JSON value: {type(v)}")


def go_v(v) -> str:
    """``fmt.Sprintf("%v", v)`` over values produced by json.Unmarshal,
    matching the scalar branch at /root/reference/main.go:291-293."""
    if isinstance(v, str):
        return v
    if v is None:
        return "<nil>"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        # Go holds float64; %v is plain digits while |v| < 1e6 (exp < 6)
        if -1_000_000 < v < 1_000_000:
            return str(v)
        return go_float_g(float(v))
    if isinstance(v, float):
        return go_float_g(v)
    raise TypeError(f"unsupported scalar: {type(v)}")


def render_attr(v) -> str:
    """One leftover field -> OTel string attribute
    (/root/reference/main.go:282-295): nested -> json.Marshal, scalar -> %v."""
    if isinstance(v, (dict, list, tuple)):
        return go_json_dumps(v)
    return go_v(v)
