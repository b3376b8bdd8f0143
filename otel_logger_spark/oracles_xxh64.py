"""DuckDB re-implementation of XXH64 — the independent oracle for
hash-bearing queries.

Spark's ``xxhash64`` is the standard XXH64 (seed 42) over UTF-8 bytes;
DuckDB has no such function, which round 2 accepted as the reason the
simhash gate stayed rows-only. This module closes that gap by GENERATING
DuckDB SQL that computes XXH64 bit-for-bit:

- bytes via ``hex(encode(tok))`` decoded with strpos arithmetic (works for
  any UTF-8 input, not just ASCII);
- all 64-bit modular arithmetic in ``UHUGEINT`` (128-bit unsigned —
  a full u64 x u64 product fits: (2^64-1)^2 < 2^128-1 — so
  ``(a*b) % 2^64`` needs no limb splitting);
- rotations as ``(x*2^r) % 2^64 + x // 2^(64-r)``; xor natively;
- the 32-byte stripe loop decomposes into FOUR independent single-value
  ``list_reduce`` folds (each accumulator v_j only ever sees its own
  lane's words), sidestepping list_reduce's same-type accumulator limit;
- tail words / 4-byte chunk / trailing bytes / avalanche per the spec.

Validated exactly (all length branches 0..70+, unicode, empty) against
both a pure-Python XXH64 and Spark's ``xxhash64`` in
tests/test_training_ops.py::test_duckdb_xxh64_matches_spark.
"""

from __future__ import annotations

_M64 = "18446744073709551616::UHUGEINT"
_P1 = "11400714785074694791::UHUGEINT"
_P2 = "14029467366897019727::UHUGEINT"
_P3 = "1609587929392839161::UHUGEINT"
_P4 = "9650029242287828579::UHUGEINT"
_P5 = "2870177450012600261::UHUGEINT"
_SEED = "42::UHUGEINT"


def _mul(a: str, b: str) -> str:
    return f"(({a}) * ({b})) % {_M64}"


def _add(a: str, b: str) -> str:
    return f"(({a}) + ({b})) % {_M64}"


def _rotl(x: str, r: int) -> str:
    return (
        f"(((({x}) * {1 << r}::UHUGEINT) % {_M64})"
        f" + (({x}) // {1 << (64 - r)}::UHUGEINT)) % {_M64}"
    )


def _xor(a: str, b: str) -> str:
    return f"xor({a}, {b})"


def _shr(x: str, r: int) -> str:
    return f"(({x}) // {1 << r}::UHUGEINT)"


def _lane_fold(j: int) -> str:
    init = {
        0: _add(_add(_SEED, _P1), _P2),
        1: _add(_SEED, _P2),
        2: _SEED,
        3: f"({_SEED} + {_M64} - {_P1}) % {_M64}",
    }[j]
    step = _mul(_rotl(_add("a", _mul("k", _P2)), 31), _P1)
    lane = f"list_transform(generate_series(0, n//32 - 1), s -> w[4*s+{j + 1}])"
    return f"list_reduce(list_prepend({init}, {lane}), (a, k) -> {step})"


def _merge_acc(h: str, v: str) -> str:
    vv = _mul(_rotl(_mul(v, _P2), 31), _P1)
    return _add(_mul(_xor(h, vv), _P1), _P4)


def xxh64_ctes() -> str:
    """CTE chain ``vb -> ... -> hashes(tok, h64)``; expects an upstream CTE
    ``vocab(tok)``. h64 is UHUGEINT (the unsigned XXH64 value; callers
    needing Spark's signed rendering subtract 2^64 above 2^63-1)."""
    v_cols = ", ".join(f"{_lane_fold(j)} AS v{j + 1}" for j in range(4))
    h_big = _merge_acc(
        _merge_acc(
            _merge_acc(
                _merge_acc(
                    _add(
                        _add(_rotl("v1", 1), _rotl("v2", 7)),
                        _add(_rotl("v3", 12), _rotl("v4", 18)),
                    ),
                    "v1",
                ),
                "v2",
            ),
            "v3",
        ),
        "v4",
    )
    h0 = f"CASE WHEN n >= 32 THEN ({h_big}) ELSE {_add(_SEED, _P5)} END"
    h_len = _add("h0", "n::UHUGEINT")
    word_step = _add(
        _mul(_rotl(_xor("a", _mul(_rotl(_mul("k", _P2), 31), _P1)), 27), _P1),
        _P4,
    )
    h_words = (
        f"list_reduce(list_prepend({h_len}, "
        f"list_transform(generate_series((n//32)*4 + 1, n//8), j -> w[j])), "
        f"(a, k) -> {word_step})"
    )
    k4 = (
        "(b[(n//8)*8+1] + b[(n//8)*8+2]*256::UHUGEINT"
        " + b[(n//8)*8+3]*65536::UHUGEINT + b[(n//8)*8+4]*16777216::UHUGEINT)"
    )
    h4 = (
        f"CASE WHEN n % 8 >= 4 THEN "
        f"({_add(_mul(_rotl(_xor('h1', _mul(k4, _P1)), 23), _P2), _P3)})"
        f" ELSE h1 END"
    )
    byte_step = _mul(_rotl(_xor("a", _mul("k", _P5)), 11), _P1)
    h_bytes = (
        f"list_reduce(list_prepend(h2, "
        f"list_transform(generate_series((n//4)*4 + 1, n), i -> b[i])), "
        f"(a, k) -> {byte_step})"
    )
    av1 = _mul(_xor("h3", _shr("h3", 33)), _P2)
    av2 = _mul(_xor("a1", _shr("a1", 29)), _P3)
    av3 = _xor("a2", _shr("a2", 32))
    return f"""
vb AS (SELECT tok, hex(encode(tok)) AS hx, octet_length(encode(tok))::BIGINT AS n FROM vocab),
vbytes AS (SELECT tok, n,
  list_transform(generate_series(1, n),
    i -> ((strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16
          + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1))::UHUGEINT) AS b
  FROM vb),
vwords AS (SELECT tok, n, b,
  list_transform(generate_series(1, n // 8),
    j -> b[8*j-7] + b[8*j-6]*256::UHUGEINT + b[8*j-5]*65536::UHUGEINT
       + b[8*j-4]*16777216::UHUGEINT + b[8*j-3]*4294967296::UHUGEINT
       + b[8*j-2]*1099511627776::UHUGEINT + b[8*j-1]*281474976710656::UHUGEINT
       + b[8*j]*72057594037927936::UHUGEINT) AS w
  FROM vbytes),
vlanes AS (SELECT tok, n, b, w, {v_cols} FROM vwords),
vh0 AS (SELECT tok, n, b, w, {h0} AS h0 FROM vlanes),
vh1 AS (SELECT tok, n, b, ({h_words}) AS h1 FROM vh0),
vh2 AS (SELECT tok, n, b, ({h4}) AS h2 FROM vh1),
vh3 AS (SELECT tok, ({h_bytes}) AS h3 FROM vh2),
va1 AS (SELECT tok, ({av1}) AS a1 FROM vh3),
va2 AS (SELECT tok, ({av2}) AS a2 FROM va1),
hashes AS (SELECT tok, ({av3}) AS h64 FROM va2)"""


def simhash_pairs_oracle(corpus_cte_sql: str, max_hamming: int = 3) -> str:
    """Full DuckDB oracle for simhash_near_pairs: per-token XXH64 (computed
    once per DISTINCT token), TF-weighted signed bit sums per doc, the
    64-bit signature, then ALL pairs with hamming <= max_hamming —
    equivalent to Spark's chunk-banded candidates because the pigeonhole
    candidate step is lossless for max_hamming <= 3."""
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h64 // {1 << i}::UHUGEINT) % 2 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    sim_u = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {1 << i}::UHUGEINT ELSE 0::UHUGEINT END"
        for i in range(64)
    )
    return (
        corpus_cte_sql
        + """
 , toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
 vocab AS (SELECT DISTINCT tok FROM toks),"""
        + xxh64_ctes()
        + f""",
 tokh AS (SELECT doc_id, h64 FROM toks JOIN hashes USING (tok)),
 bits AS (SELECT doc_id, {bit_sums} FROM tokh GROUP BY doc_id),
 shu AS (SELECT doc_id, ({sim_u}) AS sim_u FROM bits),
 shs AS (SELECT doc_id,
   CAST(CASE WHEN sim_u >= 9223372036854775808::UHUGEINT
        THEN (sim_u::HUGEINT - 18446744073709551616::HUGEINT)
        ELSE sim_u::HUGEINT END AS BIGINT) AS simhash FROM shu)
 SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
   CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
 FROM shs a JOIN shs b ON a.doc_id < b.doc_id
 WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""
    )
