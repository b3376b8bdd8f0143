"""Deterministic synthetic transcripts generator.

Produces the north-rule input table (conv_id, turn_idx, role, text, tool, ts)
with the content mix of the reference's fixture corpora
(/root/reference/examples/*.txt; FIXTURES.md §1): plain/alt-key/custom-key
JSON, numeric-epoch timestamps, prefixed JSON, plain text, malformed JSON,
multiline stack traces (continuation turns), nested-object fields, the full
severity spectrum, and trace/span-id-bearing rows. A small set of hot
conversations gets ~100x the median turn count to exercise skew handling.

Determinism: fixed seed, identical bytes across runs and parallelism levels
(FIXTURES.md §5). Generation is driver-side Python writing parquet via
pandas/pyarrow — fine up to bench scale; at cluster scale the same generator
runs distributed via ``synthesize_distributed`` (one seeded RNG per
conversation, so partitioning doesn't change content).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd

ROLES = ("user", "assistant", "system", "tool")
TOOLS = (
    "bash",
    "python",
    "search",
    "browse",
    "db.query",
    "db.write",
    "http.get",
    "http.post",
    "file.read",
    "file.write",
)
LEVELS = ("trace", "debug", "info", "warn", "warning", "error", "fatal", "INFO", "ERROR", "WARN")
_WORDS = (
    "request processed cache miss retry timeout connection established user "
    "login payment batch flushed queue drained worker started shutdown "
    "complete token refresh session expired index rebuilt snapshot written"
).split()

_BASE_TS = datetime(2024, 1, 15, 10, 30, 0)


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _json_turn(rng: random.Random, ts: datetime) -> str:
    """One single-line JSON log with varied field names/formats."""
    style = rng.randrange(8)
    iso = ts.strftime("%Y-%m-%dT%H:%M:%S") + ("Z" if style % 2 else ".%03dZ" % rng.randrange(1000))
    level = rng.choice(LEVELS)
    msg = _words(rng, rng.randrange(3, 9))
    if style == 0:  # canonical
        return f'{{"timestamp":"{iso}","level":"{level}","message":"{msg}","service":"api","request_id":"{rng.randrange(16**8):08x}"}}'
    if style == 1:  # logstash-ish alt keys
        return f'{{"@timestamp":"{iso}","severity":"{level}","msg":"{msg}","host":"node-{rng.randrange(40)}"}}'
    if style == 2:  # winston-ish with nested object
        return (
            f'{{"ts":"{iso}","lvl":"{level}","text":"{msg}",'
            f'"memoryUsage":{{"rss":{rng.randrange(10**8)},"heap":{rng.randrange(10**7)}}},"pid":{rng.randrange(32768)}}}'
        )
    if style == 3:  # numeric epoch
        return f'{{"time":{int(ts.timestamp())},"priority":"{level}","content":"{msg}","value":{rng.randrange(100)}.{rng.randrange(10)}{rng.randrange(1, 10)}}}'
    if style == 4:  # prefixed JSON (timestamp prefix stripped by P1)
        return f'{iso} {{"level":"{level}","message":"{msg}","attempt":{rng.randrange(5)}}}'
    if style == 5:  # trace/span bearing
        return (
            f'{{"timestamp":"{iso}","level":"{level}","message":"{msg}",'
            f'"trace_id":"{rng.randrange(16**16):016x}","span_id":"{rng.randrange(16**8):08x}","ok":{"true" if rng.random() < 0.8 else "false"}}}'
        )
    if style == 6:  # custom keys -> fall through to defaults (message default)
        return f'{{"created_at":"{iso}","description":"{msg}","code":{rng.randrange(600)}}}'
    # multiple ts keys (precedence exercise): first present key wins
    return f'{{"ts":"{iso}","timestamp":"not-a-time","level":"{level}","message":"{msg}"}}'


def _plain_turn(rng: random.Random) -> str:
    lvl = rng.choice(("INFO", "WARN", "ERROR", "DEBUG"))
    return f"{lvl}: {_words(rng, rng.randrange(4, 10))} ({rng.randrange(100)}.{rng.randrange(10)}%)"


def _malformed_turn(rng: random.Random) -> str:
    return f'{{"malformed":"json","missing_quote: "{_words(rng, 2)}"}}'


def _multiline_turns(rng: random.Random, ts: datetime) -> list[str]:
    """A start turn followed by continuation turns (leading whitespace /
    bare closers) — the coalescer input shape (multiline_test.go:29-112)."""
    kind = rng.randrange(3)
    iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    if kind == 0:  # stack trace
        lines = [f"{iso} ERROR {_words(rng, 4)}"]
        lines.append("  java.lang.RuntimeException: " + _words(rng, 3))
        for _ in range(rng.randrange(1, 4)):
            lines.append(
                f"\tat com.example.Svc.m{rng.randrange(99)}(Svc.java:{rng.randrange(500)})"
            )
        return lines
    if kind == 1:  # pretty-printed JSON object
        return [
            "{",
            f'  "timestamp": "{iso}",',
            f'  "level": "{rng.choice(LEVELS)}",',
            f'  "message": "{_words(rng, 3)}",',
            f'  "cost": {rng.randrange(1000)}.{rng.randrange(1, 99)}',
            "}",
        ]
    # indented config dump
    lines = [f"{iso} INFO {_words(rng, 3)}"]
    for _ in range(rng.randrange(1, 3)):
        lines.append(f"  - {_words(rng, 3)}")
    return lines


def conversation_rows(conv_id: str, n_turns: int, seed: int) -> list[tuple]:
    """Deterministic rows for one conversation (seeded per conv_id, so the
    result is independent of partitioning / generation order)."""
    rng = random.Random(seed)
    ts = _BASE_TS + timedelta(seconds=rng.randrange(10**7))
    rows = []
    turn = 0
    while turn < n_turns:
        ts += timedelta(milliseconds=rng.randrange(50, 5000))
        role = rng.choice(ROLES)
        tool = rng.choice(TOOLS) if (role == "tool" or rng.random() < 0.08) else None
        r = rng.random()
        if r < 0.55:
            texts = [_json_turn(rng, ts)]
        elif r < 0.75:
            texts = [_plain_turn(rng)]
        elif r < 0.80:
            texts = [_malformed_turn(rng)]
        elif r < 0.95:
            texts = _multiline_turns(rng, ts)
        else:  # empty / orphaned continuation turns (dropped by coalescer)
            texts = [""] if rng.random() < 0.5 else ["  orphaned continuation"]
        for t in texts:
            if turn >= n_turns:
                break
            rows.append((conv_id, turn, role, t, tool, ts))
            turn += 1
            ts += timedelta(milliseconds=rng.randrange(1, 200))
    return rows


def plan_conversations(n_convs: int, seed: int = 42, hot_frac: float = 0.002):
    """(conv_id, n_turns, per-conv seed) plan; ~0.2% of conversations are
    'hot' with ~100x turns (skew; FIXTURES.md §1)."""
    rng = random.Random(seed)
    plan = []
    for i in range(n_convs):
        conv_id = f"conv-{i:08d}"
        hot = rng.random() < hot_frac
        n_turns = rng.randrange(800, 2400) if hot else rng.randrange(4, 40)
        plan.append((conv_id, n_turns, seed * 1_000_003 + i))
    return plan


def synthesize_pandas(n_convs: int, seed: int = 42) -> pd.DataFrame:
    rows = []
    for conv_id, n_turns, s in plan_conversations(n_convs, seed):
        rows.extend(conversation_rows(conv_id, n_turns, s))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "ts": "datetime64[us]"})  # Spark can't read parquet NANOS


def write_transcripts(path: str, n_convs: int, seed: int = 42) -> int:
    """Write the transcripts parquet; returns row count."""
    pdf = synthesize_pandas(n_convs, seed)
    pdf.to_parquet(path, index=False)
    return len(pdf)


def synthesize_distributed(spark, n_convs: int, seed: int = 42, partitions: int = 32):
    """Cluster-scale generation: fan the per-conversation plan out and build
    rows on executors via mapInPandas — content identical to the driver-side
    generator because each conversation re-seeds its own RNG."""
    from pyspark.sql import functions as F  # noqa: F401

    plan = plan_conversations(n_convs, seed)
    plan_df = spark.createDataFrame(
        plan, "conv_id string, n_turns int, conv_seed long"
    ).repartition(partitions, "conv_id")

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_id, n_turns, s in pdf.itertuples(index=False):
                out.extend(conversation_rows(conv_id, int(n_turns), int(s)))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            ).astype({"turn_idx": "int32"})

    return plan_df.mapInPandas(
        gen, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
