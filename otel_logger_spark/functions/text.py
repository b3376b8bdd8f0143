"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All but the fingerprint are pure JVM expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

BPE_ISH_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]+|[^A-Za-z0-9\s]"

# tiny per-language stopword markers for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": (" the ", " of ", " and "),
    "es": (" la ", " el ", " los "),
    "fr": (" le ", " les ", " des "),
    "de": (" der ", " die ", " und "),
}


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens + char count."""
    return (
        df.withColumn("n_chars_calc", F.length(text_col))
        .withColumn("n_tokens", F.size(F.split(F.col(text_col), " ")))
        .withColumn(
            "n_bpe_tokens",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0)),
        )
    )


def occurrences(text, needle: str):
    """Non-overlapping occurrence count via the length/replace identity —
    chosen because it is byte-identical across engines (oracle parity)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker scoring; best score wins, ties by language order,
    zero hits -> 'unk'."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    scores = {
        lang: sum([occurrences(padded, m) for m in marks], F.lit(0))
        for lang, marks in LANG_MARKERS.items()
    }
    best = None
    best_score = None
    for lang, s in scores.items():
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    guess = F.when(best_score > 0, best).otherwise(F.lit("unk"))
    return df.withColumn("lang_guess", guess)


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality features + a 0-1000 score.

    Integer-scaled (milli) so the score is engine-exact."""
    d = with_token_stats(df, text_col)
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    n_stop = sum(
        [occurrences(padded, m) for marks in LANG_MARKERS.values() for m in marks],
        F.lit(0),
    )
    d = d.withColumn("n_stopwords", n_stop)
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    d = d.withColumn("alpha_milli", F.floor(F.lit(1000) * alpha / F.greatest(F.col("n_chars_calc"), F.lit(1))))
    d = d.withColumn(
        "stop_milli",
        F.floor(F.lit(1000) * F.col("n_stopwords") / F.greatest(F.col("n_tokens"), F.lit(1))),
    )
    length_ok = (F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000)
    score = (
        F.when(length_ok, F.lit(400)).otherwise(F.lit(0))
        + F.least(F.col("stop_milli"), F.lit(300))
        + F.floor(F.col("alpha_milli") * 300 / 1000)
    )
    return d.withColumn("quality_milli", score.cast("long"))


# --- fingerprinting (rolling polynomial hash, winnowing-lite) -----------------

_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
    return h


def fingerprint_text(s: str, window: int = 32) -> int:
    """Winnowing-style fingerprint: min rolling-window polynomial hash.
    Deterministic, order-sensitive, robust to small appends."""
    if len(s) <= window:
        return _poly_hash(s)
    # rolling hash over fixed windows
    pw = pow(_FP_BASE, window - 1, _FP_MOD)
    h = _poly_hash(s[:window])
    best = h
    for i in range(window, len(s)):
        h = ((h - ord(s[i - window]) * pw) * _FP_BASE + ord(s[i])) % _FP_MOD
        if h < best:
            best = h
    return best


@pandas_udf(T.LongType())
def fingerprint_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda s: fingerprint_text(s) - (1 << 62) if s is not None else None)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds a 64-bit content fingerprint (Arrow-batched pandas UDF — the
    one text op not expressible in builtins)."""
    return df.withColumn("fingerprint", fingerprint_udf(F.col(text_col)))
