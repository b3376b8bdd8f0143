"""Span-level exact-substring deduplication (the ExactSubstr family of
Lee et al., "Deduplicating Training Data Makes Language Models Better").

Doc-level dedup (functions/dedup.py) removes whole near-identical
documents; this operator finds *spans* — runs of ``n`` consecutive word
tokens whose exact text appears in two or more distinct documents — and
reports, per document, how much of it is boilerplate shared with the
rest of the corpus. Training pipelines use the coverage fraction to drop
(or trim) template-heavy pages that doc-level dedup can't see because
the surrounding unique text keeps their doc digest distinct.

Semantics (re-derived verbatim by the DuckDB gate oracle):
- tokens: split on single space, empties dropped (double spaces tokenize
  identically in both engines after the filter);
- a window is the space-joined text of ``n`` consecutive tokens; docs
  shorter than ``n`` tokens have no windows;
- a window content is *duplicated* when it occurs in >= ``min_docs``
  DISTINCT documents (within-doc repetition is functions/repetition.py's
  job, not this one's);
- ``dup_tokens`` is the size of the union of the duplicated windows'
  token intervals [start, start+n) — overlapping windows never double
  count — computed from sorted duplicated starts as
  sum(min(n, next_start - start)) with the last window contributing n;
- ``dup_milli`` = (1000 * dup_tokens) div n_tokens, exact integer.

Scale shape (pinned by tests/test_spandedup.py):
- the doc base projects (id, n_tokens, n_windows) once — raw text never
  leaves the scan stage;
- windows explode as (id, start, window) and groupBy the window CONTENT
  to count distinct docs: the one corpus-sized shuffle, keyed by ~n-word
  strings. ``use_hash=True`` shuffles ``xxhash64(window)`` instead — 8
  bytes per key at 100 TB instead of ~50 — pinned equal to string mode
  by pytest (a collision needs two distinct n-grams on the same 64-bit
  hash; the false-positive rate is documented, not silent: string mode
  is the exact reference);
- duplicated (id, start) pairs — the small survivor set — take one
  per-doc window (lead over start) for interval-union coverage, then an
  id-keyed left join back to the narrow doc base. Text is never joined,
  so the stats path ships only integers after the scan.
- ``drop_span_duplicated`` broadcasts the tiny over-threshold id set
  into a LEFT-ANTI join, decontam-style: the corpus text crosses zero
  exchanges on the filter path.

Reference behavior being generalized: the reference pipeline dedups
whole log lines only (main.go's per-entry digest forwarding); span-level
dedup is part of the training-data superset this engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_logger_spark.functions.repetition import ngram_join_expr

DEFAULT_N = 8


def _tok_expr(text_col: str) -> str:
    return f"filter(split({text_col}, ' '), t -> t != '')"


def doc_windows(
    df: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (id, start, window): 0-based token start position and
    the space-joined n-token window text."""
    toks = _tok_expr(text_col)
    return df.select(
        id_col,
        F.posexplode(F.expr(ngram_join_expr(toks, n))).alias("start", "_w"),
    )


def duplicated_starts(
    wins: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    use_hash: bool = False,
) -> DataFrame:
    """(id, start) of every window whose content occurs in >= min_docs
    distinct documents. The groupBy key is the window text (exact) or its
    xxhash64 (8-byte shuffle key for 100 TB corpora; collisions possible,
    string mode is the exact reference)."""
    if use_hash:
        wins = wins.withColumn("_w", F.xxhash64("_w"))
    if min_docs == 2:
        # ">= 2 distinct docs" is just min != max — a plain min/max agg
        # with full map-side partials, no per-group distinct hash set
        dup = (
            wins.groupBy("_w")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") != F.col("_hi"))
            .select("_w")
        )
    else:
        dup = (
            wins.groupBy("_w")
            .agg(F.countDistinct(id_col).alias("_nd"))
            .filter(F.col("_nd") >= min_docs)
            .select("_w")
        )
    return wins.join(dup, "_w", "left_semi").select(id_col, "start")


def span_dedup_stats(
    df: DataFrame,
    n: int = DEFAULT_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = False,
) -> DataFrame:
    """Per-document span-duplication accounting:
    (id, n_tokens, n_windows, dup_windows, dup_tokens, dup_milli).
    Every input document appears exactly once (zeros when clean)."""
    toks = _tok_expr(text_col)
    base = df.select(
        id_col,
        F.size(F.expr(toks)).cast("long").alias("n_tokens"),
        F.greatest(
            F.size(F.expr(toks)) - F.lit(n - 1), F.lit(0)
        ).cast("long").alias("n_windows"),
    )
    starts = duplicated_starts(
        doc_windows(df, n, id_col, text_col), min_docs, id_col, use_hash
    )
    w = Window.partitionBy(id_col).orderBy("start")
    cov = (
        starts.withColumn("_next", F.lead("start").over(w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum(
                F.when(F.col("_next").isNull(), n).otherwise(
                    F.least(F.lit(n), F.col("_next") - F.col("start"))
                )
            ).cast("long").alias("dup_tokens"),
        )
    )
    joined = base.join(cov, id_col, "left")
    return joined.select(
        id_col,
        "n_tokens",
        "n_windows",
        F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.expr(
            "CAST(coalesce(dup_tokens, 0) * 1000 div greatest(n_tokens, 1)"
            " AS BIGINT)"
        ).alias("dup_milli"),
    )


def drop_span_duplicated(
    df: DataFrame,
    max_dup_milli: int,
    n: int = DEFAULT_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = False,
) -> DataFrame:
    """``df`` minus every document whose duplicated-token coverage
    exceeds ``max_dup_milli`` (schema unchanged). The over-threshold id
    set is tiny by construction and broadcasts into a LEFT-ANTI join —
    corpus text crosses zero exchanges."""
    stats = span_dedup_stats(df, n, min_docs, id_col, text_col, use_hash)
    hot = stats.filter(F.col("dup_milli") > max_dup_milli).select(id_col)
    return df.join(F.broadcast(hot), id_col, "left_anti")


def trim_duplicated_spans(
    df: DataFrame,
    n: int = DEFAULT_N,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_flagged: bool = False,
) -> DataFrame:
    """Rebuild ``text_col`` with every token covered by a duplicated
    window removed (the ExactSubstr removal, at token granularity).
    Clean documents pass through byte-identical.

    Cost notes: the token mask is exists() over the doc's duplicated-
    start array — O(n_tokens * dup_starts) per FLAGGED doc only; clean
    docs take the left-join null branch. The flagged (id, starts[]) side
    joins as a plain id-keyed left join by default: on a boilerplate-
    heavy web corpus the flagged fraction can be large, so broadcasting
    it is NOT safe to assume — pass ``broadcast_flagged=True`` only when
    the caller knows the flagged set is small (then corpus text crosses
    zero exchanges; with the default, one, and a corpus bucketed on the
    id crosses zero either way).
    """
    starts = duplicated_starts(
        doc_windows(df, n, id_col, text_col), min_docs, id_col
    )
    per_doc = starts.groupBy(id_col).agg(
        F.sort_array(F.collect_list("start")).alias("_dstarts")
    )
    if broadcast_flagged:
        per_doc = F.broadcast(per_doc)
    out = df.join(per_doc, id_col, "left")
    toks = _tok_expr(text_col)
    trimmed = (
        # keep token j unless some duplicated window [s, s+n) covers it
        f"array_join(filter({toks}, (t, j) -> "
        f"NOT exists(_dstarts, s -> s <= j AND j < s + {n})), ' ')"
    )
    return out.withColumn(
        text_col,
        F.when(F.col("_dstarts").isNull(), F.col(text_col)).otherwise(
            F.expr(trimmed)
        ),
    ).drop("_dstarts")


def span_dedup_sql(
    table: str = "documents",
    n: int = DEFAULT_N,
    min_docs: int = 2,
) -> str:
    """DuckDB re-derivation of ``span_dedup_stats`` — identical
    tokenization (split on single space, empties dropped), identical
    0-based window starts, identical interval-union coverage and integer
    milli division. Returns a full SELECT statement."""
    return f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM {table}),
base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(greatest(len(toks) - {n - 1}, 0) AS BIGINT) AS n_windows
  FROM toks),
wins AS (
  SELECT doc_id, i - 1 AS start,
         array_to_string(toks[i:i + {n - 1}], ' ') AS w
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(toks) - {n} + 2, 1))) AS i)),
dup AS (SELECT w FROM wins GROUP BY w HAVING count(DISTINCT doc_id) >= {min_docs}),
dstarts AS (
  SELECT doc_id, start,
         lead(start) OVER (PARTITION BY doc_id ORDER BY start) AS nxt
  FROM wins WHERE w IN (SELECT w FROM dup)),
cov AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_windows,
         CAST(SUM(CASE WHEN nxt IS NULL THEN {n}
                       ELSE least({n}, nxt - start) END) AS BIGINT) AS dup_tokens
  FROM dstarts GROUP BY doc_id)
SELECT b.doc_id, b.n_tokens, b.n_windows,
       COALESCE(c.dup_windows, 0) AS dup_windows,
       COALESCE(c.dup_tokens, 0) AS dup_tokens,
       CAST(COALESCE(c.dup_tokens, 0) * 1000 // greatest(b.n_tokens, 1)
            AS BIGINT) AS dup_milli
FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id
"""
