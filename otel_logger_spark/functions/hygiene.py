"""Composed hygiene manifest: the per-document keep/drop decision table.

A production pipeline does not run its quality filters as disconnected
jobs — it ships ONE manifest that says, for every document, which rules
fired and whether the doc survives (RefinedWeb and Dolma both publish
exactly this artifact, because an unexplained drop is an unauditable
corpus). This operator composes three of the engine's per-doc filters —

  repetition : the Gopher flags (functions/repetition.py)
  quality    : length/stopword/alpha score (functions/text.with_quality)
  fluency    : unigram mean-NLL cut (functions/lmscore.with_lm_score)

— into one frame with a boolean per rule plus the conjunction ``keep``.

100 TB shape: every rule is a pure per-doc codegen/fold projection, so
the WHOLE manifest is a single corpus traversal with zero exchanges —
N rules compose in the projection, not as N jobs over the corpus. Only
the per-group accounting aggregate shuffles (one tiny row per doc). The
per-rule counts are over ALL docs (a doc can trip several rules — the
counts answer "what did each rule cost", not a waterfall)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.lmscore import with_lm_score
from otel_logger_spark.functions.repetition import (
    GOPHER_THRESHOLDS_MILLI,
    with_repetition_stats,
)
from otel_logger_spark.functions.text import with_quality


def hygiene_manifest(
    df: DataFrame,
    uni_tab: dict[str, int],
    oov_nll: int,
    quality_min_milli: int,
    nll_max_micro: int,
    rep_thresholds_milli: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """(id, *carry, rep_flag, quality_flag, fluency_flag, keep) — one
    pass, one projection; flags are True when the rule REJECTS.
    ``rep_thresholds_milli`` overrides the Gopher defaults per metric
    (the gate tightens top_bigram so the branch is live on a single-line
    corpus where dup_line/dup_5gram are structurally zero)."""
    thr = rep_thresholds_milli or GOPHER_THRESHOLDS_MILLI
    d = with_repetition_stats(df, text_col)
    d = with_quality(d, text_col)
    d = with_lm_score(d, uni_tab, oov_nll, text_col)
    rep = None
    for col, t in sorted(thr.items()):
        c = F.col(col) > F.lit(t)
        rep = c if rep is None else (rep | c)
    return d.select(
        id_col,
        *carry_cols,
        rep.alias("rep_flag"),
        (F.col("quality_milli") < quality_min_milli).alias("quality_flag"),
        (F.col("mean_nll_micro") > nll_max_micro).alias("fluency_flag"),
    ).withColumn(
        "keep",
        ~F.col("rep_flag") & ~F.col("quality_flag") & ~F.col("fluency_flag"),
    )


def hygiene_report(
    df: DataFrame,
    uni_tab: dict[str, int],
    oov_nll: int,
    quality_min_milli: int,
    nll_max_micro: int,
    rep_thresholds_milli: dict[str, int] | None = None,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, n_rep, n_quality, n_fluency, n_kept): per-group
    accounting of the manifest — each rule's rejection count over all
    docs plus the surviving total."""
    m = hygiene_manifest(
        df, uni_tab, oov_nll, quality_min_milli, nll_max_micro,
        rep_thresholds_milli, text_col, id_col, (group_col,),
    )
    return m.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("rep_flag").cast("long")).alias("n_rep"),
        F.sum(F.col("quality_flag").cast("long")).alias("n_quality"),
        F.sum(F.col("fluency_flag").cast("long")).alias("n_fluency"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )
