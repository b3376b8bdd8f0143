"""Unigram-LM fluency scoring — the perplexity-proxy quality filter.

CCNet (Wenzek et al. 2020) ranks web text by the perplexity of a
language model trained on a trusted reference corpus (Wikipedia);
low-perplexity documents read like the reference, high-perplexity ones
are noise. A full KenLM is out of scope for an engine, but the standard
cheap proxy — a unigram LM with add-one smoothing over a capped
vocabulary — expresses the same pipeline stage with exact integer
arithmetic the oracle can replay bit-for-bit:

  vocab      = top-K reference tokens under the TOTAL (count DESC,
               tok ASC) order (functions/vocab.py discipline)
  nll(tok)   = round(SCALE * -ln((c_tok + 1) / (T + K + 1)))   [micro-nats]
  nll(OOV)   = round(SCALE * -ln(      1     / (T + K + 1)))
  score(doc) = sum(nll over tokens) div n_tokens               [integer]

A doc is "fluent" when its mean token NLL is at most a threshold. As in
functions/dsir.py, float math enters exactly once, driver-side, through
ONE shared function (``nll_table``) both engines feed their own
independently-derived counts into; everything downstream is integer.

Scale shape (100 TB): the reference leg is two bounded aggregates (the
vocab top-K via TakeOrderedAndProject, then K counts collected — the
quantiles.py/ivf.py bounded-driver-state pattern). Scoring is a pure
zero-shuffle projection: element_at against ONE literal map of K
entries with a coalesce to the OOV constant; the report is one tiny
aggregate. Corpus text never crosses an exchange.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.vocab import vocab_topk

DEFAULT_SCALE = 1_000_000  # micro-nats


def reference_counts(
    ref_df: DataFrame, k: int, text_col: str = "text"
) -> list[tuple[str, int]]:
    """[(tok, count)] for the top-k reference tokens — bounded driver
    state (k rows), deterministic under the vocab total order."""
    return [(r["tok"], r["cnt"]) for r in vocab_topk(ref_df, k, text_col).collect()]


def nll_table(
    counts: list[tuple[str, int]], scale: int = DEFAULT_SCALE
) -> tuple[dict[str, int], int]:
    """({tok: nll_micro}, oov_nll_micro) with add-one smoothing over the
    capped vocab + one OOV bucket. THE shared function of the exactness
    contract (see module docstring): both engines call this with their
    own independently-derived counts."""
    if not counts:
        raise ValueError("reference vocabulary is empty")
    denom = sum(c for _, c in counts) + len(counts) + 1
    tab = {t: round(scale * -math.log((c + 1) / denom)) for t, c in counts}
    return tab, round(scale * -math.log(1 / denom))


def with_lm_score(
    df: DataFrame,
    tab: dict[str, int],
    oov_nll: int,
    text_col: str = "text",
    out_col: str = "mean_nll_micro",
) -> DataFrame:
    """Mean token NLL in integer micro-nats: one codegen fold against a
    single K-entry literal map (constant expression size in K), integer
    division — a pure projection, zero shuffle."""
    m = F.create_map(
        *[F.lit(x) for kv in sorted(tab.items()) for x in kv]
    )
    words = F.split(F.col(text_col), " ")
    total = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.coalesce(F.element_at(m, w), F.lit(int(oov_nll))),
    )
    return (
        df.withColumn("_nll_total", total)
        .withColumn("_n_tok", F.size(words).cast("long"))
        .withColumn(out_col, F.expr("CAST(_nll_total DIV _n_tok AS BIGINT)"))
        .drop("_nll_total", "_n_tok")
    )


def lm_fluency_report(
    df: DataFrame,
    ref_df: DataFrame,
    k: int,
    threshold_micro: int,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """(group, n_docs, n_fluent, sum_mean_nll): per-group accounting of
    the fluency cut at ``threshold_micro`` mean token NLL."""
    tab, oov = nll_table(reference_counts(ref_df, k, text_col))
    scored = with_lm_score(df, tab, oov, text_col)
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("mean_nll_micro") <= threshold_micro).cast("long")
        ).alias("n_fluent"),
        F.sum("mean_nll_micro").alias("sum_mean_nll"),
    )
