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
quantiles.py/ivf.py bounded-driver-state pattern). Scoring has two
regimes, switched on K (round-8, VERDICT r7 #4 — the literal map is
O(K) *plan* nodes, the same Catalyst-compile blowup the quantize
D-unroll hit):

- K <= max_literal_k (default 4096): element_at against ONE literal map
  with a coalesce to the OOV constant — a pure codegen projection, zero
  shuffle, corpus text never crosses an exchange.
- K > max_literal_k (a real CCNet vocab is 50k-100k): the vocab_oov
  broadcast-probe shape — explode tokens, broadcast-hash-join the
  K-row NLL table, collapse per doc map-side. Tokens stay in their
  source partition; the only exchange moves one (id, two longs) row
  per document. Integer sums are order-independent, so both regimes
  produce bit-identical scores (pinned in tests/test_lmscore.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.vocab import vocab_topk

DEFAULT_SCALE = 1_000_000  # micro-nats

# Above this vocab size the literal-map projection is replaced by the
# broadcast-probe join: 4096 map entries (~8k literal nodes) is well
# inside Catalyst's comfort zone; 50k entries measurably is not
# (tests/test_lmscore.py pins K=50,000 on the join path).
DEFAULT_MAX_LITERAL_K = 4096


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


def _per_doc_scores(
    df: DataFrame,
    tab: dict[str, int],
    oov_nll: int,
    text_col: str,
    id_col: str,
    carry_cols: tuple[str, ...],
    out_col: str,
) -> DataFrame:
    """(id_col, *carry_cols, out_col) via the broadcast-probe shape
    (functions/vocab.py:with_oov_stats): explode tokens in place,
    broadcast-hash-join the K-row NLL table, collapse per doc map-side.
    One exchange of (id, two longs) per document; token strings never
    cross it."""
    spark = df.sparkSession
    nll_df = spark.createDataFrame(
        sorted(tab.items()), schema="tok string, _nll long"
    )
    ex = df.select(
        id_col,
        *carry_cols,
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    marked = ex.join(F.broadcast(nll_df), "tok", "left")
    return (
        marked.groupBy(id_col, *carry_cols)
        .agg(
            F.sum(
                F.coalesce(F.col("_nll"), F.lit(int(oov_nll)))
            ).alias("_nll_total"),
            F.count(F.lit(1)).alias("_n_tok"),
        )
        .withColumn(out_col, F.expr("CAST(_nll_total DIV _n_tok AS BIGINT)"))
        .drop("_nll_total", "_n_tok")
    )


def with_lm_score(
    df: DataFrame,
    tab: dict[str, int],
    oov_nll: int,
    text_col: str = "text",
    out_col: str = "mean_nll_micro",
    id_col: str | None = None,
    max_literal_k: int = DEFAULT_MAX_LITERAL_K,
) -> DataFrame:
    """Mean token NLL in integer micro-nats, appended as ``out_col``.

    K <= ``max_literal_k``: one codegen fold against a single K-entry
    literal map — a pure projection, zero shuffle, O(K) plan nodes (the
    reason for the cap). K above it: per-doc scores via the broadcast
    probe (``_per_doc_scores``) joined back on ``id_col``, which must be
    a unique document key (required in this regime — raising beats
    silently compiling a 100k-literal plan). Both regimes are
    bit-identical: the fold and the probe sum the same integers."""
    if len(tab) <= max_literal_k:
        # map_from_arrays over TWO list literals, not create_map over 2K
        # scalar literals: one py4j call per array instead of one per
        # entry (round 9; same map, same element_at lookups)
        items = sorted(tab.items())
        m = F.map_from_arrays(
            F.lit([k for k, _ in items]), F.lit([int(v) for _, v in items])
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
            .withColumn(
                out_col, F.expr("CAST(_nll_total DIV _n_tok AS BIGINT)")
            )
            .drop("_nll_total", "_n_tok")
        )
    if id_col is None:
        raise ValueError(
            f"vocab K={len(tab)} exceeds max_literal_k={max_literal_k}: "
            "the literal-map plan would be O(K) expression nodes — pass "
            "id_col (a unique document key) to score via the "
            "broadcast-probe join, or raise max_literal_k explicitly"
        )
    scores = _per_doc_scores(
        df, tab, oov_nll, text_col, id_col, (), out_col
    )
    return df.join(scores, id_col, "left")


def lm_fluency_report(
    df: DataFrame,
    ref_df: DataFrame,
    k: int,
    threshold_micro: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_k: int = DEFAULT_MAX_LITERAL_K,
) -> DataFrame:
    """(group, n_docs, n_fluent, sum_mean_nll): per-group accounting of
    the fluency cut at ``threshold_micro`` mean token NLL. Above
    ``max_literal_k`` the per-doc scores come straight from the
    broadcast probe with ``group_col`` carried through — no join-back
    at all (the only exchange is one tiny row per doc)."""
    tab, oov = nll_table(reference_counts(ref_df, k, text_col))
    if len(tab) <= max_literal_k:
        scored = with_lm_score(df, tab, oov, text_col,
                               max_literal_k=max_literal_k)
    else:
        scored = _per_doc_scores(
            df, tab, oov, text_col, id_col, (group_col,), "mean_nll_micro"
        )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("mean_nll_micro") <= threshold_micro).cast("long")
        ).alias("n_fluent"),
        F.sum("mean_nll_micro").alias("sum_mean_nll"),
    )
