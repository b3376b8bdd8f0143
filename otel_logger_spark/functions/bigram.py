"""Bigram-LM fluency scoring with stupid backoff — the distributed-LM
quality filter.

Brants et al. 2007 ("Large Language Models in Machine Translation",
W07-0718) introduced *stupid backoff* precisely because it is the
n-gram score that distributes: no normalization pass, no held-out
tuning — S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1}) when the
bigram was seen in the reference, else alpha * S(w_i) with a fixed
alpha = 0.4. This module is the bigram step up from the unigram CCNet
proxy in functions/lmscore.py, with the same exactness contract:

  uni table   = lmscore.nll_table (add-one smoothing, OOV bucket)
  bi  nll     = round(SCALE * -ln(bc / uc_w1))        [micro-nats]
  backoff     = round(SCALE * -ln(0.4))  (916291 at SCALE=1e6)
  token cost  = uni(w_1)                         for the first token
                bi(w_{i-1} w_i)                  when the bigram is known
                backoff + uni(w_i)               otherwise
  score(doc)  = sum(cost) div n_tokens           [integer]

Float math enters exactly once, driver-side, through the two shared
table builders (``lmscore.nll_table`` + ``bigram_nll_table``) that both
engines feed with their own independently-derived counts; everything
downstream is integer, so the regimes and the DuckDB oracle are
bit-identical.

Reference bigram table: adjacent pairs where BOTH tokens are in the
top-K vocab (the ratio bc/uc needs uc from the same table), top-B under
the TOTAL (count DESC, pair ASC) order — pair is the space-joined
string, unambiguous because tokens are split on space, and the space
byte sorts below every token byte in both engines' binary collation.

Scale shape (100 TB): pairs are built IN PLACE with slice + zip_with (a
pure codegen projection — no posexplode + window lag, which would
shuffle the corpus to sequence it). Scoring has the lmscore two-regime
switch:

- small tables (K + B <= max_literal_k): one literal-map fold — zero
  shuffle, corpus text never crosses an exchange;
- large tables (a real web-scale bigram table is 10^5-10^6 rows):
  explode one row per token position carrying (pair, tok),
  broadcast-hash-join the B-row bigram table on pair and the K-row
  unigram table on tok, collapse per doc map-side — the only exchange
  moves one (id, two longs) row per document. Integer sums are
  order-independent, so both regimes are bit-identical (pinned in
  tests/test_bigram.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.lmscore import (
    DEFAULT_MAX_LITERAL_K,
    DEFAULT_SCALE,
    nll_table,
    reference_counts,
)

BACKOFF_ALPHA = 0.4


def backoff_nll(scale: int = DEFAULT_SCALE) -> int:
    return round(scale * -math.log(BACKOFF_ALPHA))


def _pairs(words):
    """array<struct<pair,nxt>> of adjacent-token transitions, built in
    place (codegen; no shuffle): pair = 'w1 w2', nxt = w2."""
    n = F.size(words)
    return F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.struct(
            F.concat(a, F.lit(" "), b).alias("pair"), b.alias("nxt")
        ),
    )


def reference_bigram_counts(
    ref_df: DataFrame,
    uni_counts: list[tuple[str, int]],
    b: int,
    text_col: str = "text",
) -> list[tuple[str, int]]:
    """[(pair, count)] for the top-b reference bigrams whose BOTH tokens
    sit in the unigram vocab — bounded driver state (b rows),
    deterministic under (count DESC, pair ASC). The vocab filter is a
    literal isin (K is capped), so the reference leg is one scan +
    TakeOrderedAndProject."""
    vocab = [t for t, _ in uni_counts]
    words = F.split(F.col(text_col), " ")
    ex = ref_df.select(F.explode(_pairs(words)).alias("p")).select(
        "p.pair", "p.nxt",
        F.element_at(F.split(F.col("p.pair"), " "), 1).alias("w1"),
    )
    top = (
        ex.filter(F.col("w1").isin(vocab) & F.col("nxt").isin(vocab))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(b)
    )
    return [(r["pair"], r["cnt"]) for r in top.collect()]


def bigram_nll_table(
    bi_counts: list[tuple[str, int]],
    uni_counts: list[tuple[str, int]],
    scale: int = DEFAULT_SCALE,
) -> dict[str, int]:
    """{pair: nll_micro} = round(scale * -ln(bc / uc_w1)). THE shared
    function of the exactness contract: both engines call this with
    their own independently-derived counts. bc <= uc_w1 always (every
    bigram occurrence is an occurrence of w1), so nll >= 0."""
    uc = dict(uni_counts)
    out = {}
    for pair, bc in bi_counts:
        w1 = pair.split(" ", 1)[0]
        out[pair] = round(scale * -math.log(bc / uc[w1]))
    return out


def with_bigram_score(
    df: DataFrame,
    uni_tab: dict[str, int],
    oov_nll: int,
    bi_tab: dict[str, int],
    text_col: str = "text",
    out_col: str = "mean_nll_micro",
    id_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
    max_literal_k: int = DEFAULT_MAX_LITERAL_K,
    scale: int = DEFAULT_SCALE,
) -> DataFrame:
    """Mean per-token stupid-backoff NLL in integer micro-nats.

    Small tables: one codegen fold (two literal maps), zero shuffle.
    Large tables: the broadcast-probe shape — requires ``id_col`` (a
    unique document key); returns (id, *carry_cols, out_col). Both
    regimes bit-identical."""
    bo = backoff_nll(scale)
    words = F.split(F.col(text_col), " ")
    if len(uni_tab) + len(bi_tab) <= max_literal_k:
        # map_from_arrays over TWO list literals, not create_map over 2K
        # scalar literals: one py4j call per array instead of one per
        # entry (round 9; same map, same element_at lookups)
        uni_items = sorted(uni_tab.items())
        m_uni = F.map_from_arrays(
            F.lit([k for k, _ in uni_items]),
            F.lit([int(v) for _, v in uni_items]),
        )
        bi_items = sorted(bi_tab.items())
        m_bi = (
            F.map_from_arrays(
                F.lit([k for k, _ in bi_items]),
                F.lit([int(v) for _, v in bi_items]),
            )
            if bi_tab
            else None
        )
        uni = lambda w: F.coalesce(  # noqa: E731
            F.element_at(m_uni, w), F.lit(int(oov_nll))
        )
        first = uni(F.element_at(words, 1))
        if m_bi is not None:
            step = lambda acc, p: acc + F.coalesce(  # noqa: E731
                F.element_at(m_bi, p["pair"]), F.lit(int(bo)) + uni(p["nxt"])
            )
        else:
            step = lambda acc, p: acc + F.lit(int(bo)) + uni(p["nxt"])  # noqa: E731
        total = first + F.aggregate(
            _pairs(words), F.lit(0).cast("long"), step
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
            f"tables K+B={len(uni_tab) + len(bi_tab)} exceed "
            f"max_literal_k={max_literal_k}: pass id_col to score via the "
            "broadcast-probe joins, or raise max_literal_k explicitly"
        )
    spark = df.sparkSession
    uni_df = spark.createDataFrame(
        sorted(uni_tab.items()), schema="tok string, _unll long"
    )
    bi_df = spark.createDataFrame(
        sorted(bi_tab.items()) or [("", 0)], schema="pair string, _bnll long"
    )
    # one row per token position: pos 1 carries a NULL pair (first-token
    # regime); every later position carries (prev tok, this tok)
    ex = df.select(
        id_col,
        *carry_cols,
        F.posexplode(
            F.concat(
                F.array(
                    F.struct(
                        F.lit(None).cast("string").alias("pair"),
                        F.element_at(words, 1).alias("nxt"),
                    )
                ),
                _pairs(words),
            )
        ).alias("_pos", "p"),
    ).select(id_col, *carry_cols, "p.pair", F.col("p.nxt").alias("tok"))
    marked = ex.join(F.broadcast(bi_df), "pair", "left").join(
        F.broadcast(uni_df), "tok", "left"
    )
    cost = F.when(
        F.col("pair").isNull(),
        F.coalesce(F.col("_unll"), F.lit(int(oov_nll))),
    ).otherwise(
        F.coalesce(
            F.col("_bnll"),
            F.lit(int(bo))
            + F.coalesce(F.col("_unll"), F.lit(int(oov_nll))),
        )
    )
    return (
        marked.groupBy(id_col, *carry_cols)
        .agg(
            F.sum(cost).alias("_nll_total"),
            F.count(F.lit(1)).alias("_n_tok"),
        )
        .withColumn(out_col, F.expr("CAST(_nll_total DIV _n_tok AS BIGINT)"))
        .drop("_nll_total", "_n_tok")
    )


def bigram_fluency_report(
    df: DataFrame,
    ref_df: DataFrame,
    k: int,
    b: int,
    threshold_micro: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_literal_k: int = DEFAULT_MAX_LITERAL_K,
) -> DataFrame:
    """(group, n_docs, n_fluent, sum_mean_nll): per-group accounting of
    the stupid-backoff fluency cut. Reference tables are bounded driver
    state (k + b rows); above ``max_literal_k`` the per-doc scores come
    straight from the broadcast probe with ``group_col`` carried
    through."""
    uni_counts = reference_counts(ref_df, k, text_col)
    uni_tab, oov = nll_table(uni_counts)
    bi_tab = bigram_nll_table(
        reference_bigram_counts(ref_df, uni_counts, b, text_col), uni_counts
    )
    if len(uni_tab) + len(bi_tab) <= max_literal_k:
        scored = with_bigram_score(
            df, uni_tab, oov, bi_tab, text_col,
            max_literal_k=max_literal_k,
        )
    else:
        scored = with_bigram_score(
            df, uni_tab, oov, bi_tab, text_col,
            id_col=id_col, carry_cols=(group_col,),
            max_literal_k=max_literal_k,
        )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            (F.col("mean_nll_micro") <= threshold_micro).cast("long")
        ).alias("n_fluent"),
        F.sum("mean_nll_micro").alias("sum_mean_nll"),
    )
