"""Vocabulary construction + out-of-vocabulary coverage.

Tokenizer prep for a training corpus: build the top-k token vocabulary
(count DESC, token ASC — a TOTAL order, so the boundary of the top-k is
deterministic in both engines), then measure per-group OOV coverage —
the fraction of token occurrences a k-entry vocab would miss. The
existing ops measure token COUNTS (text.py) and document frequency
(tfidf.py); neither answers the tokenizer-sizing question "what does a
k-token vocab cover, per language/source?".

Scale shape (100 TB):
- vocab: explode is a same-partition projection, the token count
  partial-aggregates map-side, and the top-k is TakeOrderedAndProject
  (per-partition heap + k-row driver merge) — never a global sort.
- coverage: tokens join the BROADCAST vocab, then partial-aggregate by
  doc_id BEFORE the exchange — explode keeps a doc's tokens in its
  source partition, so the shuffle moves ~one tiny count row per doc,
  not one row per token; token strings never cross an exchange after
  the broadcast probe.
- All outputs integer (counts + milli rates) — exact oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vocab_topk(df: DataFrame, k: int, text_col: str = "text") -> DataFrame:
    """(tok, cnt): the k most frequent whitespace tokens, ties broken by
    token ASC so the set is deterministic."""
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(k)
    )


def with_oov_stats(
    df: DataFrame,
    vocab_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col, *carry_cols, n_tokens, n_oov) per document. Broadcast
    left join against the vocab marks in-vocab occurrences; the per-doc
    aggregate collapses map-side (see module docstring)."""
    ex = df.select(
        id_col,
        *carry_cols,
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    marked = ex.join(
        F.broadcast(vocab_df.select("tok", F.lit(1).alias("iv"))),
        "tok",
        "left",
    )
    return marked.groupBy(id_col, *carry_cols).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_if(F.col("iv").isNull()).alias("n_oov"),
    )


def oov_from_per_doc(per_doc: DataFrame, group_col: str = "lang") -> DataFrame:
    """Finalize per-doc (group, n_tokens, n_oov) stats into the corpus
    report. Split out from oov_report so the streaming path can sum the
    SAME aggregate over unioned micro-batch partials (per-doc rows are
    the partial: a doc lives wholly in one micro-batch, and group sums
    are associative across batches)."""
    return (
        per_doc.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("n_oov").alias("sum_oov"),
        )
        .withColumn(
            "oov_milli",
            F.expr("CAST((1000 * sum_oov) DIV sum_tokens AS BIGINT)"),
        )
    )


def oov_report(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, sum_tokens, sum_oov, oov_milli): corpus-level OOV
    coverage of a k-entry vocab per group. oov_milli is integer
    1000*sum_oov div sum_tokens — exact in both engines."""
    vocab = vocab_topk(df, k, text_col)
    per_doc = with_oov_stats(df, vocab, text_col, id_col, (group_col,))
    return oov_from_per_doc(per_doc, group_col)
