"""Distributed BPE tokenizer training + encoding.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is THE
tokenizer-training step of an LLM data pipeline. Every real trainer
(subword-nmt, HuggingFace tokenizers, sentencepiece) has the same
architecture this module mirrors honestly:

- the DISTRIBUTED work is corpus -> word-frequency table (one exchange
  with map-side partial aggregation; at 100 TB this is the job);
- the merge loop runs over that aggregated table — O(word-vocab)
  bounded driver state (the ivf.py-centroids / quantiles.py-histogram
  discipline), exactly where single-node trainers run it too;
- encoding applies the learned merges per word — a pure function of the
  word string, so it broadcasts as a word->tokens table when the word
  vocab is bounded, and runs as an Arrow-batched fold otherwise.

Merge semantics (the part string-replace CANNOT express — a run like
'a a a a' merges to [aa, aa], but replace() leaves [aa, a, aa, a]
because each match consumes the delimiter the next one needs):

  pair counts: sum over words of count(word) * adjacent-pair
               occurrences at ALL positions (subword-nmt get_stats:
               'a a a' contributes two (a,a))
  best pair  : max under the TOTAL (count DESC, pair ASC) order
  apply      : greedy left-to-right NON-OVERLAPPING fold per word
               ('a a a a' -> [aa, aa]; stats recompute next iteration)

Both engines derive word counts independently (Spark agg vs DuckDB
SQL); the merge loop and the per-word fold are THE shared functions of
the exactness contract (the DSIR-lambda / nll_table discipline), so the
gate hash-match checks the distributed aggregation, not a copied
artifact."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_word(toks: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) —
    THE shared fold (both engines' encode legs are built from it)."""
    out: list[str] = []
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return tuple(out)


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    """Adjacent-pair counts weighted by word frequency — the standard
    BPE get_stats (subword-nmt): ALL adjacent positions count, so a run
    'a a a' contributes two (a,a). For runs the winning pair's count can
    exceed the merges actually applied (the greedy fold merges
    non-overlapping); stats are recomputed from the merged vocab every
    iteration, exactly like the reference implementation."""
    pc: Counter = Counter()
    for toks, cnt in vocab.items():
        for i in range(len(toks) - 1):
            pc[(toks[i], toks[i + 1])] += cnt
    return pc


def bpe_train_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """[(rank, left, right, merged, pair_count)] — the merge loop over
    an aggregated word-frequency table, deterministic under the
    (count DESC, pair ASC) total order. Pure function: this IS the
    shared exactness contract between the Spark query and the DuckDB
    oracle."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        if w:
            key = tuple(w)  # initial symbols = single characters
            vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        merges.append((rank, a, b, a + b, cnt))
        vocab = {
            merge_word(toks, a, b): cnt2 for toks, cnt2 in vocab.items()
        }
    return merges


def encode_word(
    word: str, merges: list[tuple[int, str, str, str, int]]
) -> tuple[str, ...]:
    """Tokenize one word by replaying the merges in rank order — the
    standard BPE encode (each learned merge applied greedily)."""
    toks = tuple(word)
    for _, a, b, _, _ in merges:
        toks = merge_word(toks, a, b)
    return toks


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): the distributed half of BPE training — one exchange
    with map-side partial aggregation; empty tokens dropped."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_train(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[int, str, str, str, int]]:
    """Distributed word counts -> driver merge loop. The collect is the
    documented bounded-driver-state pattern: the word-frequency table of
    a tokenizer-training corpus is O(word vocab), the same table every
    real BPE trainer holds in memory."""
    counts = [
        (r["word"], r["cnt"]) for r in word_counts(df, text_col).collect()
    ]
    return bpe_train_from_counts(counts, n_merges)


def encode_with_merges(
    df: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc (id, *carry, n_words, n_bpe_tokens) via an Arrow-batched
    pandas fold — the scale encode path (the per-word function is pure,
    so executors memoize per batch; no shuffle, one tiny row per doc
    out)."""
    import pandas as pd

    schema = ", ".join(
        [f"{id_col} long"]
        + [f"{c} string" for c in carry_cols]
        + ["n_words long", "n_bpe_tokens long"]
    )

    def run(batches):
        for pdf in batches:
            memo: dict[str, int] = {}

            def n_toks(text: str) -> tuple[int, int]:
                words = [w for w in text.split(" ") if w]
                total = 0
                for w in words:
                    if w not in memo:
                        memo[w] = len(encode_word(w, merges))
                    total += memo[w]
                return len(words), total

            pairs = [n_toks(t or "") for t in pdf[text_col]]
            out = {id_col: pdf[id_col]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["n_words"] = pd.Series([p[0] for p in pairs], dtype="int64")
            out["n_bpe_tokens"] = pd.Series(
                [p[1] for p in pairs], dtype="int64"
            )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)
