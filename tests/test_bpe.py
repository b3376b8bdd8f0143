"""Distributed BPE training/encoding (functions/bpe.py, round 8): the
greedy fold semantics string-replace can't express (runs), standard
get_stats pair counting, deterministic merge-loop replay, distributed
word counts vs a driver Counter, Arrow encode vs driver replay, and
gate oracle parity at a second SF."""

from collections import Counter

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.bpe import (
    _pair_counts,
    bpe_train,
    bpe_train_from_counts,
    encode_with_merges,
    encode_word,
    merge_word,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def test_merge_word_greedy_nonoverlapping():
    assert merge_word(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert merge_word(tuple("aaa"), "a", "a") == ("aa", "a")
    assert merge_word(tuple("aab"), "a", "b") == ("a", "ab")
    assert merge_word(tuple("abab"), "a", "b") == ("ab", "ab")
    assert merge_word(("x", "ab", "ab"), "ab", "ab") == ("x", "abab")
    assert merge_word(tuple("xyz"), "p", "q") == ("x", "y", "z")


def test_pair_counts_standard_get_stats():
    # 'aaa' (count 2): positions (a,a) x2 -> 4 total; 'ab' adds (a,b)
    pc = _pair_counts({tuple("aaa"): 2, tuple("ab"): 1})
    assert pc[("a", "a")] == 4
    assert pc[("a", "b")] == 1


def test_train_hand_replay_and_tiebreak():
    """counts: 'ab' x3, 'ac' x3 -> (a,b) and (a,c) tie at 3; pair ASC
    picks (a,b) first, then (a,c)."""
    merges = bpe_train_from_counts([("ab", 3), ("ac", 3)], 2)
    assert merges[0] == (0, "a", "b", "ab", 3)
    assert merges[1] == (1, "a", "c", "ac", 3)
    # loop stops early when no pairs remain
    assert bpe_train_from_counts([("a", 5)], 4) == []


def test_train_iterates_on_merged_symbols():
    """'abab' x5: first merge (a,b); the merged vocab [ab, ab] then
    yields (ab, ab) as the next best pair — the loop must operate on
    merged symbols, not original characters."""
    merges = bpe_train_from_counts([("abab", 5)], 2)
    assert merges[0][1:4] == ("a", "b", "ab")
    assert merges[1][1:4] == ("ab", "ab", "abab")


def test_encode_word_replays_merges():
    merges = bpe_train_from_counts([("abab", 5), ("abc", 2)], 3)
    assert encode_word("ababab", merges) == tuple(
        merge_word(
            merge_word(
                merge_word(tuple("ababab"), merges[0][1], merges[0][2]),
                merges[1][1], merges[1][2],
            ),
            merges[2][1], merges[2][2],
        )
    )


def test_distributed_word_counts_match_driver(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {
        (r["word"], r["cnt"]) for r in word_counts(docs).collect()
    }
    exp = Counter()
    for r in docs.select("text").collect():
        for w in r["text"].split(" "):
            if w:
                exp[w] += 1
    assert got == set(exp.items())


def test_arrow_encode_matches_driver_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    merges = bpe_train(docs, 8)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in encode_with_merges(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = [w for w in r["text"].split(" ") if w]
        exp = (len(words), sum(len(encode_word(w, merges)) for w in words))
        assert got[r["doc_id"]] == exp


def test_gate_oracle_parity_second_sf(spark, monkeypatch):
    import os

    from otel_logger_spark.queries_training import (
        _o_bpe_encode,
        _o_bpe_merges,
        q_bpe_encode,
        q_bpe_merges,
    )

    monkeypatch.setitem(os.environ, "SPARK_GRAFT_ORACLE_SF_DIR", SF)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp_m = {tuple(r) for r in con.sql(_o_bpe_merges()).fetchall()}
    got_m = {tuple(r) for r in q_bpe_merges(spark, SF).collect()}
    assert got_m == exp_m and len(got_m) == 12
    # merges must be useful: at least one rank-0 merge of two characters
    # and at least one later merge involving a merged symbol
    assert any(len(t[3]) > 2 for t in got_m)

    exp_e = {tuple(r) for r in con.sql(_o_bpe_encode()).fetchall()}
    got_e = {tuple(r) for r in q_bpe_encode(spark, SF).collect()}
    assert got_e == exp_e
    # BPE compresses: fewer than len(word) tokens per word on average,
    # but always >= 1 token per word
    assert all(1000 <= t[3] for t in got_e)
    assert any(t[2] < 4 * t[1] for t in got_e)
