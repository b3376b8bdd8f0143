"""Sequence packing: hand-computed shard assignment (including the
atomic-oversize-document sparse-id case), conservation invariants, and
Spark-vs-DuckDB parity on the real gate input."""

import duckdb
from pyspark.sql import functions as F

from otel_logger_spark.functions.packing import pack_documents, pack_stats


def _docs(spark, tokens, source="s"):
    return spark.createDataFrame(
        [(i, source, n) for i, n in enumerate(tokens)],
        "doc_id long, source string, n long",
    )


def test_hand_assignment(spark):
    """tokens [300,300,300,300], budget 600: starts 0/300/600/900 ->
    packs 0,0,1,1."""
    out = pack_documents(_docs(spark, [300, 300, 300, 300]), budget=600,
                         token_col="n", n_buckets=1).collect()
    assert {r["doc_id"]: (r["start_offset"], r["pack_id"]) for r in out} == {
        0: (0, 0), 1: (300, 0), 2: (600, 1), 3: (900, 1)
    }


def test_oversize_doc_owns_shard_sparse_ids(spark):
    """A 1500-token doc at budget 600 owns pack 0; the next doc starts at
    offset 1500 -> pack 2 (pack 1 is legitimately absent: the stream
    positions it covers are inside the oversize document)."""
    out = pack_documents(_docs(spark, [1500, 100]), budget=600,
                         token_col="n", n_buckets=1).collect()
    assert {r["doc_id"]: r["pack_id"] for r in out} == {0: 0, 1: 2}


def test_conservation_and_bucketing(spark):
    """Across buckets and packs nothing is lost: doc counts and token
    sums are conserved, and every doc's bucket is doc_id % n_buckets."""
    tokens = [((i * 37) % 400) + 1 for i in range(200)]
    df = _docs(spark, tokens)
    stats = pack_stats(df, budget=500, token_col="n", n_buckets=4)
    agg = stats.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).collect()[0]
    assert agg["d"] == 200 and agg["t"] == sum(tokens)
    packed = pack_documents(df, budget=500, token_col="n", n_buckets=4)
    assert packed.filter(F.col("bucket") != F.col("doc_id") % 4).count() == 0
    # determinism
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_documents(df, budget=500, token_col="n",
                                         n_buckets=4).collect()))
    assert a == b


def test_pack_shards_oracle_parity_sf0001(spark):
    from otel_logger_spark.queries_training import O_PACK_SHARDS, q_pack_shards

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(O_PACK_SHARDS).fetchall()}
    got = {
        (r["source"], r["bucket"], r["pack_id"], r["n_docs"], r["n_tokens"],
         r["first_doc"], r["last_doc"], r["fill_pct"])
        for r in q_pack_shards(spark, sf).collect()
    }
    assert got == exp and len(got) > 0


def test_n_buckets_is_an_explicit_contract_parameter(spark):
    """Round 7 (advisor): n_buckets is part of the manifest's identity —
    a config-derived default made the same code produce different shard
    manifests under different spark.sql.shuffle.partitions settings. It
    is now required (keyword-only) and validated."""
    import pytest

    df = _docs(spark, [((i * 37) % 400) + 1 for i in range(200)])
    with pytest.raises(TypeError):
        pack_documents(df, budget=500, token_col="n")
    with pytest.raises(ValueError, match="n_buckets"):
        pack_documents(df, budget=500, token_col="n", n_buckets=0)
    # the manifest is invariant under a different shuffle.partitions
    before = spark.conf.get("spark.sql.shuffle.partitions")
    rows_a = sorted(map(tuple, pack_documents(
        df, budget=500, token_col="n", n_buckets=4).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(int(before) + 7))
        rows_b = sorted(map(tuple, pack_documents(
            df, budget=500, token_col="n", n_buckets=4).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert rows_a == rows_b


def test_fill_pct_semantics(spark):
    """fill_pct = (100 * n_tokens) DIV budget: ~100 for packed shards,
    < 100 for the stream tail, > 100 for an oversize atomic document."""
    stats = {
        r["pack_id"]: (r["n_tokens"], r["fill_pct"])
        for r in pack_stats(
            _docs(spark, [1500, 300, 300, 100]), budget=600,
            token_col="n", n_buckets=1,
        ).collect()
    }
    # starts: 0 (pack 0, oversize), 1500 -> pack 2, 1800 -> pack 3, 2100 -> pack 3
    assert stats == {0: (1500, 250), 2: (300, 50), 3: (400, 66)}
