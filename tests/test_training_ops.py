"""Tests for the training-data operators: the rows-only gates (minhash,
simhash, LSH-ANN, fingerprint, multimodal) are cross-checked here against
exact ground truth; the oracle-gated ones get spot semantics checks."""

import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.dedup import (
    exact_dedup_stats,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    with_shingles,
)
from otel_logger_spark.functions.multimodal import as_media, decode_media
from otel_logger_spark.functions.similarity import cosine_topk, lsh_ann_topk
from otel_logger_spark.functions.text import (
    fingerprint_text,
    with_lang_guess,
    with_quality,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _corpus(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),  # exact dup of 1
        (3, "a b c d e f g h i j k l"),  # near dup of 1
        (4, "z y x w v u t s r q"),  # unrelated
        (5, "single"),  # shorter than a shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles(spark):
    out = with_shingles(_corpus(spark), n=3).select("doc_id", "shingles").collect()
    m = {r["doc_id"]: r["shingles"] for r in out}
    assert m[1][0] == "a b c" and len(m[1]) == 8
    assert m[5] == []  # too short -> no shingles


def test_exact_dedup_stats(spark):
    r = exact_dedup_stats(_corpus(spark)).collect()[0]
    assert (r["n_total"], r["n_unique"], r["n_dup_docs"], r["n_dup_groups"]) == (5, 4, 2, 1)


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["j_milli"]
        for r in ngram_jaccard_pairs(_corpus(spark), threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1000  # identical
    # doc1 has 8 shingles, doc3 has 10; common 8 -> j = 8/10 = 0.8
    assert pairs[(1, 3)] == 800
    assert (1, 4) not in pairs


def test_minhash_recall_vs_exact(spark, docs):
    """On the real corpus + injected dups, banded MinHash must recover
    every exact-Jaccard>=0.5 pair (high-sim pairs; b=8,r=4 makes
    P(miss at j>=0.5) = (1-0.5^4)^8 ~ 0.6 per pair... so allow recall >=
    0.8 overall since injected dups have j>=0.95 where P(miss)<1e-3)."""
    corpus = docs.select("doc_id", "text").union(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 5000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz extra")).alias("text"),
        )
    )
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(corpus, threshold=0.8).collect()
    }
    mh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(corpus, threshold=0.8).collect()
    }
    assert exact, "test needs some true pairs"
    assert mh <= exact  # verify step guarantees no false positives
    assert len(mh & exact) / len(exact) >= 0.8


def test_simhash_pairs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_near_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0  # identical text -> identical simhash
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_ann_recall(spark, emb):
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        # tiny corpus (50 vecs at sf0.001): coarse buckets + many tables
        for r in lsh_ann_topk(emb, queries, k=5, n_planes=4, n_tables=16, dim=64).collect()
    }
    # approximate: needs substantial overlap with exact top-k
    assert len(approx & exact) / len(exact) >= 0.5
    # every ANN result is a real vector pair, not fabricated
    assert all(q != n for q, n in approx)


def test_cosine_topk_self_excluded_and_ranked(spark, emb):
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert len(out) == 3
    assert all(r["neighbor_id"] != 0 for r in out)
    sims = [r["sim_micro"] for r in sorted(out, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)


def test_fingerprint_vectorized_bitexact_vs_reference():
    """The numpy prefix-hash batch path (the UDF's engine) and the
    pure-JVM expression variant must both equal the per-char reference
    on adversarial lengths (0, 1, boundary 31/32/33, long, repeated-min,
    non-ASCII, chunk-boundary mixes)."""
    import random

    from otel_logger_spark.functions.text import fingerprints_batch

    random.seed(11)
    texts = ["", "x", "a" * 31, "b" * 32, "c" * 33, "dup " * 200]
    for _ in range(400):
        ln = random.choice([0, 1, 5, 31, 32, 33, 64, random.randint(1, 700)])
        texts.append(
            "".join(chr(random.randint(32, 2000)) for _ in range(ln))
        )
    got = fingerprints_batch(texts)
    for i, t in enumerate(texts):
        assert got[i] == fingerprint_text(t) - (1 << 62), (i, len(t))


def test_fingerprint_chunking_invariant():
    """Chunk boundaries cannot change results: force multi-chunk by
    shrinking the cap."""
    from otel_logger_spark.functions import text as tx

    texts = [f"doc {i} " + "z" * (i % 90) for i in range(200)]
    whole = tx.fingerprints_batch(texts)
    old = tx._FP_CHUNK_CHARS
    try:
        tx._FP_CHUNK_CHARS = 256
        chunked = tx.fingerprints_batch(texts)
    finally:
        tx._FP_CHUNK_CHARS = old
    assert list(whole) == list(chunked)


def test_fingerprint_jvm_expr_matches_udf(spark, docs):
    """with_fingerprint_jvm (0 Python stages, opt-in) == the UDF path on
    real documents plus a null row."""
    from pyspark.sql import types as T

    from otel_logger_spark.functions.text import (
        with_fingerprint,
        with_fingerprint_jvm,
    )

    extra = spark.createDataFrame(
        [(999999, None)],
        T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]),
    )
    d = docs.select("doc_id", "text").unionByName(extra)
    a = {r["doc_id"]: r["fingerprint"]
         for r in with_fingerprint(d).select("doc_id", "fingerprint").collect()}
    b = {r["doc_id"]: r["fingerprint"]
         for r in with_fingerprint_jvm(d).select("doc_id", "fingerprint").collect()}
    assert a == b and a[999999] is None
    # the JVM variant's plan has zero Python stages
    plan = with_fingerprint_jvm(d)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_fingerprint_properties():
    a = fingerprint_text("the quick brown fox " * 20)
    assert a == fingerprint_text("the quick brown fox " * 20)  # deterministic
    # robust to an APPEND (winnowing min survives) ...
    assert a == fingerprint_text("the quick brown fox " * 20 + " trailing junk")
    # ... but a different body gives a different fingerprint
    assert a != fingerprint_text("totally other content " * 20)
    assert fingerprint_text("short") == fingerprint_text("short")


def test_lang_guess_markers(spark):
    rows = [
        (1, "this is the house of the king and the queen"),
        (2, "esta es la casa el rey y los reyes"),
        (3, "xyz qqq zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_guess(df).collect()}
    assert out == {1: "en", 2: "es", 3: "unk"}


def test_quality_score_monotonic(spark):
    rows = [
        (1, "the cat sat on the mat and the dog ran off with the hat today"),
        (2, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["quality_milli"] for r in with_quality(df).collect()}
    assert out[1] > out[2]


def test_multimodal_plumbing(spark, docs):
    media = as_media(docs)
    assert dict(media.dtypes)["data"] == "binary"
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == docs.count()
    byid = {r["doc_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for i, r in byid.items():
        assert r["n_bytes"] == len(src[i].encode())
        assert 64 <= r["width"] < 64 + 577 and 64 <= r["height"] < 64 + 433
        assert r["decoder"] == "fake"
    # determinism: same payload -> same phash
    again = {r["doc_id"]: r["phash"] for r in decode_media(media).collect()}
    assert again == {i: r["phash"] for i, r in byid.items()}


def test_ivf_ann_recall(spark, emb):
    from otel_logger_spark.functions.ivf import ivf_topk, train_centroids, ivf_index

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=4).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.5
    # determinism: same seed -> identical centroids and assignments
    c1 = train_centroids(emb, k=8, seed=42)
    c2 = train_centroids(emb, k=8, seed=42)
    assert c1 == c2
    a1 = {(r["vec_id"], r["cluster_id"]) for r in ivf_index(emb, c1).collect()}
    a2 = {(r["vec_id"], r["cluster_id"]) for r in ivf_index(emb, c2).collect()}
    assert a1 == a2
    # every vector landed in exactly one inverted list
    assert len(a1) == emb.count()


def test_python_xxh64_matches_spark_long_int(spark):
    """oracles_ivf replicates Spark's xxhash64 on a LongType column chained
    with an IntegerType literal — the training-sample key. Bit parity here
    underwrites the IVF oracle's independent sample derivation."""
    from otel_logger_spark.oracles_ivf import spark_sample_key, xxh64_long

    ids = [0, 1, -1, 7, 2**40 + 3, -(2**55), 123456789, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id: long")
    rows = df.select(
        "vec_id",
        F.xxhash64("vec_id").alias("h"),
        F.pmod(F.xxhash64(F.col("vec_id"), F.lit(42)), F.lit(1 << 30)).alias("pm"),
    ).collect()
    for r in rows:
        u = xxh64_long(r["vec_id"], 42)
        assert (u - (1 << 64) if u >= (1 << 63) else u) == r["h"]
        assert spark_sample_key(r["vec_id"], 42) == r["pm"]


def test_hll_linear_counting_formula_matches_spark(spark):
    """Pins the oracles_hll.py derivation against Spark itself: at
    relativeSD 0.05 (p=9, m=512), approx_count_distinct equals
    floor(512*ln(512/V) + 0.5) where V counts registers untouched by the
    top-9-bits-of-xxhash64 index — for every cardinality in the linear
    regime (up to ~2.5*m). Uses Spark's own hash so the formula and the
    DuckDB XXH64 are pinned independently."""
    import math

    for n in [1, 5, 150, 500, 1200]:
        df = spark.createDataFrame(
            [("conv-%06d" % i,) for i in range(n)], "s: string"
        )
        row = df.agg(
            F.approx_count_distinct("s").alias("a"),
            F.countDistinct(
                F.shiftrightunsigned(F.xxhash64("s"), 55)
            ).alias("touched"),
        ).collect()[0]
        v = 512 - row["touched"]
        assert row["a"] == math.floor(512 * math.log(512 / v) + 0.5), n


def test_hll_estimator_replica_matches_spark_all_branches(spark):
    """Round 6: the full-regime pure-Python estimator replica
    (oracles_hll.hll_estimate_from_hashes — bytecode-ported from the
    installed spark-catalyst jar) equals Spark's approx_count_distinct
    across cardinalities spanning every branch: linear (threshold + the
    e_raw <= 2.5m clause), both crossovers (~1230 and ~2650 values),
    bias-corrected KNN, and raw. Register contents come from Spark's own
    xxhash64 so this pins the ESTIMATOR independently of the DuckDB hash
    (itself pinned by test_duckdb_xxh64_matches_spark). A 279-point dense
    sweep (step 1 through both crossovers) passed during development;
    this keeps a representative 60-point matrix for CI time."""
    from otel_logger_spark.oracles_hll import hll_estimate_from_hashes

    ns = sorted(
        set(
            [1, 2, 3, 7, 50, 150, 400, 700, 1000]
            + list(range(1150, 1330, 20))  # linear<->bias crossover
            + [1400, 1700, 2000, 2300]
            + list(range(2450, 2720, 30))  # bias<->raw crossover
            + [3000, 3500, 5000, 9000]
        )
    )
    rows = [(n, "conv-%06d" % i) for n in ns for i in range(n)]
    df = spark.createDataFrame(rows, "n: int, s: string").repartition(32)
    got = {
        r["n"]: r["a"]
        for r in df.groupBy("n")
        .agg(F.approx_count_distinct("s").alias("a"))
        .collect()
    }
    hs = [
        r["h"]
        for r in spark.createDataFrame(
            [("conv-%06d" % i,) for i in range(max(ns))], "s: string"
        )
        .select(F.xxhash64("s").alias("h"))
        .collect()
    ]
    for n in ns:
        assert hll_estimate_from_hashes(hs[:n]) == got[n], n


def test_hll_oracle_sql_multi_regime_matches_replica():
    """The generated DuckDB SQL (hash + rho ladder + sequential-order
    list_reduce zInverse + KNN bias window) reproduces the Spark-pinned
    Python replica for role groups sitting in each estimator regime —
    pure DuckDB vs pure Python, no Spark session needed. Exact counts
    ride along."""
    import duckdb

    from otel_logger_spark.oracles_hll import (
        approx_distinct_by_role_oracle,
        hll_estimate_from_hashes,
    )
    from otel_logger_spark.oracles_ivf import xxh64_long

    # xxh64 over the UTF-8 string bytes — reuse Spark via precomputed?
    # No: hash strings with DuckDB's own pinned XXH64 SQL inside the
    # oracle; the replica needs the same hashes, so compute them with a
    # tiny DuckDB query using the shared CTEs.
    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    cards = {"lin": 150, "xover": 1230, "bias": 1500, "raw": 2700}
    rows = [
        (role, "conv-%06d" % i) for role, n in cards.items() for i in range(n)
    ]
    con = duckdb.connect()
    con.sql("CREATE TABLE src (role VARCHAR, conv_id VARCHAR)")
    con.executemany("INSERT INTO src VALUES (?, ?)", rows)
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(
            approx_distinct_by_role_oracle(
                "WITH t AS (SELECT role, conv_id FROM src)"
            )
        ).fetchall()
    }
    # replica expectation from the same DuckDB-side hashes
    hashes = dict(
        con.sql(
            "WITH vocab AS (SELECT DISTINCT conv_id AS tok FROM src), "
            + xxh64_ctes().lstrip().lstrip(",").strip()
            + " SELECT tok, h64 FROM hashes"
        ).fetchall()
    )
    for role, n in cards.items():
        exp = hll_estimate_from_hashes(
            int(hashes["conv-%06d" % i]) for i in range(n)
        )
        assert got[role] == (exp, n), role


def test_approx_distinct_oracle_end_to_end_sf01(spark):
    """Round 6 regression for the round-5 '42/43 at sf0.1' exception:
    sf0.1's ~1500 convs/role sits in the bias-corrected branch the oracle
    previously abstained from (NULL above H=1150). Full oracle parity at
    sf0.1 now that oracles_hll.py models every regime."""
    import duckdb

    from otel_logger_spark.queries_extra import (
        _o_approx_distinct,
        q_approx_distinct,
    )

    sf = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = {tuple(r) for r in con.sql(_o_approx_distinct()).fetchall()}
    got = {
        (r["role"], r["approx_convs"], r["exact_convs"])
        for r in q_approx_distinct(spark, sf).collect()
    }
    assert got == exp
    assert all(a is not None for _, a, _ in got)  # no abstentions anywhere


def test_approx_distinct_oracle_end_to_end_sf0001(spark):
    """Full oracle parity at a second SF (the driver gate runs sf0.01):
    DuckDB HLL re-derivation == Spark approx_count_distinct, both columns."""
    import duckdb

    from otel_logger_spark.queries_extra import _o_approx_distinct, q_approx_distinct

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    exp = {tuple(r) for r in con.sql(_o_approx_distinct()).fetchall()}
    got = {
        (r["role"], r["approx_convs"], r["exact_convs"])
        for r in q_approx_distinct(spark, SF).collect()
    }
    assert got == exp


def test_ivf_oracle_training_and_topk_bitexact(spark, emb):
    """The DuckDB-side training re-derivation (independent sample + shared
    Lloyd) must produce the engine's exact centroids, and the full
    generated oracle SQL must reproduce ivf_topk row-for-row — at a
    DIFFERENT SF than the driver gate uses (sf0.001 here, sf0.01 there)."""
    import duckdb

    from otel_logger_spark.functions.ivf import ivf_topk, train_centroids
    from otel_logger_spark.oracles_ivf import (
        ivf_topk_oracle,
        train_centroids_from_parquet,
    )

    path = f"{SF}/embeddings.parquet"
    assert train_centroids(emb, k=16, seed=42) == train_centroids_from_parquet(
        path, k=16, seed=42
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    exp = {tuple(r) for r in con.sql(
        ivf_topk_oracle(path, k=5, n_clusters=16, n_probe=4)
    ).fetchall()}
    queries = emb.filter(F.col("vec_id") < 20)
    got = {
        (r["query_id"], r["neighbor_id"], r["sim_micro"], r["rank"])
        for r in ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4).collect()
    }
    assert got == exp


def test_nearest_centroid_expression_scales_in_dim(spark):
    """Round 7: the centroid-distance expression is O(k) nodes (k array
    literals + one indexed transform), never O(k*D) unrolled terms.
    Assignments must equal a sequential-fold Python replay (same
    left-associated double arithmetic), and a k=64/D=512 plan must
    build and run inside a generous wall."""
    import math
    import time

    import numpy as np

    from otel_logger_spark.functions.ivf import ivf_index

    D, N, K = 512, 80, 64
    vecs = [
        [float(np.float32(math.cos(0.05 * i * (j + 3)))) for j in range(D)]
        for i in range(N)
    ]
    cents = [[float(np.float32(math.sin(0.07 * c * (j + 1))))
              for j in range(D)] for c in range(K)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    t0 = time.monotonic()
    got = {r["vec_id"]: r["cluster_id"]
           for r in ivf_index(df, cents).select("vec_id", "cluster_id").collect()}
    wall = time.monotonic() - t0
    assert wall < 60, f"k=64/D=512 assignment took {wall:.1f}s"

    def fold_dist(v, c):
        acc = 0.0
        for a, b in zip(v, c):
            acc = acc + (a - b) * (a - b)
        return acc

    for i, v in enumerate(vecs[:20]):
        ds = [(fold_dist(v, c), cid) for cid, c in enumerate(cents)]
        assert got[i] == min(ds)[1]


def test_ivf_quantized_composed_path(spark, emb):
    """The composed 100 TB ANN path (IVF probe -> int8 re-rank): oracle
    parity at a second SF, candidate-set consistency with ivf_topk (the
    pruning is shared), recall against the exact quantized ranking, and
    the no-NLJ plan shape."""
    import duckdb

    from otel_logger_spark.functions.ivf import ivf_quantized_topk, ivf_topk
    from otel_logger_spark.functions.quantize import (
        measure_ranges,
        quantized_topk,
    )
    from otel_logger_spark.oracles_ivf import ivf_quantized_oracle

    path = f"{SF}/embeddings.parquet"
    ranges = measure_ranges(emb)
    queries = emb.filter(F.col("vec_id") < 20)
    df = ivf_quantized_topk(emb, queries, ranges, k=5, n_clusters=16, n_probe=4)

    # plan shape: candidates come from an equi-join on cluster_id, never
    # a nested-loop product over the corpus
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = {tuple(r) for r in df.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{path}'")
    exp = {tuple(r) for r in con.sql(
        ivf_quantized_oracle(path, k=5, n_clusters=16, n_probe=4)
    ).fetchall()}
    assert got == exp and len(got) > 0

    # same probe lists as ivf_topk -> same candidate UNIVERSE; rankings
    # differ only by metric (quantized L2 vs exact cosine)
    float_pairs = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4).collect()
    }
    exact_q = {
        (r["query_id"], r["neighbor_id"])
        for r in quantized_topk(emb, queries, ranges, k=5).collect()
    }
    pruned_pairs = {(q, n) for q, n, _, _ in got}
    # recall of the pruned quantized ranking vs brute-force quantized
    assert len(pruned_pairs & exact_q) / len(exact_q) >= 0.5
    # both IVF variants saw the same lists: heavy overlap with the float path
    assert len(pruned_pairs & float_pairs) / len(float_pairs) >= 0.4


def test_multimodal_resize_frames_features(spark, docs):
    from otel_logger_spark.functions.multimodal import (
        as_media, resize_media, sample_frames, extract_features,
    )

    media = as_media(docs.limit(60))
    resized = resize_media(media, 224, 224)
    assert dict(resized.dtypes)["data"] == "binary"
    r = resized.collect()
    assert all(len(bytes(x["data"])) == (224 * 224) // 64 for x in r)
    assert all(x["media_meta"]["resized"] == "224x224" for x in r)

    frames = sample_frames(media, every_n=16, max_frames=3)
    f = frames.collect()
    by_doc = {}
    for x in f:
        by_doc.setdefault(x["doc_id"], []).append(x)
    for doc_id, fs in by_doc.items():
        kinds = {x["kind"] for x in fs}
        if kinds == {"video"}:
            assert 1 <= len(fs) <= 3
            assert [x["frame_idx"] for x in sorted(fs, key=lambda y: y["frame_idx"])] == [
                i * 16 for i in range(len(fs))
            ]
        else:
            assert len(fs) == 1 and fs[0]["frame_idx"] == 0

    feats = extract_features(media, dim=16).collect()
    assert all(len(x["features"]) == 16 for x in feats)
    assert all(0.0 <= v <= 1.0 for x in feats for v in x["features"])
    # determinism
    again = {x["doc_id"]: x["features"] for x in extract_features(media, dim=16).collect()}
    assert again == {x["doc_id"]: x["features"] for x in feats}


def test_hot_bucket_cap_degenerate_corpus(spark):
    """10^4 near-identical docs land in one LSH bucket per band; the
    max_bucket guard must keep the candidate join from going quadratic
    (uncapped this would be ~8 * 50M joined rows)."""
    import time

    from otel_logger_spark.functions.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    n = 10_000
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(base).alias("text")
    )
    from otel_logger_spark.functions.dedup import (
        minhash_cap_report,
        simhash_cap_report,
    )

    sig = minhash_signatures(df, k=32, n=3)
    t0 = time.monotonic()
    capped = minhash_lsh_candidates(sig, max_bucket=100).count()
    dt = time.monotonic() - t0
    assert capped == 0  # the single mega-bucket is excluded, not enumerated
    assert dt < 120, f"capped candidate join took {dt:.0f}s"
    # the cap is never silent: the report accounts every excluded
    # bucket-membership row (8 bands x 10k identical docs)
    rep = minhash_cap_report(sig, max_bucket=100).collect()[0]
    assert rep["excluded_rows"] == 8 * n
    assert rep["capped_buckets"] == 8
    assert rep["max_bucket_size"] == n
    # identical simhash values -> one (chunk, val) mega-bucket, same guard
    assert simhash_near_pairs(df, max_bucket=100).count() == 0
    rep2 = simhash_cap_report(df, max_bucket=100).collect()[0]
    assert rep2["excluded_rows"] == 4 * n  # 4 chunks x 10k docs
    # and a cap that never fires reports zero exclusions
    rep3 = minhash_cap_report(sig, max_bucket=n + 1).collect()[0]
    assert rep3["excluded_rows"] == 0 and rep3["capped_buckets"] == 0


def test_hot_bucket_cap_preserves_real_pairs(spark):
    """A generous explicit cap (what the gates pass) must not drop pairs
    on a normal corpus: capped and uncapped (the public default) candidate
    sets agree."""
    df = _corpus(spark)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(df, threshold=0.5, max_bucket=10_000).collect()
    }
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(df, threshold=0.5, max_bucket=None).collect()
    }
    assert capped == uncapped and capped


def test_near_dup_lsh_equals_brute(spark):
    """The bucketed near-dup plan (the gate's plan) must reproduce the
    exact enumeration: false candidates are exactly filtered, and the
    seeded tables find every >=0.9 pair on the gate datasets."""
    from otel_logger_spark.functions.similarity import (
        near_dup_pairs_cosine,
        near_dup_pairs_lsh,
    )
    from otel_logger_spark.queries_training import _augmented_vectors

    for sf in ("0.001", "0.01", "0.1"):
        vecs = _augmented_vectors(spark, f"/root/testdata/sf{sf}")
        brute = {
            (r.id_a, r.id_b, r.sim_micro)
            for r in near_dup_pairs_cosine(vecs, 0.9, "vec_id", "v").collect()
        }
        lsh = {
            (r.id_a, r.id_b, r.sim_micro)
            for r in near_dup_pairs_lsh(
                vecs, 0.9, dim=64, id_col="vec_id", vec_col="v"
            ).collect()
        }
        assert brute == lsh and brute


def test_connected_components_shapes(spark):
    """Chain, triangle, singleton — label propagation must find min-id
    components and include every node."""
    import pytest

    from otel_logger_spark.functions.graph import (
        connected_components,
        dedup_clusters,
    )

    nodes = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    # chain 0-1-2-3, triangle 4-5-6 (+ redundant edge), 7/8/9 singletons
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7, 8: 8, 9: 9}
    fam = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup_clusters(nodes, edges).collect()
    }
    assert fam[3] == (0, 4) and fam[6] == (4, 3) and fam[9] == (9, 1)
    # transitivity: A~B, B~C with no A~C edge is still ONE family
    assert fam[0][0] == fam[2][0]
    # non-convergence within max_iter must raise, not return partial labels
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1)


def test_connected_components_string_ids(spark):
    """Corpus doc ids are often hashes/uuids (strings). The fixpoint check
    must be type-agnostic: a sum(label)-based probe silently casts strings
    to NULL and exits after ONE round with unconverged labels — this chain
    needs 3+ rounds, so it catches any numeric-only detection."""
    from otel_logger_spark.functions.graph import connected_components

    ids = [f"doc-{i:02d}" for i in range(8)]
    nodes = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    # one long chain (diameter 7 — multiple propagation rounds required)
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(7)], "doc_a string, doc_b string"
    )
    for algo in ("label_propagation", "two_phase"):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(nodes, edges, algorithm=algo).collect()
        }
        assert got == {i: "doc-00" for i in ids}, algo


def test_two_phase_cc_adversarial_chain(spark):
    """A 10^4-node chain (diameter 10^4) defeats label propagation within
    any sane round budget; the alternating large-star/small-star variant
    must converge in O(log^2 n) rounds (well under 40) with every node
    labeled by the chain min."""
    import pyspark.sql.functions as F

    from otel_logger_spark.functions.graph import connected_components

    n = 10_000
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = connected_components(
        nodes, edges, max_iter=40, algorithm="two_phase"
    )
    agg = out.agg(
        F.count("*").alias("n"),
        F.sum((F.col("cluster_id") == 0).cast("long")).alias("n_zero"),
    ).collect()[0]
    assert agg["n"] == n and agg["n_zero"] == n


def test_two_phase_matches_label_propagation_random(spark):
    """Both algorithms are exact — on a random graph their outputs must be
    row-identical (the adversarial-diameter variant is not an
    approximation)."""
    import random

    from otel_logger_spark.functions.graph import connected_components

    rng = random.Random(7)
    n = 400
    edges_py = {(a, b) for a, b in (
        sorted(rng.sample(range(n), 2)) for _ in range(300)
    )}
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        sorted(edges_py), "doc_a long, doc_b long"
    )
    lp = connected_components(nodes, edges, algorithm="label_propagation")
    tp = connected_components(nodes, edges, algorithm="two_phase")
    assert sorted(map(tuple, lp.collect())) == sorted(map(tuple, tp.collect()))


def test_stratified_sample_deterministic(spark):
    from otel_logger_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(2000)], "doc_id long, source string"
    )
    rates = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = stratified_sample(docs, rates, default_rate=0.25)
    b = stratified_sample(docs, rates, default_rate=0.25)
    rows_a = sorted((r["doc_id"], r["source"]) for r in a.collect())
    rows_b = sorted((r["doc_id"], r["source"]) for r in b.collect())
    assert rows_a == rows_b  # bit-identical across runs (no rand())
    per = {s: 0 for s in ("src0", "src1", "src2", "src3")}
    for _, s in rows_a:
        per[s] += 1
    assert per["src0"] == 500       # rate 1.0 keeps every row
    assert per["src2"] == 0         # rate 0.0 drops every row
    assert 150 < per["src1"] < 350  # ~0.5 of 500
    assert 50 < per["src3"] < 200   # default 0.25 of 500
    # subset property: kept src1 rows at 0.5 are a superset of those at 0.25
    half = {r["doc_id"] for r in stratified_sample(docs, {"src1": 0.5}).collect()}
    quarter = {r["doc_id"] for r in stratified_sample(docs, {"src1": 0.25}).collect()}
    assert quarter <= half


def test_weighted_sample_semantics(spark):
    """keep probability = min(1, rate * w/1000): weight 0 keeps nothing,
    saturated weights keep everything, keep-rate tracks the weight, and
    the keep set is the integer cross-multiplication's exactly."""
    from otel_logger_spark.functions.sampling import (
        sample_key_py,
        weighted_sample,
    )

    rows = [(i, [0, 250, 500, 1000, 5000][i % 5]) for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {
        r["doc_id"] for r in weighted_sample(df, "w", base_rate=0.8).collect()
    }
    exp = {
        i for i, w in rows if sample_key_py(i) * 1_000_000 < 800 * w * (1 << 32)
    }
    assert kept == exp
    by_w = {w: 0 for _, w in rows}
    for i in kept:
        by_w[rows[i][1]] += 1
    assert by_w[0] == 0                    # probability 0: nothing kept
    assert by_w[5000] == 1000              # saturated (>= 1): everything
    assert 100 < by_w[250] < 300           # ~0.2 of 1000
    assert 300 < by_w[500] < 500           # ~0.4 of 1000
    assert 700 < by_w[1000] < 900          # ~0.8 of 1000
    # rate-monotone subset property (same key, larger thresholds)
    kept_low = {
        r["doc_id"] for r in weighted_sample(df, "w", base_rate=0.4).collect()
    }
    assert kept_low <= kept


def test_sample_key_overflow_free_large_ids(spark):
    """The naive id*2654435761 overflows int64 for id > 3.47e9 — Spark
    would wrap negative and KEEP rows in rate-0 strata while the DuckDB
    oracle errors. The limb formulation must agree with the pure-Python
    reference (exact big-int arithmetic) across the whole id range,
    including 2^40-scale ids, and a rate-0.0 stratum must stay empty."""
    import duckdb
    import pyspark.sql.functions as F

    from otel_logger_spark.functions.sampling import (
        sample_key,
        sample_key_py,
        stratified_sample,
    )

    ids = [
        0, 1, 7, 3_474_701_543, 3_474_701_544, 2**32 - 1, 2**32,
        2**40 + 12_345, 2**50 + 999, 2**62 + 3, 2**63 - 1,
    ]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["k"]
        for r in df.select("doc_id", sample_key(F.col("doc_id")).alias("k")).collect()
    }
    for i in ids:
        expect = sample_key_py(i)
        assert got[i] == expect, (i, got[i], expect)
        assert 0 <= got[i] < 2**32
        # the DuckDB-oracle spelling computes the identical key (no overflow)
        (dk,) = duckdb.execute(
            """SELECT (((f % 65536) * 2654435761) % 4294967296
                     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296
               FROM (SELECT xor(? % 4294967296, ? // 4294967296) AS f)""",
            [i, i],
        ).fetchone()
        assert dk == expect, i
    # rate-0.0 stratum: every row dropped even at overflow-prone ids
    big = spark.createDataFrame(
        [(i, "banned") for i in ids], "doc_id long, source string"
    )
    assert stratified_sample(big, {"banned": 0.0}).count() == 0
    # and deterministic keep at rate 1.0 (threshold 2^32 > every key)
    assert stratified_sample(big, {"banned": 1.0}).count() == len(ids)


def test_signature_array_forms_match_explode_groupby(spark, docs):
    """The round-3 shuffle-free signature formulations (array_min/aggregate
    projections) must be BIT-IDENTICAL to the explode+groupBy originals —
    the LSH banding downstream hashes the signature values, so any
    divergence silently changes candidate sets."""
    from otel_logger_spark.functions.dedup import (
        exploded_shingles,
        minhash_signatures,
        simhash_signatures,
        with_words,
    )

    corpus = docs.select("doc_id", "text")
    # reference: the round-2 explode+groupBy minhash
    sh = exploded_shingles(corpus, 3)
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(32)
    ]
    ref_mh = {
        r["doc_id"]: [r[f"h{i}"] for i in range(32)]
        for r in sh.groupBy("doc_id").agg(*aggs).collect()
    }
    got_mh = {
        r["doc_id"]: list(r["sig"]) for r in minhash_signatures(corpus).collect()
    }
    assert got_mh == ref_mh and got_mh
    # reference: the round-2 explode+groupBy simhash
    tok = with_words(corpus).select("doc_id", F.explode("words").alias("tok"))
    h = F.xxhash64("tok")
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    ref_rows = tok.groupBy("doc_id").agg(*bit_sums).collect()
    ref_sh = {}
    for r in ref_rows:
        v = 0
        for i in range(64):
            if r[f"b{i}"] > 0:
                v |= 1 << i
        ref_sh[r["doc_id"]] = v - (1 << 64) if v >= 1 << 63 else v
    got_sh = {
        r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus).collect()
    }
    assert got_sh == ref_sh and got_sh


def test_minhash_equals_exact_on_gate_corpora(spark):
    """The minhash_pairs oracle (exact n-gram Jaccard enumeration) is only
    valid because the seed-fixed LSH banding recovers EVERY >=0.5 pair on
    the gate corpora — a deterministic fact of corpus + hash family, not a
    flaky sample. Pin it at all three scale factors (the near_dup pattern
    the embedding gate already uses)."""
    from otel_logger_spark.graftdata import load_corpus

    for sf in ("0.001", "0.01", "0.1"):
        corpus = load_corpus(spark, f"/root/testdata/sf{sf}")
        exact = {
            (r["doc_a"], r["doc_b"], r["j_milli"])
            for r in ngram_jaccard_pairs(corpus, threshold=0.5)
            .select("doc_a", "doc_b", "j_milli")
            .collect()
        }
        mh = {
            (r["doc_a"], r["doc_b"], r["j_milli"])
            for r in minhash_dedup_pairs(
                corpus, threshold=0.5, max_bucket=10_000
            ).collect()
        }
        assert mh == exact and exact, f"sf{sf}: {len(exact)} vs {len(mh)}"


def test_duckdb_xxh64_matches_spark(spark):
    """The generated DuckDB XXH64 (oracles_xxh64.py) must agree with
    Spark's xxhash64 BIT-FOR-BIT on adversarial inputs: empty string,
    multi-byte UTF-8, and every length branch of the spec (sub-4, sub-8,
    8..31, >=32 with stripe tails)."""
    import random

    import duckdb

    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    random.seed(7)
    toks = [
        "", "a", "abc", "hello,", "é", "ünïcødé", "x" * 7, "y" * 8,
        "z" * 12, "q" * 31, "w" * 32, "v" * 33, "m" * 40, "longtoken" * 9,
    ]
    toks += [
        "".join(random.choice("abcdefgéhij ") for _ in range(random.randint(0, 70)))
        for _ in range(60)
    ]
    toks = list(dict.fromkeys(toks))
    want = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in toks], "s string")
        .selectExpr("s", "xxhash64(s) AS h")
        .collect()
    }
    con = duckdb.connect()
    con.sql("CREATE TABLE vocab AS SELECT unnest(?::VARCHAR[]) AS tok", params=[toks])
    sql = (
        "WITH "
        + xxh64_ctes().lstrip().lstrip(",").strip()
        + "\nSELECT tok, CAST(CASE WHEN h64 >= 9223372036854775808::UHUGEINT"
        "  THEN h64::HUGEINT - 18446744073709551616::HUGEINT"
        "  ELSE h64::HUGEINT END AS BIGINT) AS h FROM hashes"
    )
    got = {t: int(h) for t, h in con.sql(sql).fetchall()}
    assert got == want


def test_simhash_oracle_equals_spark(spark):
    """End-to-end: the SQL simhash oracle (XXH64 + TF bit sums + all-pairs
    hamming) reproduces the Spark gate output exactly."""
    import duckdb

    from otel_logger_spark.graftdata import corpus_cte
    from otel_logger_spark.oracles_xxh64 import simhash_pairs_oracle
    from otel_logger_spark.queries_training import q_simhash_pairs

    for sf in ("0.001", "0.01"):
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in q_simhash_pairs(spark, f"/root/testdata/sf{sf}").collect()
        }
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf{sf}/documents.parquet'"
        )
        want = {
            (int(a), int(b), int(h))
            for a, b, h in con.sql(simhash_pairs_oracle(corpus_cte())).fetchall()
        }
        assert got == want and got


def test_log_template_masking_goldens_and_duckdb_parity(spark):
    """Masking rules against handcrafted lines, plus cross-engine dialect
    parity: the same patterns must behave identically under Java regex
    (Spark) and RE2 (DuckDB) on adversarial inputs — that equivalence is
    what makes the gate oracle valid."""
    import duckdb

    from otel_logger_spark.functions.templates import (
        TEMPLATE_RULES,
        with_template,
    )

    cases = {
        "GET /api/v2/items/12345 took 87ms": "GET /api/v<n>/items/<n> took <n>ms",
        "conn from 10.0.12.3:8080 dropped": "conn from <ip> dropped",
        "trace 6f1e4b2a-9c0d-4e8f-a12b-3c4d5e6f7a8b spans 7":
            "trace <uuid> spans <n>",
        "ptr 0xDEADbeef at offset 42": "ptr <hex> at offset <n>",
        "no variables here": "no variables here",
        "999.999.999.999 still shaped like an ip": "<ip> still shaped like an ip",
        "1.2.3.4.5 five octets": "<ip>.<n> five octets",
        "0x without digits stays": "<n>x without digits stays",
    }
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    got = {r["text"]: r["template"] for r in with_template(df).collect()}
    assert got == cases
    # DuckDB replays the identical chain on the identical inputs
    con = duckdb.connect()
    for raw, expected in cases.items():
        expr = "t"
        for pat, repl in TEMPLATE_RULES:
            expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
        (dv,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [raw]).fetchone()
        assert dv == expected, raw


def test_weighted_sample_overflow_guard(spark):
    """Round-5 guard (ADVICE r04): a weight whose RHS would exceed int64
    (wrapping negative in non-ANSI Spark and silently dropping the whole
    stratum) is clamped saturation-exactly — such a weight implies keep
    probability >> 1, so everything must be KEPT; and an insane base_rate
    that would make the clamp lossy raises."""
    import pytest as _pytest

    from otel_logger_spark.functions.sampling import weighted_sample

    big_w = 10**13  # RHS = 800 * 1e13 * 2^32 >> 2^63: wrapped before
    df = spark.createDataFrame(
        [(i, big_w) for i in range(100)], "doc_id long, w long"
    )
    kept = weighted_sample(df, "w", base_rate=0.8).count()
    assert kept == 100  # probability saturates at 1: every row kept
    with _pytest.raises(ValueError, match="base_rate"):
        weighted_sample(df, "w", base_rate=3e6)
    with _pytest.raises(ValueError, match="base_rate"):
        weighted_sample(df, "w", base_rate=-0.1)


def test_query_module_import_is_side_effect_free():
    """Round 6 (advisor): the IVF oracle (DuckDB scan + numpy Lloyd) must
    NOT run at queries_training import — and with duckdb unimportable the
    module still imports and oracle_sql() degrades that one query to the
    rows-only check instead of crashing every bench/plan-audit import."""
    import subprocess
    import sys

    code = (
        "import sys; sys.modules['duckdb'] = None;"
        "import otel_logger_spark.queries_training as qt;"
        "assert 'ann_ivf_topk' not in qt.ORACLES_C;"
        "import __spark_entry__ as e; o = e.oracle_sql();"
        "assert 'ann_ivf_topk' not in o and 'pack_shards' in o"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr


def test_fixed_k_sample_exact_size_stability_and_subset(spark):
    """fixed_k_sample: exactly min(k, stratum size) per stratum; the
    chosen set is a hash-rank PREFIX, so growing k only ADDS rows and
    re-running selects identical rows; k >= stratum size keeps all."""
    from otel_logger_spark.functions.sampling import fixed_k_sample
    import pytest as _pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(60)] + [(1000, "tiny")],
        "doc_id long, source string",
    )
    k5 = fixed_k_sample(docs, 5)
    sizes = {r["source"]: r["n"] for r in
             k5.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"src0": 5, "src1": 5, "src2": 5, "tiny": 1}
    ids5 = {r["doc_id"] for r in k5.collect()}
    assert ids5 == {r["doc_id"] for r in fixed_k_sample(docs, 5).collect()}
    ids9 = {r["doc_id"] for r in fixed_k_sample(docs, 9).collect()}
    assert ids5 < ids9                       # prefix property
    assert fixed_k_sample(docs, 100).count() == 61
    with _pytest.raises(ValueError, match="k must"):
        fixed_k_sample(docs, 0)
