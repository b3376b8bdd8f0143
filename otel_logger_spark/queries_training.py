"""Training-data operator gates: dedup, similarity, text analysis,
redaction, multimodal — queries() entries with DuckDB oracles THROUGHOUT
(since round 5 nothing is rows-only). Everything engine-specific has a
real oracle: XXH64 re-implemented in SQL (oracles_xxh64.py) for
simhash/minhash, literal-embedded hyperplanes with bit-exact unrolled
float arithmetic for the LSH ANN (oracles_lsh.py), independent-sample +
centroid-literal re-derivation for the IVF ANN (oracles_ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_logger_spark.functions.dedup import (
    drop_exact_dups,
    exact_dedup_stats,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from otel_logger_spark.functions.multimodal import as_media, decode_media
from otel_logger_spark.functions.similarity import (
    cosine_topk,
    lsh_ann_topk,
    near_dup_pairs_lsh,
)
from otel_logger_spark.functions.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    with_fingerprint,
    with_lang_guess,
    with_quality,
)
from otel_logger_spark.graftdata import corpus_cte, load_corpus

# --- dedup -------------------------------------------------------------------


def _corpus_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus doc_ids WITHOUT the loader's fan-out repartition (round 9):
    the id list only feeds connected_components' final singleton
    re-attach join — no heavy projection ever runs on it, so the fan-out
    exchange is pure overhead on this leg. Same rows as
    load_corpus(...).select('doc_id')."""
    from otel_logger_spark.graftdata import corpus_sql

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(corpus_sql()).select("doc_id")


def q_dedup_exact_stats(spark, sf_dir):
    return exact_dedup_stats(load_corpus(spark, sf_dir))


O_DEDUP_EXACT_STATS = (
    corpus_cte()
    + """
 , g AS (SELECT text, COUNT(*) AS n_docs FROM corpus GROUP BY 1)
 SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total, COUNT(*) AS n_unique,
   CAST(SUM(CASE WHEN n_docs > 1 THEN n_docs ELSE 0 END) AS BIGINT) AS n_dup_docs,
   CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
 FROM g"""
)


def q_dedup_drop_exact(spark, sf_dir):
    kept = drop_exact_dups(load_corpus(spark, sf_dir))
    return kept.agg(
        F.count("*").alias("n_kept"), F.sum("doc_id").alias("sum_ids")
    )


O_DEDUP_DROP_EXACT = (
    corpus_cte()
    + """
 SELECT COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
 FROM (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY text)"""
)


def q_ngram_jaccard(spark, sf_dir):
    return ngram_jaccard_pairs(load_corpus(spark, sf_dir), n=3, threshold=0.5)


# shared CTE chain: corpus -> word 3-gram shingles -> common-shingle counts
_NGRAM_CHAIN = """
 , w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
 sh AS (SELECT DISTINCT doc_id, array_to_string(words[i : i+2], ' ') AS shingle
        FROM w, UNNEST(generate_series(1, greatest(len(words)-2, 0))) AS u(i)),
 sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
 common AS (
   SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
   FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)"""

O_NGRAM_JACCARD = (
    corpus_cte()
    + _NGRAM_CHAIN
    + """
 SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
   CAST(FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS j_milli
 FROM common
 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
 WHERE FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 500"""
)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup FAMILIES: connected components over the exact n-gram
    Jaccard pairs (transitive closure — A~B, B~C => one family of three,
    which no pairwise output expresses). Spark side: iterative min-label
    propagation (functions/graph.py); oracle side: a DuckDB RECURSIVE CTE
    computing min reachable doc_id — two utterly different fixpoint
    computations that must agree row-for-row."""
    from otel_logger_spark.functions.graph import dedup_clusters

    corpus = load_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.5)
    return dedup_clusters(
        corpus.select("doc_id"), pairs.select("doc_a", "doc_b")
    )


O_DEDUP_CLUSTERS = (
    corpus_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    + _NGRAM_CHAIN
    + """
 , pairs AS (
   SELECT doc_a, doc_b FROM common
   JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
   WHERE FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 500),
 edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
 reach(node, label) AS (
   SELECT doc_id, doc_id FROM corpus
   UNION
   SELECT e.v, r.label FROM reach r JOIN edges e ON r.node = e.u),
 lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1)
 SELECT doc_id, cluster_id,
   CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
 FROM lab"""
)


def q_dedup_clusters_two_phase(spark, sf_dir):
    """The adversarial-diameter variant (alternating large-star/small-star,
    Kiveris et al. 2014) behind the SAME gate as label propagation: three
    independent fixpoint computations — Spark min-label propagation, Spark
    two-phase star contraction, and the DuckDB RECURSIVE CTE — must agree
    row-for-row on the same pair input."""
    from otel_logger_spark.functions.graph import dedup_clusters

    corpus = load_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.5)
    return dedup_clusters(
        corpus.select("doc_id"),
        pairs.select("doc_a", "doc_b"),
        algorithm="two_phase",
    )


def q_dedup_canonical(spark, sf_dir):
    """End-to-end dedup KEEP-LIST: pairs -> connected components ->
    quality-aware canonical pick (functions/graph.canonical_keep: max
    quality_milli per family, ties to min doc_id) -> per-source keep
    accounting. Composes three independently-oracled operators; the
    oracle recomputes the whole chain (recursive-CTE closure + the
    integer quality formula + the same argmax tie order)."""
    from otel_logger_spark.functions.graph import canonical_keep, dedup_clusters
    from otel_logger_spark.functions.text import with_quality

    corpus = load_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.5)
    clusters = dedup_clusters(
        _corpus_ids(spark, sf_dir), pairs.select("doc_a", "doc_b")
    )
    narrow = with_quality(corpus).select("doc_id", "source", "quality_milli")
    kept = canonical_keep(narrow, clusters)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_kept"),
        F.sum(
            F.when(F.col("is_canonical"), F.col("doc_id")).otherwise(0)
        ).alias("sum_kept_ids"),
    )


O_DEDUP_CANONICAL = (
    corpus_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    + _NGRAM_CHAIN
    + """
 , pairs AS (
   SELECT doc_a, doc_b FROM common
   JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
   WHERE FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 500),
 edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
 reach(node, label) AS (
   SELECT doc_id, doc_id FROM corpus
   UNION
   SELECT e.v, r.label FROM reach r JOIN edges e ON r.node = e.u),
 lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1),
 d AS (
   SELECT doc_id, source, length(text) AS n_chars,
     len(string_split(text, ' ')) AS n_tokens,
     length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
     (SELECT {MARKERS} FROM (SELECT ' ' || text || ' ' AS p)) AS n_stopwords
   FROM corpus),
 q AS (SELECT doc_id, source,
   (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 400 ELSE 0 END
    + least(CAST(FLOOR(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT), 300)
    + CAST(FLOOR(FLOOR(1000 * n_alpha / greatest(n_chars, 1)) * 300 / 1000) AS BIGINT)
   ) AS quality_milli FROM d),
 ranked AS (
   SELECT q.source, q.doc_id,
     row_number() OVER (PARTITION BY l.cluster_id
                        ORDER BY q.quality_milli DESC, q.doc_id ASC) AS rn
   FROM lab l JOIN q ON q.doc_id = l.doc_id)
 SELECT source, COUNT(*) AS n_docs,
   CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
   CAST(SUM(CASE WHEN rn = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS sum_kept_ids
 FROM ranked GROUP BY 1"""
)


def q_normalized_dedup(spark, sf_dir):
    """Normalization-aware dedup accounting (functions/normalize.py):
    per-source raw-vs-normalized distinct counts over a corpus with
    deterministically injected case/punctuation/whitespace variants —
    the gap is exactly the variants normalization collapses."""
    from otel_logger_spark.functions.normalize import normalized_dedup_stats

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cased = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("!!")).alias("text"),
        "lang", "source", "n_chars",
    )
    spaced = base.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.replace(F.col("text"), F.lit(" "), F.lit("  ")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = base.unionByName(cased).unionByName(spaced)
    return normalized_dedup_stats(corpus, group_col="source")


def _o_normalized_dedup() -> str:
    from otel_logger_spark.functions.normalize import normalize_sql

    return f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, upper(text) || '!!' FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT source, replace(text, ' ', '  ') FROM documents WHERE doc_id % 9 = 0)
SELECT source, COUNT(*) AS n_docs,
  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_raw_distinct,
  CAST(COUNT(DISTINCT {normalize_sql('text')}) AS BIGINT) AS n_norm_distinct
FROM corpus GROUP BY 1"""


def q_fixed_k_sample(spark, sf_dir):
    """Exactly-k-per-source deterministic sample (functions/sampling.
    fixed_k_sample): rank by (Knuth key, id) per stratum, keep rank <= 7;
    the oracle replays the key and the rank order bit-for-bit."""
    from otel_logger_spark.functions.sampling import fixed_k_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = fixed_k_sample(docs, k=7)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
    )


O_FIXED_K_SAMPLE = """
WITH folded AS (
  SELECT source, doc_id,
    xor(doc_id % 4294967296, doc_id // 4294967296) AS f
  FROM documents),
keyed AS (
  SELECT source, doc_id,
    (((f % 65536) * 2654435761) % 4294967296
     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296 AS k
  FROM folded),
ranked AS (
  SELECT source, doc_id,
    row_number() OVER (PARTITION BY source ORDER BY k ASC, doc_id ASC) AS rk
  FROM keyed)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM ranked WHERE rk <= 7 GROUP BY 1
"""


def q_quantized_ann(spark, sf_dir):
    """Int8-quantized L2 top-5 (functions/quantize.py): per-dimension
    global ranges measured on the corpus, bit-reproducible uint8 codes,
    integer-exact distances. The oracle re-derives ranges, codes and
    ranking from the same parquet."""
    from otel_logger_spark.functions.quantize import (
        measure_ranges,
        quantized_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ranges = measure_ranges(emb)
    queries = emb.filter(F.col("vec_id") < 20)
    return quantized_topk(emb, queries, ranges, k=5)


def _o_quantized_ann() -> str:
    from otel_logger_spark.functions.quantize import quantized_topk_sql

    return quantized_topk_sql("embeddings", "vec_id < 20", dim=64, k=5)


_MIX_TARGETS = {"src0": 400, "src1": 300, "src2": 200, "src3": 100}


def q_token_mix(spark, sf_dir):
    """Token-budget mix allocation (functions/mixer.py): measure
    per-source token totals, derive the feasible budget and integer
    rates for a 40/30/20/10 target mix, apply the deterministic Knuth
    keep, and report exact accounting — the oracle replays the whole
    derivation chain and the keep thresholds bit-for-bit."""
    from otel_logger_spark.functions.mixer import token_mix_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return token_mix_report(docs, _MIX_TARGETS)


def _o_token_mix() -> str:
    from otel_logger_spark.functions.mixer import token_mix_report_sql

    return token_mix_report_sql("documents", _MIX_TARGETS)


def q_training_mix(spark, sf_dir):
    """Deterministic stratified training-mix sample (functions/sampling.py):
    per-source Bernoulli keep via the engine-portable Knuth multiplicative
    hash — NO rand(), so retried tasks / resumed runs / the DuckDB oracle
    all select the exact same rows."""
    from otel_logger_spark.functions.sampling import stratified_sample

    # plain read, NOT _load_documents: the sampling predicate is a pure
    # codegen filter that belongs at the scan — a fan-out repartition
    # would move every row to drop most of them
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(
        docs,
        rates={"src0": 0.9, "src1": 0.5, "src2": 0.25, "src3": 0.0},
        default_rate=0.1,
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
    )


# Mirrors sampling.sample_key exactly: 32-bit pre-fold then 16-bit-limb
# modular multiply (overflow-free in BIGINT — the naive doc_id*2654435761
# overflows for doc_id > 3.47e9), and FLOOR on every threshold so both
# engines truncate identically (CAST alone ROUNDS in DuckDB: 0.1*2^32
# would become ...730 vs the engine's floor ...729).
O_TRAINING_MIX = """
WITH folded AS (
  SELECT source, doc_id,
    xor(doc_id % 4294967296, doc_id // 4294967296) AS f
  FROM documents),
keyed AS (
  SELECT source, doc_id,
    (((f % 65536) * 2654435761) % 4294967296
     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296 AS k,
    CASE source WHEN 'src0' THEN CAST(FLOOR(0.9 * 4294967296) AS BIGINT)
                WHEN 'src1' THEN CAST(FLOOR(0.5 * 4294967296) AS BIGINT)
                WHEN 'src2' THEN CAST(FLOOR(0.25 * 4294967296) AS BIGINT)
                WHEN 'src3' THEN 0
                ELSE CAST(FLOOR(0.1 * 4294967296) AS BIGINT) END AS thr
  FROM folded)
SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM keyed WHERE k < thr GROUP BY 1
"""


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling: keep each document with
    probability 0.6 * quality_milli/1000 — the corpus-mixing primitive
    that upweights high-quality text. Division-free integer comparison
    (functions/sampling.weighted_sample), so the oracle re-derives the
    exact keep set: quality score and sample key both recomputed in SQL."""
    from otel_logger_spark.functions.sampling import weighted_sample

    docs = with_quality(_load_documents(spark, sf_dir))
    kept = weighted_sample(docs, "quality_milli", base_rate=0.6)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("sum_ids"),
        F.sum("quality_milli").alias("sum_quality_milli"),
    )


def _o_weighted_sample() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source, length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    (SELECT {_ALL_MARKERS_SQL} FROM (SELECT ' ' || text || ' ' AS p)) AS n_stopwords
  FROM documents),
q AS (SELECT doc_id, source,
  (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 400 ELSE 0 END
   + least(CAST(FLOOR(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT), 300)
   + CAST(FLOOR(FLOOR(1000 * n_alpha / greatest(n_chars, 1)) * 300 / 1000) AS BIGINT)
  ) AS quality_milli FROM d),
keyed AS (
  SELECT source, doc_id, quality_milli,
    (((f % 65536) * 2654435761) % 4294967296
     + (((f // 65536) * 2654435761) % 65536) * 65536) % 4294967296 AS k
  FROM (SELECT *, xor(doc_id % 4294967296, doc_id // 4294967296) AS f FROM q))
SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
  CAST(SUM(quality_milli) AS BIGINT) AS sum_quality_milli
FROM keyed WHERE k * 1000000 < 600 * quality_milli * 4294967296 GROUP BY 1
"""


def q_minhash_pairs(spark, sf_dir):
    """LSH-accelerated near-dup, now ORACLE-CHECKED against the exact
    n-gram Jaccard enumeration (the embedding_near_dup pattern): the
    verify step computes EXACT Jaccard on candidates, and the seed-fixed
    banding recovers every >=0.5 pair on the gate corpora — deterministic,
    asserted at sf0.001/0.01/0.1 by
    tests/test_training_ops.py::test_minhash_equals_exact_on_gate_corpora.
    The gate passes the hot-bucket cap EXPLICITLY — the 100 TB shape; the
    cap is opt-in on the public function and no gate-corpus bucket
    approaches it (cap accounting: minhash_cap_report)."""
    return minhash_dedup_pairs(
        load_corpus(spark, sf_dir), threshold=0.5, max_bucket=10_000
    )


O_MINHASH_PAIRS = (
    corpus_cte()
    + _NGRAM_CHAIN
    + """
 SELECT doc_a, doc_b,
   CAST(FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT) AS j_milli
 FROM common
 JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
 WHERE FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 500"""
)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup, now ORACLE-CHECKED: DuckDB has no xxhash64, so the
    oracle GENERATES one — a bit-exact XXH64 re-implementation in pure SQL
    (UHUGEINT modular arithmetic + per-lane list_reduce folds,
    oracles_xxh64.py), then TF-weighted bit sums, the 64-bit signature,
    and an all-pairs hamming filter (equivalent to the chunk-banded plan:
    pigeonhole candidates are lossless at max_hamming<=3).
    Explicit hot-bucket cap: see q_minhash_pairs."""
    return simhash_near_pairs(
        load_corpus(spark, sf_dir), max_hamming=3, max_bucket=10_000
    )


def _o_simhash_pairs() -> str:
    from otel_logger_spark.oracles_xxh64 import simhash_pairs_oracle

    return simhash_pairs_oracle(corpus_cte(), max_hamming=3)


# --- similarity ----------------------------------------------------------------


def _load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every consumer runs heavy per-row work (cosine/hyperplane folds
    over the whole corpus), so narrow gate inputs fan out here — a real
    table's natural splits skip the branch (graftdata.fan_out_if_narrow)."""
    from otel_logger_spark.graftdata import fan_out_if_narrow

    spark.read.parquet(f"{sf_dir}/embeddings.parquet").createOrReplaceTempView(
        "embeddings"
    )
    return fan_out_if_narrow(spark.table("embeddings"))


def q_embedding_topk(spark, sf_dir):
    emb = _load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(emb, queries, k=5)


O_EMBEDDING_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
s AS (SELECT query_id, neighbor_id,
        CAST(FLOOR(1000000 * list_cosine_similarity(cv, qv)) AS BIGINT) AS sim_micro
      FROM c, q WHERE neighbor_id != query_id)
SELECT query_id, neighbor_id, sim_micro, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_micro DESC, neighbor_id) AS rank
  FROM s) WHERE rank <= 5
"""


def _augmented_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus (as double vectors) + perturbed near-dup copies, constructed
    identically in the oracle."""
    emb = _load_embeddings(spark, sf_dir)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", as_double.alias("v"))
    pert = base.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.concat(
            F.array(F.col("v")[0] + F.lit(0.5)), F.slice("v", 2, 1000)
        ).alias("v"),
    )
    return base.unionByName(pert)


def q_embedding_near_dup(spark, sf_dir):
    """Near-dup pairs via the BUCKETED plan (multi-table LSH candidates +
    exact-cosine verify) — the 100 TB shape; the exact oracle still
    hash-matches because false candidates are exactly filtered and the
    seeded tables find every >=0.9 pair on these datasets (LSH-vs-brute
    equality verified at sf0.001, sf0.01 AND sf0.1 by
    tests/test_training_ops.py::test_near_dup_lsh_equals_brute).
    Explicit hot-bucket cap: see q_minhash_pairs."""
    vecs = _augmented_vectors(spark, sf_dir)
    return near_dup_pairs_lsh(
        vecs, threshold=0.9, dim=64, id_col="vec_id", vec_col="v",
        max_bucket=10_000,
    )


O_EMBEDDING_NEAR_DUP = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + 10000 AS vec_id, list_prepend(v[1] + 0.5, v[2:]) AS v
  FROM base WHERE vec_id % 25 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  CAST(FLOOR(1000000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS sim_micro
FROM aug a, aug b
WHERE a.vec_id < b.vec_id
  AND FLOOR(1000000 * list_cosine_similarity(a.v, b.v)) >= 900000
"""


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN, now ORACLE-CHECKED: the hyperplanes are
    deterministic seeded doubles, so the oracle embeds them as literals and
    re-derives bucketing + exact-cosine rank in DuckDB with the identical
    IEEE double operation sequence (unrolled left-associated sums — see
    oracles_lsh.py), bit-exact with no tolerance. pytest additionally
    measures recall vs the exact top-k."""
    emb = _load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return lsh_ann_topk(emb, queries, k=5, n_planes=6, n_tables=8, dim=64)


def _o_ann_lsh_topk() -> str:
    from otel_logger_spark.oracles_lsh import lsh_ann_topk_oracle

    return lsh_ann_topk_oracle(n_planes=6, n_tables=8, dim=64, k=5, seed=42)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF coarse-quantizer ANN, now ORACLE-CHECKED: training is fully
    deterministic (hash-threshold sample + seeded numpy Lloyd), so the
    oracle re-derives the sample independently (DuckDB + pure-Python
    XXH64), runs the shared Lloyd, and embeds the centroids as SQL
    literals — assignment, probing, exact cosine and top-k re-derived in
    DuckDB with the identical IEEE double op sequence (oracles_ivf.py).
    pytest additionally measures recall vs the exact top-k."""
    from otel_logger_spark.functions.ivf import ivf_topk

    emb = _load_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf_topk(emb, queries, k=5, n_clusters=16, n_probe=4)


def _o_ann_ivf_topk() -> str | None:
    """Centroids depend on the corpus, so the generator reads the gate's
    own input (the driver compares at sf0.01; SPARK_GRAFT_ORACLE_SF_DIR
    overrides for local checks at another SF). Returns None — rows-only
    fallback — if the table is absent."""
    import os

    from otel_logger_spark.oracles_ivf import ivf_topk_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None
    return ivf_topk_oracle(path, k=5, n_clusters=16, n_probe=4, dim=64, seed=42)


def q_ann_ivf_quantized(spark, sf_dir):
    """The COMPOSED 100 TB ANN path (round-6 verdict item 4): IVF coarse
    probe prunes candidates to the n_probe nearest inverted lists, then
    int8 quantized-L2 re-ranks them — no brute-force NLJ over the
    corpus, and the re-rank moves 1-byte codes instead of float32. The
    oracle re-derives the whole chain: independent training-sample +
    shared Lloyd centroids as literals (oracles_ivf.py discipline), the
    same assignment/probe cuts, the same per-dimension ranges and code
    arithmetic (quantize.py discipline), the same BIGINT distance
    fold."""
    from concurrent.futures import ThreadPoolExecutor

    from otel_logger_spark.functions.ivf import (
        ivf_quantized_topk,
        train_centroids,
    )
    from otel_logger_spark.functions.quantize import measure_ranges

    emb = _load_embeddings(spark, sf_dir)
    # round 9: the two index-build driver round trips (per-dim ranges,
    # Lloyd training sample) are independent jobs — overlap them so the
    # second back-fills the first's straggler tail (guide §2.6 pattern);
    # both values, and everything downstream, are unchanged.
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_ranges = pool.submit(measure_ranges, emb)
        f_cents = pool.submit(train_centroids, emb, 16)
        ranges, centroids = f_ranges.result(), f_cents.result()
    queries = emb.filter(F.col("vec_id") < 20)
    return ivf_quantized_topk(
        emb, queries, ranges, k=5, n_clusters=16, n_probe=4,
        centroids=centroids,
    )


def _o_ann_ivf_quantized() -> str | None:
    """Same data-dependence as _o_ann_ivf_topk (centroids + ranges come
    from the gate's own input)."""
    import os

    from otel_logger_spark.oracles_ivf import ivf_quantized_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None
    return ivf_quantized_oracle(
        path, k=5, n_clusters=16, n_probe=4, dim=64, seed=42
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (functions/semdedup.py): IVF
    clusters bucket the corpus, lower-id-wins drops within each cluster
    at cosine >= 0.93, per-cluster accounting. The oracle re-derives
    centroids, assignment, the cosine rendering and the drop rule
    end-to-end (oracles_ivf.semantic_dedup_oracle)."""
    from otel_logger_spark.functions.semdedup import semantic_dedup_report

    emb = _load_embeddings(spark, sf_dir)
    return semantic_dedup_report(
        emb, n_clusters=16, threshold_micro=930_000
    )


def _o_semantic_dedup() -> str | None:
    """Same data-dependence as the other IVF-family oracles."""
    import os

    from otel_logger_spark.oracles_ivf import semantic_dedup_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None
    return semantic_dedup_oracle(
        path, n_clusters=16, threshold_micro=930_000, dim=64, seed=42
    )


def q_corpus_cartography(spark, sf_dir):
    """Per-cluster source-composition audit (functions/cartography.py):
    IVF clusters partition the embedding space; per cluster report the
    source mix — dominant source under (count DESC, source ASC), exact
    milli-share, floor-divided-share Herfindahl concentration. The
    oracle re-derives centroids, assignment and the integer share
    arithmetic end-to-end (oracles_ivf.cartography_oracle)."""
    from otel_logger_spark.functions.cartography import cluster_source_map

    emb = _load_embeddings(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    return cluster_source_map(emb, docs, n_clusters=16)


def _o_corpus_cartography() -> str | None:
    """Same data-dependence as the other IVF-family oracles."""
    import os

    from otel_logger_spark.oracles_ivf import cartography_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    if not os.path.exists(path):
        return None
    return cartography_oracle(path, n_clusters=16, seed=42)


_SPLIT_RATIOS = [("train", 800), ("val", 100), ("test", 100)]


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val/test split (functions/split.py): the unit
    of assignment is the near-dup CLUSTER (transitive closure over exact
    n-gram Jaccard pairs), so no near-duplicate pair can straddle a
    split. Key, interval thresholds and assignment are pure integer
    arithmetic re-derived bit-for-bit by the oracle (recursive-CTE
    closure + the identical Knuth-key CASE chain)."""
    from otel_logger_spark.functions.graph import dedup_clusters
    from otel_logger_spark.functions.split import split_report

    corpus = load_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, n=3, threshold=0.5)
    clusters = dedup_clusters(
        _corpus_ids(spark, sf_dir), pairs.select("doc_a", "doc_b")
    )
    return split_report(clusters, _SPLIT_RATIOS)


def _o_leakage_split() -> str:
    from otel_logger_spark.functions.split import split_case_sql

    case = split_case_sql("cluster_id", _SPLIT_RATIOS)
    return (
        corpus_cte().replace("WITH ", "WITH RECURSIVE ", 1)
        + _NGRAM_CHAIN
        + f"""
 , pairs AS (
   SELECT doc_a, doc_b FROM common
   JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
   WHERE FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) >= 500),
 edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
           UNION SELECT doc_b, doc_a FROM pairs),
 reach(node, label) AS (
   SELECT doc_id, doc_id FROM corpus
   UNION
   SELECT e.v, r.label FROM reach r JOIN edges e ON r.node = e.u),
 lab AS (SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1)
 SELECT {case} AS split, COUNT(*) AS n_docs,
        COUNT(DISTINCT cluster_id) AS n_units,
        CAST(SUM(doc_id) AS BIGINT) AS sum_ids
 FROM lab GROUP BY 1"""
    )


def q_dsir_select(spark, sf_dir):
    """DSIR importance-resampling selection (functions/dsir.py): hashed
    unigram+bigram buckets, integer log-ratio lambdas from the corpus's
    own target (lang='en') vs source distributions, exact integer
    scores, deterministic top-100. The oracle re-derives tokenization,
    XXH64 bucketing, both count vectors, scoring and ranking in DuckDB
    (oracles_dsir.py); only the lambda formula is shared."""
    from otel_logger_spark.functions.dsir import dsir_select_within

    # round 9: the gate's target IS the corpus's lang='en' slice, so the
    # one-traversal subset path computes both count vectors in a single
    # aggregate — bit-identical lambdas/scores (dsir.bucket_counts_within)
    corpus = load_corpus(spark, sf_dir)
    return dsir_select_within(corpus, F.col("lang") == "en", k=100).select(
        "doc_id", "dsir_score", "lang"
    )


def _o_dsir_select() -> str | None:
    """Count vectors depend on the corpus, so the generator reads the
    gate's own input (the _o_ann_ivf_topk discipline)."""
    import os

    from otel_logger_spark.oracles_dsir import dsir_select_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        return None
    return dsir_select_oracle(path, k=100)


def q_source_overlap(spark, sf_dir):
    """Cross-source shingle overlap (functions/overlap.py): exact
    distinct-shingle vocabularies per source and integer milli Jaccard
    for every source pair — the corpus-diversity audit behind mix
    planning. Oracle re-derives the set arithmetic in SQL."""
    from otel_logger_spark.functions.overlap import source_overlap_report

    return source_overlap_report(load_corpus(spark, sf_dir), n=3)


O_SOURCE_OVERLAP = (
    corpus_cte()
    + """
 , w AS (SELECT source, string_split(text, ' ') AS words FROM corpus),
 sh AS (SELECT DISTINCT source, array_to_string(words[i : i+2], ' ') AS shingle
        FROM w, UNNEST(generate_series(1, greatest(len(words)-2, 0))) AS u(i)),
 sizes AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY 1),
 common AS (SELECT a.source AS source_a, b.source AS source_b,
                   COUNT(*) AS n_common
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.source < b.source GROUP BY 1, 2)
 SELECT source_a, source_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_common,
        CAST(FLOOR(1000 * n_common / (sa.n_sh + sb.n_sh - n_common)) AS BIGINT)
          AS j_milli
 FROM common
 JOIN sizes sa ON sa.source = source_a
 JOIN sizes sb ON sb.source = source_b"""
)


_LM_K = 16
# mean-token-NLL cut in micro-nats: ~45% of the sf0.01 corpus passes,
# with the en-trained reference passing en docs at a visibly higher rate
# (48% vs 36% zh) — a non-trivial, behaviorally-sensible gate
_LM_THRESHOLD_MICRO = 5_600_000


def q_lm_fluency(spark, sf_dir):
    """Unigram-LM fluency scoring (functions/lmscore.py, CCNet-style
    perplexity proxy): add-one-smoothed NLL table from the lang='en'
    reference leg, zero-shuffle integer mean-NLL scoring against one
    K-entry literal map, per-language fluency-cut accounting. The oracle
    re-derives reference counts, the LEFT-JOIN scoring and the integer
    division in DuckDB; only the nll formula is shared (the DSIR
    lambda discipline)."""
    from otel_logger_spark.functions.lmscore import lm_fluency_report

    corpus = load_corpus(spark, sf_dir)
    ref = corpus.filter(F.col("lang") == "en")
    return lm_fluency_report(
        corpus, ref, k=_LM_K, threshold_micro=_LM_THRESHOLD_MICRO
    )


def _o_lm_fluency() -> str | None:
    """Reference counts depend on the corpus — generator reads the
    gate's own input (the _o_ann_ivf_topk discipline)."""
    import os

    import duckdb as _duck

    from otel_logger_spark.functions.lmscore import nll_table

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        return None
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    counts = con.execute(
        corpus_cte()
        + f"""
 , toks AS (SELECT unnest(string_split(text, ' ')) AS tok
            FROM corpus WHERE lang = 'en')
 SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
 ORDER BY c DESC, tok ASC LIMIT {_LM_K}"""
    ).fetchall()
    con.close()
    tab, oov = nll_table([(t, c) for t, c in counts])
    vals = ", ".join(f"('{t.replace(chr(39), chr(39) * 2)}', {v})" for t, v in tab.items())
    return (
        corpus_cte()
        + f"""
 , dw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus),
 toks AS (SELECT doc_id, lang, unnest(w) AS tok FROM dw),
 nll(tok, v) AS (SELECT * FROM (VALUES {vals})),
 pd AS (SELECT doc_id, lang,
               SUM(COALESCE(n.v, {oov})) AS total, COUNT(*) AS n_tok
        FROM toks LEFT JOIN nll n USING (tok) GROUP BY 1, 2),
 sc AS (SELECT lang, total // n_tok AS mean_nll FROM pd)
 SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN mean_nll <= {_LM_THRESHOLD_MICRO} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fluent,
        CAST(SUM(mean_nll) AS BIGINT) AS sum_mean_nll
 FROM sc GROUP BY 1"""
    )


_HYG_QUALITY_MIN = 650
_HYG_NLL_MAX = 5_600_000
_HYG_REP_THR = {
    "dup_line_milli": 300,
    "top_bigram_milli": 90,  # tightened vs Gopher 180: single-line
    "dup_5gram_milli": 150,  # synthetic docs zero the other two metrics
}


def q_hygiene_manifest(spark, sf_dir):
    """Composed hygiene manifest (functions/hygiene.py): repetition +
    quality + unigram-fluency rules in ONE corpus traversal (each rule a
    codegen/fold projection, zero exchanges until the accounting agg),
    per-language rejection counts per rule plus survivors. The oracle
    recomposes all three rules independently in SQL — repetition via
    repetition_stats_sql, quality via the text-quality expressions,
    fluency via the NLL-table join replay."""
    from otel_logger_spark.functions.hygiene import hygiene_report
    from otel_logger_spark.functions.lmscore import (
        nll_table,
        reference_counts,
    )

    corpus = load_corpus(spark, sf_dir)
    uni_tab, oov = nll_table(
        reference_counts(corpus.filter(F.col("lang") == "en"), _LM_K)
    )
    return hygiene_report(
        corpus, uni_tab, oov, _HYG_QUALITY_MIN, _HYG_NLL_MAX, _HYG_REP_THR
    )


def _o_hygiene_manifest() -> str | None:
    """All three rules recomposed in DuckDB over the same corpus; the
    NLL table is derived from the gate's own input at generator time
    (the _o_lm_fluency discipline)."""
    import os

    import duckdb as _duck

    from otel_logger_spark.functions.lmscore import nll_table
    from otel_logger_spark.functions.repetition import repetition_stats_sql

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        return None
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    counts = con.execute(
        corpus_cte()
        + f"""
 , toks AS (SELECT unnest(string_split(text, ' ')) AS tok
            FROM corpus WHERE lang = 'en')
 SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
 ORDER BY c DESC, tok ASC LIMIT {_LM_K}"""
    ).fetchall()
    con.close()
    tab, oov = nll_table([(t, c) for t, c in counts])
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    vals = ", ".join(f"('{esc(t)}', {v})" for t, v in tab.items())
    m = repetition_stats_sql("text")
    rep_flag = " OR ".join(
        f"({m[col]}) > {thr}" for col, thr in sorted(_HYG_REP_THR.items())
    )
    return (
        corpus_cte()
        + f"""
 , rep AS (SELECT doc_id, ({rep_flag}) AS rep_flag FROM corpus),
 qd AS (
  SELECT doc_id, length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    (SELECT {{MARKERS}} FROM (SELECT ' ' || text || ' ' AS p)) AS n_stopwords
  FROM corpus),
 qual AS (SELECT doc_id,
  ((CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 400 ELSE 0 END
   + least(CAST(FLOOR(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT), 300)
   + CAST(FLOOR(FLOOR(1000 * n_alpha / greatest(n_chars, 1)) * 300 / 1000) AS BIGINT))
   < {_HYG_QUALITY_MIN}) AS quality_flag FROM qd),
 dtoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
 nll(tok, v) AS (SELECT * FROM (VALUES {vals})),
 flu AS (SELECT doc_id,
         ((SUM(COALESCE(n.v, {oov})) // COUNT(*)) > {_HYG_NLL_MAX}) AS fluency_flag
         FROM dtoks LEFT JOIN nll n USING (tok) GROUP BY 1),
 mf AS (SELECT c.lang, rep.rep_flag, qual.quality_flag, flu.fluency_flag
        FROM corpus c
        JOIN rep USING (doc_id) JOIN qual USING (doc_id) JOIN flu USING (doc_id))
 SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
   CAST(SUM(CASE WHEN rep_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_rep,
   CAST(SUM(CASE WHEN quality_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
   CAST(SUM(CASE WHEN fluency_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_fluency,
   CAST(SUM(CASE WHEN NOT rep_flag AND NOT quality_flag AND NOT fluency_flag
            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
 FROM mf GROUP BY 1""".replace("{MARKERS}", _ALL_MARKERS_SQL)
    )


_BPE_MERGES = 12
_BPE_SCHEMA = (
    "rank bigint, lhs string, rhs string, merged string, pair_count bigint"
)


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (functions/bpe.py, Sennrich
    arXiv:1508.07909): the corpus -> word-frequency aggregation is the
    distributed leg; the merge loop is bounded driver state over that
    table (the ivf.py-centroid discipline — and where every real BPE
    trainer runs it). The oracle derives word counts INDEPENDENTLY in
    DuckDB and feeds the same shared merge loop, so the hash-match
    checks the distributed aggregation."""
    from otel_logger_spark.functions.bpe import bpe_train

    merges = bpe_train(load_corpus(spark, sf_dir), _BPE_MERGES)
    return spark.createDataFrame(
        [(int(r), a, b, m, int(c)) for r, a, b, m, c in merges], _BPE_SCHEMA
    )


def _o_bpe_word_counts(sf_dir: str) -> list[tuple[str, int]] | None:
    import os

    import duckdb as _duck

    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        return None
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    counts = con.execute(
        corpus_cte()
        + """
 , toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM corpus)
 SELECT word, COUNT(*) AS c FROM toks WHERE word <> '' GROUP BY 1
 ORDER BY word"""
    ).fetchall()
    con.close()
    # ORDER BY word (round 9): DuckDB's parallel hash aggregate returns
    # rows in a nondeterministic order, and _o_bpe_encode embeds this
    # list as a VALUES table — the oracle SQL TEXT differed on every
    # invocation (semantically identical, but hostile to any fingerprint
    # over the oracle text). The merge loop is order-insensitive (total
    # order over pair counts), so results are unchanged.
    return [(w, c) for w, c in counts]


def _o_bpe_merges() -> str | None:
    import os

    from otel_logger_spark.functions.bpe import bpe_train_from_counts

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    counts = _o_bpe_word_counts(sf_dir)
    if counts is None:
        return None
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    vals = ", ".join(
        f"({r}, '{esc(a)}', '{esc(b)}', '{esc(m)}', {c})"
        for r, a, b, m, c in bpe_train_from_counts(counts, _BPE_MERGES)
    )
    return f"""
SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs, merged,
       CAST(pair_count AS BIGINT) AS pair_count
FROM (VALUES {vals}) AS t(rank, lhs, rhs, merged, pair_count)
"""


def q_bpe_encode(spark, sf_dir):
    """BPE encode accounting: per-language word and sub-word token
    totals under the learned merges, via the Arrow-batched per-word fold
    (functions/bpe.encode_with_merges — the scale encode path: pure
    per-word function, batch-memoized, one tiny row per doc out). The
    oracle joins corpus words against an embedded word->token-count
    table built by the SAME shared fold over its own independently
    derived word list."""
    from otel_logger_spark.functions.bpe import bpe_train, encode_with_merges

    corpus = load_corpus(spark, sf_dir)
    merges = bpe_train(corpus, _BPE_MERGES)
    enc = encode_with_merges(corpus, merges, carry_cols=("lang",))
    return enc.groupBy("lang").agg(
        F.sum("n_words").alias("n_words"),
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.expr(
            "CAST((1000 * SUM(n_bpe_tokens)) DIV SUM(n_words) AS BIGINT)"
        ).alias("tokens_per_word_milli"),
    )


def _o_bpe_encode() -> str | None:
    import os

    from otel_logger_spark.functions.bpe import (
        bpe_train_from_counts,
        encode_word,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    counts = _o_bpe_word_counts(sf_dir)
    if counts is None:
        return None
    merges = bpe_train_from_counts(counts, _BPE_MERGES)
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    vals = ", ".join(
        f"('{esc(w)}', {len(encode_word(w, merges))})" for w, _ in counts
    )
    return (
        corpus_cte()
        + f"""
 , toks AS (SELECT lang, unnest(string_split(text, ' ')) AS word
            FROM corpus),
 wt(word, ntok) AS (SELECT * FROM (VALUES {vals}))
 SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(SUM(wt.ntok) AS BIGINT) AS n_bpe_tokens,
        CAST((1000 * SUM(wt.ntok)) // COUNT(*) AS BIGINT)
          AS tokens_per_word_milli
 FROM toks JOIN wt USING (word)
 WHERE word <> ''
 GROUP BY lang"""
    )


def q_image_near_dup(spark, sf_dir):
    """Image near-dup via banded perceptual-hash Hamming matching
    (functions/imagedup.py): corpus image rows decode to 64-bit phashes
    (digest fake — sha256 prefix, SQL-replayable), every 8th image also
    appears as an injected 1-bit-flipped copy (id +30000, bit doc_id%60)
    so true near-pairs exist; the banded plan must return EXACTLY the
    brute-force pair set (pigeonhole: hamming < 4 bands shares a band)."""
    from otel_logger_spark.functions.imagedup import phash_near_pairs
    from otel_logger_spark.functions.multimodal import decode_media

    media = as_media(_load_documents(spark, sf_dir)).filter(
        F.col("kind") == "image"
    )
    # round 9: checkpoint the decoded (id, phash) metadata — ~16 bytes/row
    # — so the Python decode stage runs ONCE; without it the perturbation
    # union and the banded self-join re-execute the mapInPandas decode on
    # every leg (no cross-branch CSE). This is exactly the "production
    # input is the already-materialized decoded-metadata table" shape the
    # round-8 plan audit called for, expressed in-query.
    dec = (
        decode_media(media)
        .select("doc_id", "phash")
        .localCheckpoint(eager=False)
    )
    pert = dec.filter(F.col("doc_id") % 24 == 0).select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.expr(
            "phash ^ shiftleft(1L, cast(doc_id % 60 as int))"
        ).alias("phash"),
    )
    return phash_near_pairs(dec.unionByName(pert), max_hamming=3)


def _o_image_near_dup() -> str:
    """Brute-force Hamming pairs in DuckDB over the identical phash
    construction: sha256-prefix fake decode replayed from raw text
    (hex halves -> HUGEINT -> offset-signed int64), same 1-bit
    perturbation, bit_count(xor) filter. Banding is plan-only — the
    answer sets must be equal."""
    ph = (
        "CAST((('0x'||substring(sha256(text),1,8))::BIGINT::HUGEINT "
        "* 4294967296 + ('0x'||substring(sha256(text),9,8))::BIGINT) "
        "- 9223372036854775808 AS BIGINT)"
    )
    return f"""
WITH imgs AS (
  SELECT doc_id, {ph} AS phash FROM documents WHERE doc_id % 3 = 0),
pert AS (
  SELECT doc_id + 30000 AS doc_id,
         xor(phash, (1::BIGINT << CAST(doc_id % 60 AS INT))) AS phash
  FROM imgs WHERE doc_id % 24 = 0),
allv AS (SELECT * FROM imgs UNION ALL SELECT * FROM pert)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
FROM allv a, allv b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.phash, b.phash)) <= 3
"""


_CHUNK_SIZE = 24
_CHUNK_OVERLAP = 6


def q_chunk_windows(spark, sf_dir):
    """Context-window chunking (functions/chunking.py): every document
    becomes stride-overlapped token windows of at most 24 tokens
    (stride 18), last-window-never-dropped. One codegen projection +
    explode — no shuffle, no UDF; the oracle replays the chunk grammar
    with generate_series + inclusive list slicing."""
    from otel_logger_spark.functions.chunking import chunk_documents

    corpus = load_corpus(spark, sf_dir)
    return chunk_documents(
        corpus, _CHUNK_SIZE, _CHUNK_OVERLAP, carry_cols=("lang",)
    )


def _o_chunk_windows() -> str:
    size, stride = _CHUNK_SIZE, _CHUNK_SIZE - _CHUNK_OVERLAP
    return (
        corpus_cte()
        + f"""
 , dw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus),
 par AS (SELECT doc_id, lang, w,
   CASE WHEN len(w) <= {size} THEN 1
        ELSE 1 + (len(w) - {size} + {stride} - 1) // {stride} END AS n_chunks
   FROM dw),
 ix AS (SELECT doc_id, lang, w,
   unnest(generate_series(0, n_chunks - 1)) AS i FROM par)
 SELECT doc_id, lang, CAST(i AS BIGINT) AS chunk_idx,
   CAST(i * {stride} + 1 AS BIGINT) AS chunk_start,
   CAST(len(w[i * {stride} + 1 : i * {stride} + {size}]) AS BIGINT)
     AS n_chunk_tokens,
   array_to_string(w[i * {stride} + 1 : i * {stride} + {size}], ' ')
     AS chunk_text
 FROM ix"""
    )


_BI_K = 16
_BI_B = 64
_BI_THRESHOLD_MICRO = 6_200_000


def q_bigram_fluency(spark, sf_dir):
    """Bigram stupid-backoff fluency (functions/bigram.py, Brants et al.
    2007 distributed-LM scoring): top-16 unigram vocab + top-64 in-vocab
    bigram table from the lang='en' reference leg, zero-shuffle
    literal-fold scoring (pairs built in place with slice+zip_with, no
    sequencing shuffle), per-language fluency-cut accounting. The oracle
    re-derives BOTH reference tables and the positional CASE scoring in
    DuckDB; only the nll formulas are shared (the DSIR lambda
    discipline)."""
    from otel_logger_spark.functions.bigram import bigram_fluency_report

    corpus = load_corpus(spark, sf_dir)
    ref = corpus.filter(F.col("lang") == "en")
    return bigram_fluency_report(
        corpus, ref, k=_BI_K, b=_BI_B,
        threshold_micro=_BI_THRESHOLD_MICRO,
    )


def _o_bigram_fluency() -> str | None:
    """Reference tables depend on the corpus — generator reads the
    gate's own input (the _o_lm_fluency discipline)."""
    import os

    import duckdb as _duck

    from otel_logger_spark.functions.bigram import (
        backoff_nll,
        bigram_nll_table,
    )
    from otel_logger_spark.functions.lmscore import nll_table

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/documents.parquet"
    if not os.path.exists(path):
        return None
    con = _duck.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    uni_counts = [
        (t, c)
        for t, c in con.execute(
            corpus_cte()
            + f"""
 , toks AS (SELECT unnest(string_split(text, ' ')) AS tok
            FROM corpus WHERE lang = 'en')
 SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1
 ORDER BY c DESC, tok ASC LIMIT {_BI_K}"""
        ).fetchall()
    ]
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    in_vocab = ", ".join(f"'{esc(t)}'" for t, _ in uni_counts)
    bi_counts = [
        (p, c)
        for p, c in con.execute(
            corpus_cte()
            + f"""
 , dw AS (SELECT string_split(text, ' ') AS w FROM corpus WHERE lang = 'en'),
 pos AS (SELECT w, unnest(generate_series(2, len(w))) AS i FROM dw),
 pr AS (SELECT w[i-1] AS w1, w[i] AS w2 FROM pos)
 SELECT w1 || ' ' || w2 AS pair, COUNT(*) AS c FROM pr
 WHERE w1 IN ({in_vocab}) AND w2 IN ({in_vocab})
 GROUP BY 1 ORDER BY c DESC, pair ASC LIMIT {_BI_B}"""
        ).fetchall()
    ]
    con.close()
    uni_tab, oov = nll_table(uni_counts)
    bi_tab = bigram_nll_table(bi_counts, uni_counts)
    bo = backoff_nll()
    uni_vals = ", ".join(f"('{esc(t)}', {v})" for t, v in uni_tab.items())
    bi_vals = ", ".join(
        f"('{esc(p)}', {v})" for p, v in bi_tab.items()
    ) or "('', 0)"
    return (
        corpus_cte()
        + f"""
 , dw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus),
 pos AS (SELECT doc_id, lang, w, unnest(generate_series(1, len(w))) AS i FROM dw),
 t AS (SELECT doc_id, lang, w[i] AS tok,
              CASE WHEN i > 1 THEN w[i-1] || ' ' || w[i] END AS pair
       FROM pos),
 uni(tok, v) AS (SELECT * FROM (VALUES {uni_vals})),
 bi(pair, bv) AS (SELECT * FROM (VALUES {bi_vals})),
 costed AS (SELECT doc_id, lang,
       CASE WHEN t.pair IS NULL THEN COALESCE(u.v, {oov})
            ELSE COALESCE(b.bv, {bo} + COALESCE(u.v, {oov})) END AS cost
   FROM t LEFT JOIN uni u USING (tok) LEFT JOIN bi b USING (pair)),
 pd AS (SELECT doc_id, lang, SUM(cost) AS total, COUNT(*) AS n_tok
        FROM costed GROUP BY 1, 2),
 sc AS (SELECT lang, total // n_tok AS mean_nll FROM pd)
 SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN mean_nll <= {_BI_THRESHOLD_MICRO} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_fluent,
        CAST(SUM(mean_nll) AS BIGINT) AS sum_mean_nll
 FROM sc GROUP BY 1"""
    )


_VOCAB_K = 16


def q_vocab_oov(spark, sf_dir):
    """Vocabulary construction + OOV coverage (functions/vocab.py):
    top-16 token vocab (the synthetic pool has only 31 distinct tokens,
    so k=16 makes coverage non-trivial) under a total (count DESC,
    tok ASC) order, then
    per-language OOV occurrence counts and integer milli rates. The
    oracle re-derives the vocab and coverage entirely in SQL."""
    from otel_logger_spark.functions.vocab import oov_report

    corpus = load_corpus(spark, sf_dir)
    return oov_report(corpus, k=_VOCAB_K)


O_VOCAB_OOV = (
    corpus_cte()
    + f"""
 , dw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus),
 toks AS (SELECT doc_id, lang, unnest(w) AS tok FROM dw),
 vc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
 vocab AS (SELECT tok FROM vc ORDER BY c DESC, tok ASC LIMIT {_VOCAB_K}),
 pd AS (SELECT doc_id, lang, COUNT(*) AS n_tok,
        COUNT(*) FILTER (WHERE tok NOT IN (SELECT tok FROM vocab)) AS n_oov
        FROM toks GROUP BY 1, 2)
 SELECT lang, COUNT(*) AS n_docs,
        CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        CAST(SUM(n_oov) AS BIGINT) AS sum_oov,
        CAST((1000 * SUM(n_oov)) // SUM(n_tok) AS BIGINT) AS oov_milli
 FROM pd GROUP BY 1"""
)


# --- text analysis ---------------------------------------------------------------


def _load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fans out narrow gate inputs: the consumers run per-doc regex
    chains, rolling-hash pandas UDFs, or mapInPandas decodes — all CPU
    per row, all serial on a one-file scan. The one cheap consumer
    (training_mix, a pure codegen filter) reads plainly instead."""
    from otel_logger_spark.graftdata import fan_out_if_narrow

    return fan_out_if_narrow(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_lang_id(spark, sf_dir):
    docs = with_lang_guess(_load_documents(spark, sf_dir))
    return docs.groupBy("lang_guess").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("lang_guess") == F.col("lang")).cast("long")).alias("n_label_match"),
    )


def _occ_sql(needle: str) -> str:
    return f"CAST((length(p) - length(replace(p, '{needle}', ''))) / {len(needle)} AS INT)"


def _lang_score_sql(lang: str) -> str:
    return " + ".join(_occ_sql(m) for m in LANG_MARKERS[lang])


O_LANG_ID = f"""
WITH d AS (SELECT lang, ' ' || text || ' ' AS p FROM documents),
s AS (SELECT lang, {_lang_score_sql('en')} AS s_en, {_lang_score_sql('es')} AS s_es,
             {_lang_score_sql('fr')} AS s_fr, {_lang_score_sql('de')} AS s_de FROM d),
g AS (SELECT lang,
  CASE WHEN greatest(s_en, s_es, s_fr, s_de) = 0 THEN 'unk'
       WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       WHEN s_fr >= s_de THEN 'fr'
       ELSE 'de' END AS lang_guess
  FROM s)
SELECT lang_guess, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_label_match
FROM g GROUP BY 1
"""


def q_text_quality(spark, sf_dir):
    docs = with_quality(_load_documents(spark, sf_dir))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
        F.sum(F.col("n_bpe_tokens").cast("long")).alias("sum_bpe_tokens"),
        F.sum(F.col("n_stopwords").cast("long")).alias("sum_stopwords"),
        F.sum("quality_milli").alias("sum_quality_milli"),
    )


_ALL_MARKERS_SQL = " + ".join(
    _occ_sql(m) for marks in LANG_MARKERS.values() for m in marks
)

O_TEXT_QUALITY = f"""
WITH d AS (
  SELECT source, length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_tokens,
    len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n_bpe_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    (SELECT {_ALL_MARKERS_SQL} FROM (SELECT ' ' || text || ' ' AS p)) AS n_stopwords
  FROM documents),
q AS (SELECT source, n_tokens, n_bpe_tokens, n_stopwords,
  (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 400 ELSE 0 END
   + least(CAST(FLOOR(1000 * n_stopwords / greatest(n_tokens, 1)) AS BIGINT), 300)
   + CAST(FLOOR(FLOOR(1000 * n_alpha / greatest(n_chars, 1)) * 300 / 1000) AS BIGINT)
  ) AS quality_milli FROM d)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  CAST(SUM(n_bpe_tokens) AS BIGINT) AS sum_bpe_tokens,
  CAST(SUM(n_stopwords) AS BIGINT) AS sum_stopwords,
  CAST(SUM(quality_milli) AS BIGINT) AS sum_quality_milli
FROM q GROUP BY 1
"""


def q_pack_shards(spark, sf_dir):
    """Sequence packing manifest (functions/packing.py): documents fill
    1000-BPE-token shards within (source, doc_id % 4) streams —
    concatenate-and-chunk semantics, exact integer window arithmetic,
    re-derived identically in the oracle."""
    from otel_logger_spark.functions.packing import pack_stats
    from otel_logger_spark.functions.text import with_token_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = with_token_stats(docs)
    return pack_stats(
        toks, budget=1000, token_col="n_bpe_tokens",
        order_col="doc_id", group_cols=("source",), n_buckets=4,
    )


O_PACK_SHARDS = f"""
WITH toks AS (
  SELECT doc_id, source,
    len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS n
  FROM documents),
c AS (
  SELECT doc_id, source, n, doc_id % 4 AS bucket,
    SUM(n) OVER (PARTITION BY source, doc_id % 4 ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
      AS start_offset
  FROM toks)
SELECT source, CAST(bucket AS BIGINT) AS bucket,
  CAST(start_offset // 1000 AS BIGINT) AS pack_id,
  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
  CAST((100 * SUM(n)) // 1000 AS BIGINT) AS fill_pct
FROM c GROUP BY 1, 2, 3
"""


def q_doc_fingerprint(spark, sf_dir):
    """Rolling-hash fingerprints, ORACLE-CHECKED: the winnowing-lite
    min-window polynomial hash is re-derived independently in DuckDB SQL
    (list_reduce over code points per 32-char window, HUGEINT modular
    arithmetic) — a genuine cross-engine computation, not a golden pin.
    Round 7: the engine is the numpy prefix-hash vectorization (bit-
    identical; ~2x per byte vs the per-char loop — BENCH/AB_fingerprint.md,
    which also records why the measured pure-JVM fold stays opt-in).
    pytest additionally pins golden values + the append-robustness
    property."""
    docs = with_fingerprint(_load_documents(spark, sf_dir))
    return docs.select("doc_id", "fingerprint")


# Independent DuckDB re-derivation of functions/text.py fingerprint_text:
# per doc, code points -> polynomial rolling hash mod 2^61-1 (base 1000003)
# of every 32-char window -> min; short docs hash whole-string. The lambda
# runs in HUGEINT (128-bit) so h*base+c never overflows before the mod.
# O(len*32) per doc is fine for an oracle at sf<=0.01 (DuckDB ~5s/500 docs).
_FP_LAMBDA = "(h,c) -> (h*1000003+c) % 2305843009213693951"
O_DOC_FINGERPRINT = f"""
WITH d AS (
  SELECT doc_id,
    list_transform(generate_series(1, length(text)),
                   i -> unicode(text[i:i])::HUGEINT) AS cps
  FROM documents),
w AS (SELECT doc_id, cps, len(cps) AS n FROM d),
mins AS (
  SELECT doc_id,
    CASE WHEN n <= 32 THEN
      list_reduce(list_prepend(0::HUGEINT, cps), {_FP_LAMBDA})
    ELSE
      list_min(list_transform(generate_series(1, n-31),
        i -> list_reduce(list_prepend(0::HUGEINT, cps[i : i+31]),
                         {_FP_LAMBDA})))
    END AS fp
  FROM w)
SELECT doc_id, CAST(fp - 4611686018427387904 AS BIGINT) AS fingerprint
FROM mins
"""


# --- PII redaction -----------------------------------------------------------

# Deterministic PII injection over documents, rendered for both dialects
# (the synthetic corpus has no real PII; the construction rule IS the
# ground truth — same pattern as graftdata's transcripts construction).
_PII_CORPUS = """
SELECT doc_id,
  text
  || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS {str}) || '@example.com' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS {str}) || '.3.' || CAST(doc_id % 97 AS {str}) ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS {str}), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS {str}), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' call +1 (415) 555-' || lpad(CAST(doc_id % 10000 AS {str}), 4, '0') ELSE '' END
  || CASE WHEN doc_id % 17 = 0 THEN ' token deadbeef' || lpad(CAST(doc_id % 100 AS {str}), 2, '0') || repeat('ab', 12) ELSE '' END
  AS text
FROM documents
"""


def q_pii_redaction(spark, sf_dir):
    """Redaction audit over a deterministically PII-injected corpus: one
    row per PII type with documents affected + total matches
    (functions/redact.py — ordered Java/RE2-portable mask chain; counts
    taken independently on the original text). The oracle replays the
    identical construction and counting in DuckDB RE2."""
    from otel_logger_spark.functions.redact import redaction_report
    from otel_logger_spark.graftdata import fan_out_if_narrow

    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    # 12 regex passes per document are the heavy projection — fan out the
    # one-file gate input so they run at full width (a real table's
    # natural splits skip this branch)
    corpus = fan_out_if_narrow(spark.sql(_PII_CORPUS.format(str="STRING")))
    return redaction_report(corpus)


def _o_pii_redaction() -> str:
    from otel_logger_spark.functions.redact import redaction_report_sql

    return redaction_report_sql(
        "WITH corpus AS (" + _PII_CORPUS.format(str="VARCHAR") + ")"
    )


# --- multimodal --------------------------------------------------------------


def q_multimodal_decode(spark, sf_dir):
    """Corpus leg (opaque text payloads -> deterministic fake decode) +
    BMP fixture leg (real stdlib codec: decode_media sniffs the header
    and runs functions/multimodal.decode_bmp). The oracle re-derives the
    fixture's width/height IN SQL from the header bytes of the exact
    same payloads (hex-literal VALUES + little-endian byte arithmetic) —
    a genuine cross-engine check of the codec path."""
    from otel_logger_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        bmp_fixture_rows,
    )

    media = as_media(_load_documents(spark, sf_dir))
    fix = spark.createDataFrame(
        [
            (fid, "image", data, {"codec": "bmp"})
            for fid, data in bmp_fixture_rows()
        ],
        MEDIA_SCHEMA,
    )
    return decode_media(media.unionByName(fix)).select(
        "doc_id", "kind", "n_bytes", "width", "height", "decoder"
    )


O_MULTIMODAL_DECODE_CORPUS = """
SELECT doc_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(64 + strlen(text) % 577 AS INT) AS width,
  CAST(64 + (strlen(text) * 31) % 433 AS INT) AS height,
  'fake' AS decoder
FROM documents
"""


def _o_multimodal_decode() -> str:
    """Corpus fake-decode leg UNION the BMP fixture parsed from raw
    header bytes in DuckDB: byte i of hex(data) is ('0x'||substr)::INT,
    width/height are the little-endian int32s at BITMAPINFOHEADER
    offsets 19/23 (1-based). The SQL never sees the generator's
    width/height arguments — only the bytes."""
    from otel_logger_spark.functions.multimodal import bmp_fixture_rows

    def byte(off: int) -> str:
        return f"(('0x' || substring(h, {2 * off - 1}, 2))::BIGINT)"

    def le32(off: int) -> str:
        return (
            f"({byte(off)} + 256 * {byte(off + 1)} + 65536 * {byte(off + 2)}"
            f" + 16777216 * {byte(off + 3)})"
        )

    vals = ",\n    ".join(
        f"({fid}, from_hex('{data.hex().upper()}'))"
        for fid, data in bmp_fixture_rows()
    )
    return f"""{O_MULTIMODAL_DECODE_CORPUS}
UNION ALL
SELECT doc_id, 'image' AS kind,
  CAST(octet_length(data) AS BIGINT) AS n_bytes,
  CAST({le32(19)} AS INT) AS width,
  CAST({le32(23)} AS INT) AS height,
  'bmp' AS decoder
FROM (
  SELECT doc_id, data, hex(data) AS h FROM (VALUES
    {vals}) AS v(doc_id, data)
)
"""


def q_embedding_outliers(spark, sf_dir):
    """Embedding outlier audit (functions/outliers.py): per-label
    centroid in exact non-negative integer space, squared distances, and
    the milli-precision outlier flag — (label, n_vecs, n_outliers,
    mean_d2, max_d2, top_outlier_id). The corpus is augmented with
    injected outliers (every 50th vector re-appears +0.5 on its first
    eight dims, id +20000 — the _augmented_vectors pattern) so BOTH flag
    branches are exercised: the synthetic corpus alone is uniform enough
    that nothing exceeds 2x mean distance. The oracle constructs the
    identical augmentation and replays the integer pipeline over DuckDB
    unnest/window functions. IEEE-double determinism: float32 widens
    exactly, +0.5 is exact rounding in both engines, so the quantized
    integers are bit-identical."""
    from otel_logger_spark.functions.outliers import outlier_report

    emb = _load_embeddings(spark, sf_dir)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    base = emb.select("vec_id", "label", as_double.alias("embedding"))
    pert = base.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 20000).alias("vec_id"),
        "label",
        F.concat(
            F.transform(
                F.slice("embedding", 1, 8), lambda x: x + F.lit(0.5)
            ),
            F.slice("embedding", 9, 100000),
        ).alias("embedding"),
    )
    # round 9: checkpoint the augmented frame once — outlier_report
    # traverses its input twice (per-dim profile + per-vector distances),
    # and without the barrier each traversal re-ran both scan legs, the
    # perturbation projection and a fan-out repartition per leg
    return outlier_report(
        base.unionByName(pert).localCheckpoint(eager=False)
    )


O_EMBEDDING_OUTLIERS = """
WITH base AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
aug AS (
  SELECT vec_id, label, v FROM base
  UNION ALL
  SELECT vec_id + 20000 AS vec_id, label,
    list_concat(list_transform(v[1:8], x -> x + 0.5), v[9:]) AS v
  FROM base WHERE vec_id % 50 = 0),
e AS (
  SELECT vec_id, label,
    unnest(generate_series(1, len(v))) AS pos,
    unnest(list_transform(v,
      x -> CAST(FLOOR(x * 1000000) AS BIGINT) + 1000000)) AS q
  FROM aug),
cent AS (
  SELECT label, pos, CAST(SUM(q) // COUNT(*) AS BIGINT) AS c
  FROM e GROUP BY label, pos),
d AS (
  SELECT e.vec_id, e.label,
    CAST(SUM((e.q - cent.c) * (e.q - cent.c)) AS BIGINT) AS dist2
  FROM e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
  GROUP BY e.vec_id, e.label),
m AS (
  SELECT label, CAST(SUM(dist2) // COUNT(*) AS BIGINT) AS mean_d2
  FROM d GROUP BY label),
f AS (
  SELECT d.vec_id, d.label, d.dist2, m.mean_d2,
    (1000 * d.dist2 > 2000 * m.mean_d2) AS is_outlier,
    ROW_NUMBER() OVER (PARTITION BY d.label
                       ORDER BY d.dist2 DESC, d.vec_id) AS rk
  FROM d JOIN m USING (label))
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
  CAST(SUM(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  CAST(MAX(mean_d2) AS BIGINT) AS mean_d2,
  CAST(MAX(dist2) AS BIGINT) AS max_d2,
  CAST(MIN(CASE WHEN rk = 1 THEN vec_id END) AS BIGINT) AS top_outlier_id
FROM f GROUP BY label
"""


def q_audio_stats(spark, sf_dir):
    """Audio leg of the multimodal surface: corpus 'audio' rows (opaque
    text payloads -> deterministic fake stats) + WAV fixture leg (real
    stdlib codec: decode_audio sniffs the canonical PCM header and runs
    functions/multimodal.decode_wav — numpy over the actual int16
    samples). The oracle re-derives channels/rate/frame-count AND the
    per-sample statistics (peak amplitude, integer mean-square) IN SQL
    from the raw bytes of the exact same payloads — a genuine
    cross-engine replay of the audio codec path."""
    from otel_logger_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_audio,
        wav_fixture_rows,
    )

    media = as_media(_load_documents(spark, sf_dir)).filter(
        F.col("kind") == "audio"
    )
    fix = spark.createDataFrame(
        [
            (fid, "audio", data, {"codec": "wav"})
            for fid, data in wav_fixture_rows()
        ],
        MEDIA_SCHEMA,
    )
    return decode_audio(media.unionByName(fix))


O_AUDIO_STATS_CORPUS = """
SELECT doc_id, 'audio' AS kind,
  CAST(strlen(text) AS BIGINT) AS n_bytes,
  CAST(16000 AS INT) AS sample_rate,
  CAST(1 AS INT) AS n_channels,
  CAST(strlen(text) AS BIGINT) AS n_frames,
  CAST((1000 * strlen(text)) // 16000 AS BIGINT) AS duration_ms,
  CAST(strlen(text) % 32768 AS INT) AS peak_abs,
  CAST((strlen(text) * 37) % 1048576 AS BIGINT) AS meansq,
  'fake' AS decoder
FROM documents WHERE doc_id % 3 = 1
"""


def _o_audio_stats() -> str:
    """Corpus fake-stats leg UNION the WAV fixtures decoded from raw
    bytes in DuckDB: header fields are little-endian integers at the
    canonical offsets (channels@22, rate@24, data_size@40, 0-based), and
    the sample statistics replay EVERY int16 sample word — range() over
    the sample index, two hex bytes per sample, two's-complement sign
    fold, MAX(ABS(v)) and SUM(v*v)//n. The SQL never sees the
    generator's arguments — only the bytes (range(4096) is a loop bound,
    filtered by the header-derived sample count)."""
    from otel_logger_spark.functions.multimodal import wav_fixture_rows

    def byte(off: int) -> str:  # 0-based byte offset into hex string h
        return f"(('0x' || substring(h, {2 * off + 1}, 2))::BIGINT)"

    def le16(off: int) -> str:
        return f"({byte(off)} + 256 * {byte(off + 1)})"

    def le32(off: int) -> str:
        return (
            f"({byte(off)} + 256 * {byte(off + 1)} + 65536 * {byte(off + 2)}"
            f" + 16777216 * {byte(off + 3)})"
        )

    vals = ",\n    ".join(
        f"({fid}, '{data.hex().upper()}')" for fid, data in wav_fixture_rows()
    )
    lo = "(('0x' || substring(f.h, 89 + 4 * r.range, 2))::BIGINT)"
    hi = "(('0x' || substring(f.h, 91 + 4 * r.range, 2))::BIGINT)"
    return f"""{O_AUDIO_STATS_CORPUS}
UNION ALL
SELECT hdr.doc_id, 'audio' AS kind,
  CAST(strlen(hdr.h) // 2 AS BIGINT) AS n_bytes,
  CAST(hdr.sample_rate AS INT) AS sample_rate,
  CAST(hdr.n_channels AS INT) AS n_channels,
  CAST(hdr.data_size // (2 * hdr.n_channels) AS BIGINT) AS n_frames,
  CAST((1000 * (hdr.data_size // (2 * hdr.n_channels))) // hdr.sample_rate
       AS BIGINT) AS duration_ms,
  CAST(agg.peak_abs AS INT) AS peak_abs,
  CAST(agg.meansq AS BIGINT) AS meansq,
  'wav' AS decoder
FROM (
  SELECT doc_id, h, {le16(22)} AS n_channels, {le32(24)} AS sample_rate,
         {le32(40)} AS data_size
  FROM (VALUES
    {vals}) AS v(doc_id, h)
) hdr
JOIN (
  SELECT doc_id, MAX(ABS(v)) AS peak_abs,
         CAST(SUM(v * v) // COUNT(*) AS BIGINT) AS meansq
  FROM (
    SELECT f.doc_id,
      ({lo} + 256 * {hi}
       - CASE WHEN {hi} >= 128 THEN 65536 ELSE 0 END
      ) AS v
    FROM (
      SELECT doc_id, h, {le32(40)} AS data_size
      FROM (VALUES
        {vals}) AS v(doc_id, h)
    ) f, range(4096) r
    WHERE r.range < f.data_size // 2
  ) GROUP BY doc_id
) agg ON hdr.doc_id = agg.doc_id
"""


def q_doc_repetition(spark, sf_dir):
    """Gopher-style repetition quality metrics per document
    (functions/repetition.py): duplicate-line fraction, top-bigram
    multiplicity, duplicate-5-gram fraction — all integer milli-
    fractions; the oracle re-derives each over DuckDB list functions
    with the identical tokenization and integer arithmetic."""
    from otel_logger_spark.functions.repetition import with_repetition_stats

    docs = with_repetition_stats(_load_documents(spark, sf_dir))
    return docs.select(
        "doc_id", "n_lines", "dup_line_milli", "top_bigram_n",
        "top_bigram_milli", "dup_5gram_milli",
        F.col("repetition_flagged").cast("int").alias("flagged"),
    )


def _o_doc_repetition() -> str:
    from otel_logger_spark.functions.repetition import (
        GOPHER_THRESHOLDS_MILLI,
        repetition_stats_sql,
    )

    m = repetition_stats_sql("text")
    flag = " OR ".join(
        f"({m[col]}) > {thr}" for col, thr in GOPHER_THRESHOLDS_MILLI.items()
    )
    return f"""
SELECT doc_id, {m['n_lines']} AS n_lines,
  {m['dup_line_milli']} AS dup_line_milli,
  {m['top_bigram_n']} AS top_bigram_n,
  {m['top_bigram_milli']} AS top_bigram_milli,
  {m['dup_5gram_milli']} AS dup_5gram_milli,
  CAST({flag} AS INT) AS flagged
FROM documents
"""


def q_decontam_split(spark, sf_dir):
    """Benchmark decontamination audit (functions/decontam.py): docs with
    doc_id % 7 == 0 act as the evaluation set, the rest as training;
    report per-source how many training docs share a 13-gram with the
    benchmark and how many survive. Broadcast-only plan — raw text never
    shuffles (tests/test_decontam.py asserts the join strategies)."""
    from otel_logger_spark.functions.decontam import decontam_summary

    docs = _load_documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    return decontam_summary(train, bench, n=13, group_col="source")


def _o_decontam_split() -> str:
    from otel_logger_spark.functions.decontam import decontam_summary_sql

    return (
        "WITH train AS (SELECT doc_id, source, text FROM documents "
        "WHERE doc_id % 7 <> 0), "
        "bench AS (SELECT text FROM documents WHERE doc_id % 7 = 0)"
        + decontam_summary_sql("train", "bench", n=13, group_col="source")
    )


def q_contamination_profile(spark, sf_dir):
    """Contamination-severity histogram (functions/decontam.py:
    contamination_profile): per-source decile distribution of each
    training doc's contaminated-13-gram SHARE against the doc_id%7==0
    benchmark — the severity audit the binary decontam_split summary
    hides. Broadcast probe + map-side per-doc collapse; the oracle
    replays grams, probe, integer decile and histogram in SQL."""
    from otel_logger_spark.functions.decontam import contamination_profile

    docs = _load_documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    return contamination_profile(train, bench, n=13, group_col="source")


def _o_contamination_profile() -> str:
    from otel_logger_spark.functions.decontam import contamination_profile_sql

    return (
        "WITH train AS (SELECT doc_id, source, text FROM documents "
        "WHERE doc_id % 7 <> 0), "
        "bench AS (SELECT text FROM documents WHERE doc_id % 7 = 0)"
        + contamination_profile_sql("train", "bench", n=13, group_col="source")
    )


def q_incremental_dedup(spark, sf_dir):
    """Incremental dedup of a new batch against the already-ingested
    history (functions/bloom.py): the corpus originals (doc_id < 100000)
    act as the history, the injected blocks (>= 100000) as the arriving
    batch — the exact-duplicate block must drop, the ' zz extra' modified
    block must survive. The Bloom prefilter cannot change results (no
    false negatives), so the oracle is the plain exact anti-join.

    Round 7 (verdict item 5): the gate now consumes the history through
    a DIGEST STORE, the 100 TB shape — at scale the history is a stored
    digest table, not raw text re-derived per consumer. The constructed
    gate input is staged once (localCheckpoint — it models tables that
    EXIST on disk; the previous lazy form re-ran the 3-branch corpus
    construction in every consumer: 22 parquet scans / 11 exchanges),
    the digest store is built from it exactly once and checkpointed, and
    both the Bloom build and the verify semi-join read that store. Total
    parquet scans for the whole query: 3 (the corpus-construction union
    branches, once — plan-asserted in tests/test_bloom.py)."""
    from otel_logger_spark.functions.bloom import dedup_against_history

    corpus = load_corpus(spark, sf_dir).localCheckpoint(eager=True)
    store = (
        corpus.filter(F.col("doc_id") < 100000)
        .select(F.sha2(F.col("text"), 256).alias("digest"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    batch = corpus.filter(F.col("doc_id") >= 100000)
    kept = dedup_against_history(
        batch, store, history_digest_col="digest", m_bits=1 << 16, k=5
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"), F.sum("doc_id").alias("sum_ids")
    )


O_INCREMENTAL_DEDUP = (
    corpus_cte()
    + """
 , hist AS (SELECT text FROM corpus WHERE doc_id < 100000),
 batch AS (SELECT doc_id, source, text FROM corpus WHERE doc_id >= 100000)
 SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS sum_ids
 FROM batch b
 WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.text = b.text)
 GROUP BY source"""
)


def q_tfidf_terms(spark, sf_dir):
    """Top-3 salient terms per document (functions/tfidf.py) — the
    division-free integer TF-IDF variant; the oracle replays the exact
    same tokenization, integer idf and tie order in DuckDB."""
    from otel_logger_spark.functions.tfidf import salient_terms

    return salient_terms(_load_documents(spark, sf_dir), k=3)


def _o_tfidf_terms() -> str:
    from otel_logger_spark.functions.tfidf import salient_terms_sql

    return "WITH" + salient_terms_sql("documents", k=3)


def q_span_dedup(spark, sf_dir):
    """Per-document span-level exact-substring duplication accounting
    (functions/spandedup.py, the Lee-et-al ExactSubstr family): 8-token
    windows duplicated across >= 2 distinct docs, interval-union token
    coverage, integer milli fraction."""
    from otel_logger_spark.functions.spandedup import span_dedup_stats

    return span_dedup_stats(_load_documents(spark, sf_dir), n=8)


def _o_span_dedup() -> str:
    from otel_logger_spark.functions.spandedup import span_dedup_sql

    return span_dedup_sql("documents", n=8)


def _snapshot_pair(spark, sf_dir):
    """Deterministic second generation of the documents table: drop
    doc_id%13==0, append ' [v2]' to text when doc_id%17==0, add new ids
    (+10,000,000) for doc_id%11==0 — replayed rule-for-rule in SQL."""
    old = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mutated = old.filter(F.col("doc_id") % 13 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 17 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
        ).otherwise(F.col("text")),
    )
    added = old.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    return old, mutated.unionByName(added)


def q_snapshot_diff(spark, sf_dir):
    """Generation-over-generation audit (operators/diff.py): per-source
    added/removed/changed/unchanged counts between the documents table
    and its deterministically mutated second generation. Digest mode —
    the oracle replays the xxhash64 content digest bit-for-bit."""
    from otel_logger_spark.operators.diff import snapshot_diff_summary

    old, new = _snapshot_pair(spark, sf_dir)
    return snapshot_diff_summary(
        old, new, ["doc_id"],
        compare_cols=["text", "lang", "source", "n_chars"],
        group_col="source",
    )


def _o_snapshot_diff() -> str:
    from otel_logger_spark.operators.diff import snapshot_diff_summary_sql

    body = snapshot_diff_summary_sql(
        "old_s", "new_s", "doc_id",
        compare_cols=["text", "lang", "source", "n_chars"],
        group_col="source",
    )
    return (
        """
WITH old_s AS (SELECT doc_id, text, lang, source, n_chars FROM documents),
 new_s AS (
   SELECT doc_id,
          CASE WHEN doc_id % 17 = 0 THEN text || ' [v2]' ELSE text END AS text,
          lang, source, n_chars
   FROM documents WHERE doc_id % 13 <> 0
   UNION ALL
   SELECT doc_id + 10000000, text, lang, source, n_chars
   FROM documents WHERE doc_id % 11 = 0)"""
        + body
    )


_FREQCAP_K = 15  # 20 sources x 25 docs at the gate SFs -> 10 dropped each


def q_freqcap(spark, sf_dir):
    """Per-source frequency cap (functions/freqcap.py, RefinedWeb-style
    domain capping): keep at most K docs per source under the total
    order (n_chars DESC, doc_id ASC); per-group accounting incl. the
    order-key value at the cap boundary. Rank runs on a narrow
    (source, n_chars, doc_id) projection — text never enters the
    exchange; the oracle replays ROW_NUMBER under the same total order."""
    from otel_logger_spark.functions.freqcap import freqcap_report

    return freqcap_report(_load_documents(spark, sf_dir), _FREQCAP_K)


O_FREQCAP = f"""
WITH r AS (
  SELECT source, n_chars, doc_id,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM documents)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN rnk <= {_FREQCAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN rnk > {_FREQCAP_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
  CAST(MIN(CASE WHEN rnk <= {_FREQCAP_K} THEN n_chars END) AS BIGINT) AS min_kept_key
FROM r GROUP BY source
"""


def q_diversity(spark, sf_dir):
    """Per-source n-gram diversity audit (functions/diversity.py):
    type-token ratio + distinct-3-gram rate, exact counts over xxhash64
    gram digests (strings never shuffle). The oracle replays the digest
    bit-exactly via oracles_xxh64.xxh64_ctes on the union vocabulary of
    tokens and 3-grams, so COUNT DISTINCT agrees with the engine even in
    the (never-observed) collision case."""
    from otel_logger_spark.functions.diversity import diversity_report

    return diversity_report(_load_documents(spark, sf_dir), n=3)


def _o_diversity() -> str:
    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    w = "string_split(text, ' ')"
    gram_list = (
        f"list_transform(range(1, len({w}) - 1), "
        f"i -> array_to_string({w}[i:i+2], ' '))"
    )
    return (
        f"""
WITH toks AS (
  SELECT source, doc_id, unnest({w}) AS tok FROM documents),
 grams AS (
  SELECT source, unnest({gram_list}) AS tok FROM documents),
 vocab AS (
  SELECT DISTINCT tok FROM (
    SELECT tok FROM toks UNION SELECT tok FROM grams)),
"""
        + xxh64_ctes()
        + """,
 t AS (
  SELECT source, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_tokens,
         COUNT(DISTINCT h.h64) AS distinct_tokens
  FROM toks JOIN hashes h USING (tok) GROUP BY source),
 g AS (
  SELECT source, COUNT(*) AS n_ngrams,
         COUNT(DISTINCT h.h64) AS distinct_ngrams
  FROM grams JOIN hashes h USING (tok) GROUP BY source)
SELECT t.source, n_docs, n_tokens, distinct_tokens,
  CAST(COALESCE(distinct_ngrams, 0) AS BIGINT) AS distinct_ngrams,
  CAST((1000 * distinct_tokens) // n_tokens AS BIGINT) AS ttr_milli,
  CAST(CASE WHEN COALESCE(n_ngrams, 0) = 0 THEN 0
       ELSE (1000 * distinct_ngrams) // n_ngrams END AS BIGINT)
    AS ngram_diversity_milli
FROM t LEFT JOIN g ON t.source = g.source
"""
    )


_TEMP_BUDGET = 20_000  # tokens; ~half the sf0.01 corpus so rates land <1000


def q_temperature_mix(spark, sf_dir):
    """Temperature-based source mixing (functions/temperature.py,
    alpha-sampling a la XLM-R/mT5): derive per-source quotas from
    n_s^alpha weights (alpha=1/2 via exact floor-isqrt), allocate by
    largest remainder under a total order, keep rows with the shared
    Knuth-hash threshold. One corpus aggregation; planning windows run
    on the O(sources) frame only. The oracle re-derives weights,
    share/quota chains and the keep-set bit-exactly in DuckDB."""
    from otel_logger_spark.functions.temperature import (
        temperature_mix_report,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_mix_report(docs, _TEMP_BUDGET, alpha="0.5")


def _o_temperature_mix() -> str:
    from otel_logger_spark.functions.temperature import (
        temperature_mix_report_sql,
    )

    return temperature_mix_report_sql("documents", _TEMP_BUDGET, alpha="0.5")


QUERIES_C = {
    "freqcap": q_freqcap,
    "diversity": q_diversity,
    "dedup_exact_stats": q_dedup_exact_stats,
    "dedup_drop_exact": q_dedup_drop_exact,
    "ngram_jaccard": q_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_clusters_two_phase": q_dedup_clusters_two_phase,
    "training_mix": q_training_mix,
    "weighted_sample": q_weighted_sample,
    "minhash_pairs": q_minhash_pairs,
    "simhash_pairs": q_simhash_pairs,
    "embedding_topk": q_embedding_topk,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "lang_id": q_lang_id,
    "text_quality": q_text_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "multimodal_decode": q_multimodal_decode,
    "audio_stats": q_audio_stats,
    "embedding_outliers": q_embedding_outliers,
    "pii_redaction": q_pii_redaction,
    "pack_shards": q_pack_shards,
    "doc_repetition": q_doc_repetition,
    "decontam_split": q_decontam_split,
    "incremental_dedup": q_incremental_dedup,
    "tfidf_terms": q_tfidf_terms,
    "span_dedup": q_span_dedup,
    "snapshot_diff": q_snapshot_diff,
    "dedup_canonical": q_dedup_canonical,
    "normalized_dedup": q_normalized_dedup,
    "token_mix": q_token_mix,
    "fixed_k_sample": q_fixed_k_sample,
    "quantized_ann": q_quantized_ann,
    "ann_ivf_quantized": q_ann_ivf_quantized,
    "semantic_dedup": q_semantic_dedup,
    "leakage_split": q_leakage_split,
    "dsir_select": q_dsir_select,
    "vocab_oov": q_vocab_oov,
    "source_overlap": q_source_overlap,
    "lm_fluency": q_lm_fluency,
    "bigram_fluency": q_bigram_fluency,
    "chunk_windows": q_chunk_windows,
    "image_near_dup": q_image_near_dup,
    "bpe_merges": q_bpe_merges,
    "bpe_encode": q_bpe_encode,
    "hygiene_manifest": q_hygiene_manifest,
    "contamination_profile": q_contamination_profile,
    "temperature_mix": q_temperature_mix,
    "corpus_cartography": q_corpus_cartography,
}

ORACLES_C = {
    "freqcap": O_FREQCAP,
    "diversity": _o_diversity(),
    "dedup_exact_stats": O_DEDUP_EXACT_STATS,
    "dedup_drop_exact": O_DEDUP_DROP_EXACT,
    "ngram_jaccard": O_NGRAM_JACCARD,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "dedup_clusters_two_phase": O_DEDUP_CLUSTERS,
    "training_mix": O_TRAINING_MIX,
    "weighted_sample": _o_weighted_sample(),
    "minhash_pairs": O_MINHASH_PAIRS,
    "simhash_pairs": _o_simhash_pairs(),
    "embedding_topk": O_EMBEDDING_TOPK,
    "embedding_near_dup": O_EMBEDDING_NEAR_DUP,
    "ann_lsh_topk": _o_ann_lsh_topk(),
    "lang_id": O_LANG_ID,
    "text_quality": O_TEXT_QUALITY,
    "doc_fingerprint": O_DOC_FINGERPRINT,
    "multimodal_decode": _o_multimodal_decode(),
    "audio_stats": _o_audio_stats(),
    "embedding_outliers": O_EMBEDDING_OUTLIERS,
    "chunk_windows": _o_chunk_windows(),
    "image_near_dup": _o_image_near_dup(),
    "pii_redaction": _o_pii_redaction(),
    "pack_shards": O_PACK_SHARDS,
    "doc_repetition": _o_doc_repetition(),
    "decontam_split": _o_decontam_split(),
    "incremental_dedup": O_INCREMENTAL_DEDUP,
    "tfidf_terms": _o_tfidf_terms(),
    "span_dedup": _o_span_dedup(),
    "snapshot_diff": _o_snapshot_diff(),
    # {MARKERS} resolves here: _ALL_MARKERS_SQL is defined below the
    # oracle template in this module
    "dedup_canonical": O_DEDUP_CANONICAL.replace("{MARKERS}", _ALL_MARKERS_SQL),
    "normalized_dedup": _o_normalized_dedup(),
    "token_mix": _o_token_mix(),
    "fixed_k_sample": O_FIXED_K_SAMPLE,
    "quantized_ann": _o_quantized_ann(),
    "leakage_split": _o_leakage_split(),
    "vocab_oov": O_VOCAB_OOV,
    "source_overlap": O_SOURCE_OVERLAP,
    "contamination_profile": _o_contamination_profile(),
    "temperature_mix": _o_temperature_mix(),
}

def resolve_lazy_oracles(oracles: dict) -> dict:
    """Round 6 (advisor): the IVF oracle used to be generated AT MODULE
    IMPORT — a DuckDB parquet scan + numpy Lloyd k-means on every import
    of this module (bench runs, plan audits, tests that never touch
    oracles), and an import-time crash if duckdb is unimportable while
    the testdata exists. Now it resolves only where oracles are actually
    consumed (__spark_entry__.oracle_sql / the gate runner); any failure
    degrades that ONE query to the rows-only check instead of breaking
    the module import."""
    out = dict(oracles)
    for name, gen in (
        ("ann_ivf_topk", _o_ann_ivf_topk),
        ("ann_ivf_quantized", _o_ann_ivf_quantized),
        ("semantic_dedup", _o_semantic_dedup),
        ("corpus_cartography", _o_corpus_cartography),
        ("dsir_select", _o_dsir_select),
        ("lm_fluency", _o_lm_fluency),
        ("bigram_fluency", _o_bigram_fluency),
        ("bpe_merges", _o_bpe_merges),
        ("bpe_encode", _o_bpe_encode),
        ("hygiene_manifest", _o_hygiene_manifest),
    ):
        try:
            sql = gen()
        except Exception:
            sql = None
        if sql is not None:
            out[name] = sql
    return out
