"""Benchmark decontamination — remove training documents that share any
word n-gram (default 13, the published GPT-3/PaLM convention) with an
evaluation/benchmark set. The training-data op that protects eval
integrity: a contaminated document leaks test answers into the corpus,
and at 100 TB the removal has to be a broadcast filter, not a
corpus-side shuffle.

Scale shape (asserted by tests/test_plan_shapes-style checks in
tests/test_decontam.py):

- the BENCHMARK side is small by construction (eval sets are thousands
  of documents): its distinct n-grams aggregate locally and BROADCAST;
- the corpus side explodes its n-grams (a projection — no shuffle) into
  a broadcast LEFT-SEMI join; only matched (doc_id) survivors — the
  contaminated few — are distinct-aggregated (a shuffle of the SMALL
  hit set, not the corpus);
- the final keep is a broadcast LEFT-ANTI join of the corpus against
  that tiny contaminated-id set. Raw text crosses zero exchanges.

Joins are on the n-gram STRING (exactly re-derivable in the DuckDB
oracle). ``use_hash=True`` joins on ``xxhash64(gram)`` instead — 8
bytes per broadcast entry instead of ~80 for a 13-gram, the right
setting when the benchmark n-gram set is tens of millions; pytest pins
hash-mode equality to string mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.functions.repetition import ngram_join_expr

DEFAULT_N = 13


def _grams(df: DataFrame, cols: list[str], text_col: str, n: int,
           use_hash: bool) -> DataFrame:
    """One row per (cols..., n-gram) — exploded first (a generator can't
    nest inside another expression), hashed in a follow-up projection
    when requested."""
    g = df.select(
        *cols,
        F.explode(
            F.expr(ngram_join_expr(f"split({text_col}, ' ')", n))
        ).alias("_g"),
    )
    return g.withColumn("_g", F.xxhash64("_g")) if use_hash else g


def contaminated_ids(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = False,
) -> DataFrame:
    """Distinct ``id_col`` of every training document sharing at least
    one word n-gram with ``bench``. Documents shorter than n words can
    never be contaminated (they have no n-grams)."""
    bench_grams = _grams(bench, [], text_col, n, use_hash).distinct()
    doc_grams = _grams(docs, [id_col], text_col, n, use_hash)
    return (
        doc_grams.join(F.broadcast(bench_grams), "_g", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = False,
) -> DataFrame:
    """``docs`` minus every document contaminated against ``bench`` —
    schema unchanged, broadcast-anti semantics."""
    hits = contaminated_ids(docs, bench, n, id_col, text_col, use_hash)
    return docs.join(F.broadcast(hits), id_col, "left_anti")


def decontam_summary(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    use_hash: bool = False,
) -> DataFrame:
    """Per-``group_col`` audit: (group, n_docs, n_contaminated, n_kept)
    — the removal accounting a pipeline records before dropping data."""
    hits = contaminated_ids(docs, bench, n, id_col, text_col, use_hash)
    marked = docs.join(
        F.broadcast(hits.withColumn("_hit", F.lit(1))), id_col, "left"
    )
    return marked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_contaminated"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_kept"),
    )


def decontam_summary_sql(
    docs_cte: str = "train",
    bench_cte: str = "bench",
    n: int = DEFAULT_N,
    group_col: str = "source",
) -> str:
    """DuckDB re-derivation over CTEs ``train(doc_id, source, text)`` and
    ``bench(text)`` — identical tokenization (split on single space),
    identical n-gram windows, string-equality contamination."""
    words = "string_split(text, ' ')"
    grams = (
        f"list_transform(range(1, len({words}) - {n - 2}), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' '))"
    )
    return f""",
 bg AS (SELECT DISTINCT unnest({grams}) AS g FROM {bench_cte}
        WHERE len({words}) >= {n}),
 tg AS (SELECT doc_id, unnest({grams}) AS g FROM {docs_cte}
        WHERE len({words}) >= {n}),
 hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (g))
 SELECT t.{group_col}, COUNT(*) AS n_docs,
   CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
     AS n_contaminated,
   CAST(SUM(CASE WHEN h.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
     AS n_kept
 FROM {docs_cte} t LEFT JOIN hits h ON h.doc_id = t.doc_id
 GROUP BY 1"""


def contamination_profile(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    use_hash: bool = False,
) -> DataFrame:
    """(group, decile, n_docs): the distribution of per-document
    contamination SHARE — what fraction of a doc's n-gram occurrences
    appear in the benchmark — bucketed into deciles (0..10, 10 = fully
    contaminated). The binary keep/drop above hides severity: a corpus
    where hits are 2% quotation overlap and one where they are verbatim
    eval copies decontaminate identically but are different problems
    (the Dolma/RedPajama-style audit).

    Same 100 TB shape as the summary: benchmark grams BROADCAST; the
    corpus side is explode_outer (NULL row keeps sub-n-word docs in the
    profile at decile 0) -> broadcast left probe -> per-doc aggregate
    that collapses map-side (explode preserves partition locality), so
    the one exchange moves a count row per doc; the decile histogram is
    a tiny final aggregate. Raw text crosses zero exchanges.

    The two stages are exposed separately (``contamination_per_doc`` +
    ``profile_from_per_doc``) because the per-doc rows are the natural
    STREAMING partial: a document lives wholly inside one micro-batch,
    so per-batch per-doc counts union losslessly and the histogram
    finalizes over them (streaming/analytics.py, round 8)."""
    return profile_from_per_doc(
        contamination_per_doc(docs, bench, n, id_col, text_col, group_col,
                              use_hash),
        group_col=group_col,
    )


def contamination_per_doc(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    use_hash: bool = False,
) -> DataFrame:
    """(id_col, group_col, n_grams, n_hit) per document — the profile's
    first stage and the streaming partial row (see contamination_profile)."""
    bench_g = (
        _grams(bench, [], text_col, n, use_hash)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    g = docs.select(
        id_col,
        group_col,
        F.explode_outer(
            F.expr(ngram_join_expr(f"split({text_col}, ' ')", n))
        ).alias("_g"),
    )
    if use_hash:
        # null-preserving: xxhash64(NULL) would yield the seed constant,
        # a phantom joinable value
        g = g.withColumn(
            "_g", F.when(F.col("_g").isNotNull(), F.xxhash64("_g"))
        )
    return (
        g.join(F.broadcast(bench_g), "_g", "left")
        .groupBy(id_col, group_col)
        .agg(
            F.count_if(F.col("_g").isNotNull()).alias("n_grams"),
            F.count_if(F.col("_hit").isNotNull()).alias("n_hit"),
        )
    )


def profile_from_per_doc(
    per_doc: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """(group, decile, n_docs) from per-doc contamination counts — the
    profile's tiny final aggregate, shared by batch and the streaming
    finalizer."""
    decile = F.when(F.col("n_grams") == 0, F.lit(0).cast("int")).otherwise(
        F.expr("CAST(((1000 * n_hit) DIV n_grams) DIV 100 AS INT)")
    )
    return (
        per_doc.withColumn("decile", decile)
        .groupBy(group_col, "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def contamination_profile_sql(
    docs_cte: str = "train",
    bench_cte: str = "bench",
    n: int = DEFAULT_N,
    group_col: str = "source",
) -> str:
    """DuckDB re-derivation of contamination_profile over CTEs
    ``docs_cte(doc_id, {group_col}, text)`` and ``bench_cte(text)``."""
    words = "string_split(text, ' ')"
    grams = (
        f"list_transform(range(1, len({words}) - {n - 2}), "
        f"i -> array_to_string({words}[i:i+{n - 1}], ' '))"
    )
    return f""",
 bg AS (SELECT DISTINCT unnest({grams}) AS g FROM {bench_cte}
        WHERE len({words}) >= {n}),
 tgm AS (SELECT doc_id, {group_col}, unnest({grams}) AS g FROM {docs_cte}
         WHERE len({words}) >= {n}),
 pd AS (SELECT doc_id, {group_col}, COUNT(*) AS n_grams,
          SUM(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM tgm LEFT JOIN bg b USING (g) GROUP BY 1, 2),
 allpd AS (SELECT * FROM pd
           UNION ALL
           SELECT doc_id, {group_col}, 0, 0 FROM {docs_cte}
           WHERE len({words}) < {n}),
 dec AS (SELECT {group_col},
           CASE WHEN n_grams = 0 THEN 0
                ELSE CAST(((1000 * n_hit) // n_grams) // 100 AS INT)
           END AS decile
         FROM allpd)
 SELECT {group_col}, decile, COUNT(*) AS n_docs
 FROM dec GROUP BY 1, 2"""
