"""DuckDB oracle generator for DSIR importance-resampling selection.

Independence contract (functions/dsir.py module docstring): this side
re-derives tokenization, XXH64 bucketing (oracles_xxh64, bit-for-bit),
both bucket-count vectors, per-doc scores and the top-k ranking
entirely in DuckDB SQL; the ONLY shared code with the engine is
``importance_weights`` — the lambda formula both engines feed their
own counts into. If Spark's and DuckDB's counts disagree anywhere, the
lambda literals disagree and the gate fails loudly.
"""

from __future__ import annotations

import duckdb

from otel_logger_spark.functions.dsir import importance_weights
from otel_logger_spark.graftdata import corpus_cte
from otel_logger_spark.oracles_xxh64 import xxh64_ctes


def _tok_ctes() -> str:
    """corpus -> toks(doc_id, lang, tok): unigrams + whitespace-joined
    bigrams, with multiplicity (DSIR counts occurrences). Mirrors
    functions/dsir.with_feature_buckets' split/zip_with exactly:
    ``string_split`` on a single space, bigram = w[i] || ' ' || w[i+1],
    and a one-word doc contributes no bigrams (generate_series(1, 0) is
    empty, as is Spark's zero-length slice)."""
    return """
 , dw AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM corpus),
 toks AS (
   SELECT doc_id, lang, unnest(w) AS tok FROM dw
   UNION ALL
   SELECT doc_id, lang,
          unnest(list_transform(generate_series(1, len(w) - 1),
                                i -> w[i] || ' ' || w[i + 1])) AS tok
   FROM dw),
 vocab AS (SELECT DISTINCT tok FROM toks),"""


def dsir_bucket_counts(
    docs_path: str, n_buckets: int, target_lang: str
) -> tuple[list[int], list[int]]:
    """(target_counts, source_counts), dense, via one DuckDB query.
    Source = the whole corpus; target = its ``lang = target_lang``
    subset — the same legs the Spark gate measures."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_path}')"
    )
    rows = con.execute(
        corpus_cte()
        + _tok_ctes()
        + xxh64_ctes()
        + f""",
 tb AS (SELECT t.doc_id, t.lang, CAST(h.h64 % {n_buckets} AS INT) AS b
        FROM toks t JOIN hashes h USING (tok))
 SELECT b, COUNT(*) AS src_c,
        COUNT(*) FILTER (WHERE lang = '{target_lang}') AS tgt_c
 FROM tb GROUP BY b"""
    ).fetchall()
    con.close()
    tgt, src = [0] * n_buckets, [0] * n_buckets
    for b, src_c, tgt_c in rows:
        src[b], tgt[b] = src_c, tgt_c
    return tgt, src


def dsir_select_oracle(
    docs_path: str,
    k: int = 100,
    n_buckets: int = 1024,
    target_lang: str = "en",
) -> str:
    """The full selection oracle: derives both count vectors from the
    gate's own input (above), feeds them through the shared lambda
    formula, and embeds the integer lambdas as ONE list literal in a
    self-contained scoring + top-k query."""
    tgt, src = dsir_bucket_counts(docs_path, n_buckets, target_lang)
    lam = importance_weights(tgt, src)
    lam_lit = "[" + ", ".join(str(x) for x in lam) + "]::BIGINT[]"
    return (
        corpus_cte()
        + _tok_ctes()
        + xxh64_ctes()
        + f""",
 lamt AS (SELECT {lam_lit} AS lam),
 tb AS (SELECT t.doc_id, t.lang, CAST(h.h64 % {n_buckets} AS INT) AS b
        FROM toks t JOIN hashes h USING (tok)),
 scores AS (SELECT doc_id, lang,
                   CAST(SUM(lam[b + 1]) AS BIGINT) AS dsir_score
            FROM tb CROSS JOIN lamt GROUP BY doc_id, lang)
 SELECT doc_id, dsir_score, lang FROM scores
 ORDER BY dsir_score DESC, doc_id ASC LIMIT {k}"""
    )
