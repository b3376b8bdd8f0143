"""Per-document salient-term extraction (TF-IDF family), division-free.

Training-data pipelines tag documents with their most distinctive terms
(topic routing, dedup explanations, quality triage). The classic score is
tf * log(N/df); floats hash differently across engines, so — like
``sampling.weighted_sample`` and ``anomaly.rate_spikes`` — this operator
defines its semantics in exact integer arithmetic instead:

    score_milli = tf * ((1000 * N) div df)

i.e. idf is the inverse document frequency N/df at milli precision with
no logarithm. For a FIXED term, score is monotone in tf exactly as
tf-idf is; across terms the log-free weighting leans harder on rarity —
an explicitly documented semantic of this operator, re-derived verbatim
by the DuckDB gate oracle (``tfidf_terms``), not an approximation of the
float formula. Ties rank by term ascending, so top-k is deterministic.

Scale shape (the only two shuffles the math needs):
- tf: explode words -> groupBy (doc, term) with map-side partials.
- df: groupBy term over the (doc, term) pairs; joined back on term.
  Both sides of that join are keyed by term — a plain shuffled equi-join
  that AQE broadcasts when the vocabulary is small.
- top-k: one bounded window per doc (rank <= k cuts early).
Stopwords are the skew hazard: a term in every document makes a hot join
key AND a meaningless score. ``max_df`` drops terms above a document-
frequency ceiling before scoring; pair it with ``df_cap_report`` so the
exclusion is never silent (same discipline as dedup's bucket caps).

int64 exactness: idf_milli <= 1000*N (df=1), so tf * idf_milli can wrap
for tf > (2^63-1)/(1000*N). The bound is enforced in-plan with
assert_true routed through the score column (the rate_spikes pattern) —
past it the job fails loudly instead of ranking by wrapped negatives.
1000*N itself stays exact through N < 9.2e15 documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the int64 ceiling the score guard enforces; a module constant so tests
# can shrink it to prove the error path fires (real overflow needs
# tf > (2^63-1)/(1000*N) — not constructible at test scale)
_SCORE_CAP = 9223372036854775807


def doc_term_freq(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf) — whitespace tokens, empties dropped (double spaces
    produce empty tokens in both engines; the oracle filters identically)."""
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def doc_freq(tf: DataFrame) -> DataFrame:
    """(term, dfreq) over the distinct (doc, term) pairs tf already is."""
    return tf.groupBy("term").agg(F.count("*").alias("dfreq"))


def df_cap_report(df: DataFrame, max_df: int, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """No-silent-caps accounting for the ``max_df`` stopword guard: ONE
    row — excluded_terms (vocabulary entries above the ceiling),
    excluded_postings ((doc, term) pairs those terms carried),
    max_dfreq."""
    d = doc_freq(doc_term_freq(df, text_col, id_col))
    return d.agg(
        F.coalesce(
            F.sum((F.col("dfreq") > max_df).cast("long")), F.lit(0)
        ).alias("excluded_terms"),
        F.coalesce(
            F.sum(F.when(F.col("dfreq") > max_df, F.col("dfreq")).otherwise(0)),
            F.lit(0),
        ).alias("excluded_postings"),
        F.coalesce(F.max("dfreq"), F.lit(0)).alias("max_dfreq"),
    )


def salient_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Top-k (doc_id, rn, term, tf, dfreq, score_milli) per document by
    the division-free integer score (module docstring). ``max_df`` drops
    terms in more than max_df documents before scoring (stopword/skew
    guard — report exclusions via df_cap_report)."""
    tf = doc_term_freq(df, text_col, id_col)
    # dfreq as a COUNT window over tf's own term partitioning, not a
    # groupBy(term) + join back (round 9): Catalyst has no cross-branch
    # CSE, so the join form re-ran the whole explode+aggregate tf pass on
    # each side — this computes tf once, with the identical (term) and
    # (doc) exchanges the math needs and row-identical output (inner join
    # on term == every tf row gets its term's count; the max_df filter
    # drops the same rows either way).
    tfd = tf.withColumn(
        "dfreq", F.count("*").over(Window.partitionBy("term"))
    )
    if max_df is not None:
        tfd = tfd.filter(F.col("dfreq") <= max_df)
    n = df.agg(F.countDistinct(id_col).alias("_n_docs"))
    scored = (
        tfd.crossJoin(F.broadcast(n))
        .withColumn(
            "_idf_milli", F.expr("(1000L * _n_docs) div dfreq")
        )
        .withColumn(
            "score_milli",
            F.when(
                F.assert_true(
                    F.col("tf")
                    <= F.expr(f"{_SCORE_CAP}L div _idf_milli"),
                    F.concat(
                        F.lit("salient_terms: tf * idf_milli exceeds int64 "
                              "for term "),
                        F.col("term"),
                        F.lit(" — raise max_df or shard the corpus so "
                              "1000*N/df shrinks"),
                    ),
                ).isNull(),
                F.col("tf") * F.col("_idf_milli"),
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select(id_col, "rn", "term", "tf", "dfreq", "score_milli")
    )


def salient_terms_sql(docs_rel: str, k: int = 3, id_col: str = "doc_id") -> str:
    """The identical computation as DuckDB SQL over relation ``docs_rel``
    (columns id_col, text) — integer div, same tokenization, same tie
    order; used by the gate oracle and the parity tests."""
    return f"""
 toks AS (SELECT {id_col}, unnest(string_split(text, ' ')) AS term FROM {docs_rel}),
 tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM toks WHERE term <> ''
        GROUP BY {id_col}, term),
 dfq AS (SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term),
 n AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {docs_rel}),
 scored AS (SELECT t.{id_col}, t.term, t.tf, d.dfreq,
        CAST(t.tf * ((1000 * n.n_docs) // d.dfreq) AS BIGINT) AS score_milli
      FROM tf t JOIN dfq d USING (term) CROSS JOIN n),
 ranked AS (SELECT *, row_number() OVER (PARTITION BY {id_col}
        ORDER BY score_milli DESC, term) AS rn FROM scored)
 SELECT {id_col}, rn, term, tf, dfreq, score_milli FROM ranked WHERE rn <= {k}"""
