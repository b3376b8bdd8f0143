"""Context-window chunking: split long documents into overlapping
fixed-size token windows — the step between cleaning and sequence
packing in an LLM data pipeline (every doc longer than the model's
context must become stride-overlapped windows; packing.py then bins the
windows into shards).

Chunk grammar (exact integers, replayable in SQL):

  n        = token count (split on space)
  size     = window size in tokens,  stride = size - overlap
  n_chunks = 1                         if n <= size
             1 + ceil((n - size) / stride)   otherwise
  chunk i  = tokens[i*stride : i*stride + size]   (last one may be short)

The last window is NEVER dropped (a silent tail drop loses corpus mass
— the no-silent-caps discipline), so the final chunk covers the tail
even when shorter than ``size``.

100 TB shape: the whole operator is ONE codegen projection + explode —
``transform(sequence(0, n_chunks-1), i -> struct(...))`` over the
in-place token array, then posexplode. No shuffle, no UDF, no window
function; text leaves its scan partition only as the emitted chunk
rows. ceil is computed division-free as ``(n - size + stride - 1) DIV
stride`` on non-negative operands (Spark DIV == DuckDB // there)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per context window: (id, *carry, chunk_idx, chunk_start,
    n_chunk_tokens, chunk_text). chunk_start is the 1-based token
    position of the window's first token (the provenance pointer a
    packing manifest needs)."""
    if size < 1:
        raise ValueError(f"size must be positive: {size}")
    if not (0 <= overlap < size):
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < size: {overlap} vs {size}"
        )
    stride = size - overlap
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    n_chunks = F.when(n <= size, F.lit(1)).otherwise(
        F.lit(1)
        + F.expr(
            f"(size(split({text_col}, ' ')) - {size} + {stride} - 1) "
            f"DIV {stride}"
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            (i * stride + 1).cast("long").alias("chunk_start"),
            F.slice(words, i * stride + 1, size).alias("_toks"),
        ),
    )
    return df.select(
        id_col, *carry_cols, F.explode(chunks).alias("c")
    ).select(
        id_col,
        *carry_cols,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_start").alias("chunk_start"),
        F.size("c._toks").cast("long").alias("n_chunk_tokens"),
        F.array_join("c._toks", " ").alias("chunk_text"),
    )


def chunk_report(
    df: DataFrame,
    size: int,
    overlap: int = 0,
    group_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, n_chunks, n_full_chunks, sum_chunk_tokens,
    max_chunks_per_doc): conservation accounting for the chunker —
    sum_chunk_tokens ties out against sum(n + overlap*(chunks-1)) per
    doc, so a dropped tail or double-counted overlap is visible."""
    ch = chunk_documents(df, size, overlap, text_col, id_col, (group_col,))
    per_doc = ch.groupBy(id_col, group_col).agg(
        F.count(F.lit(1)).alias("_nc"),
        F.sum("n_chunk_tokens").alias("_tok"),
        F.sum((F.col("n_chunk_tokens") == size).cast("long")).alias("_full"),
    )
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nc").alias("n_chunks"),
        F.sum("_full").alias("n_full_chunks"),
        F.sum("_tok").alias("sum_chunk_tokens"),
        F.max("_nc").alias("max_chunks_per_doc"),
    )
