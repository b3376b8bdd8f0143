"""Sequence packing / token-budget sharding — the last step of a
training-data pipeline: after dedup (functions/dedup.py), quality
filtering (functions/text.py) and mixture sampling
(functions/sampling.py), documents are assigned to fixed-token-budget
shards for the trainer.

Semantics: CONCATENATE-AND-CHUNK sharding (the standard corpus-shard
recipe). Within each (group, bucket) stream, documents ordered by the
order column fill a virtual token stream; a document belongs to the
shard its FIRST token lands in: ``pack_id = start_offset DIV budget``
with ``start_offset`` the exclusive running token sum. Documents are
atomic (never split), so a document longer than the budget owns its
shard and the following document starts past it — pack ids are sparse
exactly when that happens. Everything is integer arithmetic over a
running window sum: deterministic under retries, identically
re-derivable in SQL.

Scale shape: a single global ordering would serialize the window on one
partition, so packing runs within (group_cols, order_col % n_buckets)
streams — embarrassingly parallel, one shuffle on the stream key, and
deterministic (the bucket function is plain modulo so the DuckDB oracle
replays it; at production scale any key-spreading function works the
same way). Shard-size uniformity comes from the budget, not from the
bucket count. ``n_buckets`` is REQUIRED and is part of the manifest's
identity (round 7, advisor): a config-derived default (round 6 used
``spark.sql.shuffle.partitions``) made the same code produce different
pack manifests on different clusters, at odds with the repo's
determinism discipline. Callers choose the bucket count exactly like
the token budget — both are data-contract parameters, not tuning knobs
— and serializing a group's whole stream through one partition requires
an explicit ``n_buckets=1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _resolve_buckets(n_buckets: int) -> int:
    """Explicit values only — n_buckets is part of the manifest contract
    (see module docstring); n_buckets=1 (a single serialized stream per
    group) is a deliberate choice, never a silent default."""
    if n_buckets is None or n_buckets < 1:
        raise ValueError(f"n_buckets must be an explicit int >= 1: {n_buckets}")
    return int(n_buckets)


def pack_documents(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    *,
    n_buckets: int,
) -> DataFrame:
    """Assign every document to its shard. Returns the input columns plus
    ``bucket``, ``start_offset`` and ``pack_id``."""
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    n_buckets = _resolve_buckets(n_buckets)
    g = list(group_cols)
    w = (
        Window.partitionBy(*g, "bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("bucket", F.pmod(F.col(order_col), F.lit(n_buckets)))
        .withColumn(
            "start_offset", F.sum(token_col).over(w) - F.col(token_col)
        )
        .withColumn("pack_id", F.expr(f"start_offset DIV {budget}"))
    )


def pack_stats(
    df: DataFrame,
    budget: int,
    token_col: str,
    order_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    *,
    n_buckets: int,
) -> DataFrame:
    """Per-shard manifest: (group..., bucket, pack_id, n_docs, n_tokens,
    first_doc, last_doc, fill_pct) — what a trainer's data loader
    consumes. ``fill_pct`` = (100 * n_tokens) DIV budget makes shard
    quality observable: ~100 for well-packed shards, < 100 for each
    stream's tail shard, > 100 exactly when an oversized atomic document
    owns the shard. Integer-typed (exact, engine-portable)."""
    packed = pack_documents(df, budget, token_col, order_col, group_cols, n_buckets=n_buckets)
    return packed.groupBy(*group_cols, "bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("n_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    ).withColumn("fill_pct", F.expr(f"(100 * n_tokens) DIV {budget}"))
