"""Per-source frequency capping — the RefinedWeb/C4-style guard against
any single domain/source dominating a training mix (Penedo et al. 2023,
arXiv:2306.01116 §3.1 cap repeated URL/domain contributions; C4 caps
three-sentence spans per domain). The engine rule: keep at most
``max_per_group`` documents per group under a deterministic TOTAL order —
(quality key DESC, doc_id ASC) — so the kept set is reproducible in any
engine and stable under retries.

Scale shape (100 TB): the rank is a window over a NARROW projection
(group, order key, id) — document text never enters the exchange; the
kept-id set then re-attaches by id. ``frequency_cap`` uses a shuffled
left-semi join on doc_id (one text exchange, the dedup-drop shape) —
correct for billions of kept ids where a broadcast would not fit;
``freqcap_report`` aggregates the narrow frame directly (zero text
exchanges). A group's rank partition is its doc COUNT, not its bytes —
skewed sources are count-skew, handled by AQE skew-join on the semi join
and irrelevant to the narrow window (ids only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked_ids(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
) -> DataFrame:
    """(id_col, group_col, _rank) on the narrow projection: rank 1 = best
    under (order_col DESC, id ASC) — a total order, so deterministic."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return df.select(group_col, order_col, id_col).withColumn(
        "_rank", F.row_number().over(w)
    )


def frequency_cap(
    df: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rows of ``df`` that survive the cap (schema unchanged)."""
    if max_per_group < 1:
        raise ValueError(f"max_per_group must be positive: {max_per_group}")
    kept = (
        _ranked_ids(df, group_col, order_col, id_col)
        .filter(F.col("_rank") <= max_per_group)
        .select(id_col)
    )
    return df.join(kept, id_col, "left_semi")


def freqcap_report(
    df: DataFrame,
    max_per_group: int,
    group_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group, n_docs, n_kept, n_dropped, min_kept_key): per-group
    accounting of the cap, plus the order-key value at the cap boundary
    (the smallest kept key — what a doc needed to survive; NULL-free:
    groups under the cap report their weakest member). All integers."""
    if max_per_group < 1:
        raise ValueError(f"max_per_group must be positive: {max_per_group}")
    r = _ranked_ids(df, group_col, order_col, id_col)
    return r.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_rank") <= max_per_group).cast("long")).alias("n_kept"),
        F.sum((F.col("_rank") > max_per_group).cast("long")).alias("n_dropped"),
        F.min(
            F.when(F.col("_rank") <= max_per_group, F.col(order_col))
        ).cast("long").alias("min_kept_key"),
    )
