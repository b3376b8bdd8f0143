"""Snapshot diff — classify every key of two dataset versions as
added / removed / changed / unchanged.

The audit a training-data pipeline runs between ingest generations
("what did the recrawl actually change?") and the safety check before a
destructive swap (operators/compact.py swaps blind on row count; this
operator is the row-level answer). The reference forwards each log batch
exactly once (main.go's per-batch digest accounting); diffing two
*snapshots* is the table-level generalization this engine adds.

Semantics:
- a row's identity is its key columns; its content is the DIGEST of the
  compare columns: ``xxhash64`` (seed 42, Spark's built-in) of the
  compare columns cast to string, NULL encoded as ``chr(0)||'N'``,
  joined by the unit separator ``chr(31)``. Keys present only in ``new``
  are added, only in ``old`` removed, in both with differing digests
  changed, else unchanged.
- digest equality is the DOCUMENTED semantic (gate-oracled bit-exactly
  via the DuckDB XXH64 re-implementation, oracles_xxh64.py); a content
  collision needs two distinct contents on one 64-bit hash (~2^-64 per
  key). ``digest=False`` compares the raw values instead — the exact
  reference, pinned equal by pytest — at the cost of shuffling full rows.
- contract: compare columns must cast to string identically across
  engines (strings/integers/decimals; pre-quantize floats, the repo-wide
  rule) and must not contain the separator byte 0x1F.

Scale shape (pinned by tests/test_snapshot_diff.py):
- each side projects (keys, digest) at the scan — at 100 TB the shuffle
  ships ~24 bytes/row however wide the table is; full rows never move
  (digest mode);
- one full-outer sort-merge join on the key. Snapshots bucketed by the
  key (io.py bucketed writes) join with ZERO exchanges — the diff of two
  bucketed generations is a local per-bucket merge;
- the summary aggregates (group, status) AFTER the join, on rows already
  reduced to integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00N"


def _digest(df: DataFrame, compare_cols: list[str]):
    return F.xxhash64(
        F.concat_ws(
            _SEP,
            *[
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
                for c in compare_cols
            ],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
    include_unchanged: bool = False,
    digest: bool = True,
) -> DataFrame:
    """Row-level diff: (key_cols..., carry_cols..., status). Carry
    columns are taken from ``new`` when the key exists there, else from
    ``old`` (added/changed rows describe the new generation, removed rows
    the old one)."""
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c not in key_cols
        ]
    carry_cols = carry_cols or []
    missing = [
        c for c in key_cols + compare_cols + carry_cols
        if c not in old.columns or c not in new.columns
    ]
    if missing:
        raise ValueError(f"columns absent from one side: {missing}")
    overlap = set(carry_cols) & set(key_cols)
    if overlap:
        raise ValueError(f"carry_cols overlap key_cols: {sorted(overlap)}")

    def side(df: DataFrame, tag: str) -> DataFrame:
        content = (
            _digest(df, compare_cols).alias(f"_c_{tag}")
            if digest
            else F.struct(*compare_cols).alias(f"_c_{tag}")
        )
        return df.select(
            *key_cols, content,
            *[F.col(c).alias(f"_k_{tag}_{c}") for c in carry_cols],
        )

    j = side(old, "o").join(side(new, "n"), key_cols, "full_outer")
    status = (
        F.when(F.col("_c_o").isNull(), "added")
        .when(F.col("_c_n").isNull(), "removed")
        .when(
            ~F.col("_c_o").eqNullSafe(F.col("_c_n")), "changed"
        )
        .otherwise("unchanged")
    )
    out = j.select(
        *key_cols,
        *[
            F.coalesce(F.col(f"_k_n_{c}"), F.col(f"_k_o_{c}")).alias(c)
            for c in carry_cols
        ],
        status.alias("status"),
    )
    return out if include_unchanged else out.filter(
        F.col("status") != "unchanged"
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    group_col: str | None = None,
    digest: bool = True,
) -> DataFrame:
    """(group?, status, n_rows) including the unchanged count — the
    audit record a pipeline logs per generation."""
    d = snapshot_diff(
        old, new, key_cols, compare_cols,
        carry_cols=[group_col] if group_col else None,
        include_unchanged=True, digest=digest,
    )
    keys = ([group_col] if group_col else []) + ["status"]
    return d.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))


def snapshot_diff_summary_sql(
    old_cte: str,
    new_cte: str,
    key_col: str,
    compare_cols: list[str],
    group_col: str | None = None,
) -> str:
    """DuckDB re-derivation over CTEs ``old_cte``/``new_cte`` — the SAME
    xxhash64 digest, replayed bit-for-bit by the DuckDB XXH64 CTE chain
    (oracles_xxh64.py), so digest-mode semantics are gate-checked
    exactly, collisions included. Single key column (the gate shape);
    returns CTE text starting at ``, vocab AS`` — callers prepend their
    own WITH chain defining old/new."""
    from otel_logger_spark.oracles_xxh64 import xxh64_ctes

    enc = "concat_ws(chr(31), " + ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0)||'N')" for c in compare_cols
    ) + ")"
    gsel = f"{group_col}, " if group_col else ""
    gjoin = (
        f"coalesce(n.{group_col}, o.{group_col}) AS {group_col}, "
        if group_col else ""
    )
    return f"""
 , oldv AS (SELECT {gsel}{key_col}, {enc} AS tok FROM {old_cte}),
 newv AS (SELECT {gsel}{key_col}, {enc} AS tok FROM {new_cte}),
 vocab AS (SELECT DISTINCT tok FROM (SELECT tok FROM oldv UNION ALL SELECT tok FROM newv)),{xxh64_ctes()},
 o AS (SELECT {gsel}{key_col}, h64 FROM oldv JOIN hashes USING (tok)),
 n AS (SELECT {gsel}{key_col}, h64 FROM newv JOIN hashes USING (tok)),
 j AS (
   SELECT coalesce(o.{key_col}, n.{key_col}) AS k, {gjoin}
          o.h64 AS od, n.h64 AS nd
   FROM o FULL OUTER JOIN n ON o.{key_col} = n.{key_col}),
 cls AS (
   SELECT {gsel}
          CASE WHEN od IS NULL THEN 'added'
               WHEN nd IS NULL THEN 'removed'
               WHEN od <> nd THEN 'changed'
               ELSE 'unchanged' END AS status
   FROM j)
 SELECT {gsel}status, COUNT(*) AS n_rows FROM cls GROUP BY {"1, 2" if group_col else "1"}
"""
