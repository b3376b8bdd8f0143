"""As-of (point-in-time) join — a first-class log/training-pipeline
operator Spark's DataFrame API lacks natively: for every left row, attach
the single right row with the greatest (backward) or smallest (forward)
``on`` value at-or-before (at-or-after) the left row's, per ``by`` key.
The workhorse of config-version attribution ("which tool-registry version
was live when this turn ran?"), feature point-in-time correctness, and
latest-state enrichment — all cases where an equi-join is wrong and a
range cross-join explodes.

Spark-first formulation (no UDF, no per-key loop, no range explosion):
tag both sides, UNION them, and carry the right side's values forward with
``last(..., ignorenulls=True)`` over a (by, on, side)-ordered window —
one shuffle on ``by``, incremental window state, linear work. The same
shape pandas' merge_asof computes per-group, but distributed: a 10^12-row
left side costs one exchange + one sort, identical to the sort-merge join
Spark would run for an equi-join on ``by``.

Ties: right rows sort BEFORE left rows at an equal ``on`` instant, so
"at-or-before" is inclusive (merge_asof semantics). ``right`` must be
unique per (by, on) — pre-aggregate if not (duplicate instants would make
any engine's choice arbitrary; DuckDB's ASOF JOIN — the oracle — picks
nondeterministically, so uniqueness is the portable contract).

Cited reference scope: the reference engine has no as-of operator
(/root/reference/main.go is a forwarder); this extends the training-data
suite the same way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | tuple[str, ...] = ("user_id",),
    direction: str = "backward",
    tolerance_ms: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join: every ``left`` row, plus the matched right
    row's value columns (renamed with ``suffix`` on collision) and the
    matched instant as ``{on}{suffix}``; unmatched rows keep NULLs.

    - ``direction="backward"``: greatest right ``on`` <= left ``on``.
    - ``direction="forward"``: smallest right ``on`` >= left ``on``.
    - ``tolerance_ms``: maximum |left.on - right.on| in milliseconds
      (timestamp ``on`` columns); matches farther away are nulled out,
      like merge_asof's tolerance.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction!r}")
    by = list(by)
    rvals = [c for c in right.columns if c not in set(by) | {on}]
    lcols = left.columns
    carried = {c: (c + suffix if c in lcols else c) for c in rvals}
    on_r = on + suffix
    # internal/output name collisions fail LOUDLY up front: a left column
    # named `_side` (the union tag) or equal to an output carry name
    # (on+suffix, or a suffixed right value column) would otherwise produce
    # duplicate/ambiguous columns deep in the union-window plan
    reserved = {"_side", on_r} | set(carried.values())
    clash = sorted(reserved & set(lcols))
    if clash:
        raise ValueError(
            f"asof_join internal/output names collide with left columns "
            f"{clash}; rename them or pass a different suffix ({suffix!r})"
        )
    out_names = ["_side", on_r] + list(carried.values())
    if len(set(out_names)) != len(out_names):
        dupes = sorted({n for n in out_names if out_names.count(n) > 1})
        raise ValueError(
            f"asof_join suffixed right columns collide with each other or "
            f"with internal names {dupes}; rename them or pass a different "
            f"suffix ({suffix!r})"
        )

    rt = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        F.col(on).alias(on_r),
        *[F.col(c).alias(carried[c]) for c in rvals],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in set(by) | {on}],
    )
    lt = left.select(
        *by,
        F.col(on).alias(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[on].dataType).alias(on_r),
        *[F.lit(None).cast(right.schema[c].dataType).alias(carried[c]) for c in rvals],
        *[F.col(c) for c in lcols if c not in set(by) | {on}],
    )
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("_side").asc())  # right first at equal instants
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_cols = [on_r] + [carried[c] for c in rvals]
    u = rt.unionByName(lt)
    for c in carry_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).drop("_side")
    if tolerance_ms is not None:
        gap = F.unix_micros(F.col(on).cast("timestamp")) - F.unix_micros(
            F.col(on_r).cast("timestamp")
        )
        if direction == "forward":
            gap = -gap
        keep = F.col(on_r).isNotNull() & (gap <= int(tolerance_ms) * 1000)
        for c in carry_cols:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    # restore the caller's column order: left columns, then the carries
    return out.select(*lcols, *carry_cols)
