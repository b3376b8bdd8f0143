"""Opt-in dictionary encoding for enum-valued string columns (round 8).

The pipeline's bandwidth-bound region is read -> conv_id exchange ->
window coalescer -> parse (BENCH/NOISE.md: the 8v32 ceiling pair is a
memory-traffic measurement). ``role`` and ``tool`` are enum-valued there
("user"/"assistant"/"system"/"tool"; the tool registry), so carrying
them as tinyint codes shrinks every exchanged/sorted row by the string
payload + offset overhead, then one codegen projection decodes after
the parse stage — sink schemas and all downstream semantics unchanged.

Losslessness: values outside the enum (or null) get a NULL code and keep
the original string in a ``<col>_other`` column (all-null in practice =
one bitmap bit per row), so encode -> decode is identity for ARBITRARY
input, not just well-formed corpora — pinned in tests/test_dictenc.py.

Measured A/B at 37M turns before adoption: BENCH/AB_dict_enums.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_logger_spark.schemas import TOOL_REGISTRY_ROWS

ROLE_ENUM: tuple[str, ...] = ("user", "assistant", "system", "tool")

ENCODED_EXTRA_COLS: tuple[str, ...] = ("role_other", "tool_other")


def tool_enum() -> tuple[str, ...]:
    return tuple(r[0] for r in TOOL_REGISTRY_ROWS)


def encode_enum_col(df: DataFrame, col: str, enum: tuple[str, ...]) -> DataFrame:
    """Replace ``col`` with its 1-based tinyint code; unknown/extra values
    keep their string in ``<col>_other`` (NULL code)."""
    m = F.create_map(
        *[F.lit(x) for i, name in enumerate(enum) for x in (name, i + 1)]
    )
    code = F.try_element_at(m, F.col(col)).cast("tinyint")
    return df.withColumn(
        f"{col}_other", F.when(code.isNull(), F.col(col))
    ).withColumn(col, code)


def decode_enum_col(df: DataFrame, col: str, enum: tuple[str, ...]) -> DataFrame:
    """Inverse of encode_enum_col: one ArrayType literal (a single plan
    node, optimizer-trap 14) + try_element_at, coalesced with the escape
    column."""
    arr = F.lit(list(enum))
    return df.withColumn(
        col,
        F.coalesce(
            F.try_element_at(arr, F.col(col).cast("int")),
            F.col(f"{col}_other"),
        ),
    ).drop(f"{col}_other")


def encode_enums(df: DataFrame) -> DataFrame:
    """role + tool -> tinyint codes (the pipeline's enum columns)."""
    return encode_enum_col(
        encode_enum_col(df, "role", ROLE_ENUM), "tool", tool_enum()
    )


def decode_enums(df: DataFrame) -> DataFrame:
    return decode_enum_col(
        decode_enum_col(df, "role", ROLE_ENUM), "tool", tool_enum()
    )
