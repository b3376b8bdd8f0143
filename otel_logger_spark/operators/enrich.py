"""Enrichment stage: broadcast-joined lookup tables.

Replaces the reference's severity switch (logLevelToSeverity,
/root/reference/main.go:311-328) with a broadcast hash join, and adds the
graft's tool-registry enrichment. Both lookups are tiny -> explicit
``F.broadcast`` so no shuffle of the (huge) fact side ever happens; at
1000 executors this is a map-side-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_logger_spark.schemas import (
    DEFAULT_SEVERITY,
    SEVERITY_ROWS,
    SEVERITY_SCHEMA,
    TOOL_REGISTRY_ROWS,
    TOOL_REGISTRY_SCHEMA,
)


def severity_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SEVERITY_ROWS, SEVERITY_SCHEMA)


def tool_registry_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(TOOL_REGISTRY_ROWS, TOOL_REGISTRY_SCHEMA)


def enrich_severity(df: DataFrame, lookup: DataFrame | None = None) -> DataFrame:
    """Left broadcast join on lowercased level; misses -> 9 (info),
    matching the switch default (main.go:325-326)."""
    spark = df.sparkSession
    lookup = lookup if lookup is not None else severity_lookup_df(spark)
    out = df.join(
        F.broadcast(lookup), F.lower(df["level"]) == lookup["level_key"], "left"
    ).drop("level_key")
    return out.withColumn(
        "severity_num", F.coalesce("severity_num", F.lit(DEFAULT_SEVERITY))
    )


def enrich_tool(df: DataFrame, registry: DataFrame | None = None) -> DataFrame:
    """Left broadcast join on the tool column; unknown tools keep NULL
    category (still routed to the tool_call sink — presence of ``tool``
    drives routing, not registry membership)."""
    spark = df.sparkSession
    registry = registry if registry is not None else tool_registry_df(spark)
    return df.join(F.broadcast(registry), on="tool", how="left")
