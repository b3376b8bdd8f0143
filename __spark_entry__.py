"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline query (parse -> enrich -> severity
rollup) over transcripts constructed from sf0.001 events.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2 (see otel_logger_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full parse -> enrich ->
    route chain over constructed transcripts, severity counts."""
    from otel_logger_spark.queries import q_parse_severity_counts

    return q_parse_severity_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from otel_logger_spark.queries import QUERIES_AB
    from otel_logger_spark.queries_extra import QUERIES_X
    from otel_logger_spark.queries_training import QUERIES_C

    return {**QUERIES_AB, **QUERIES_C, **QUERIES_X}


def oracle_sql() -> dict[str, str]:
    from otel_logger_spark.queries import ORACLES_AB
    from otel_logger_spark.queries_extra import ORACLES_X
    from otel_logger_spark.queries_training import (
        ORACLES_C,
        resolve_lazy_oracles,
    )

    # the IVF oracle trains k-means on the gate input — resolved here,
    # not at module import (see resolve_lazy_oracles)
    return {**ORACLES_AB, **resolve_lazy_oracles(ORACLES_C), **ORACLES_X}
