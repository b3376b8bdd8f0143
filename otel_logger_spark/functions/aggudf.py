"""Grouped-aggregate pandas UDFs (SURVEY.md §2.9).

NOTE: no ``from __future__ import annotations`` here — pandas_udf infers
the UDF kind from *evaluated* type hints, and stringified annotations break
the grouped-agg signature detection.
"""

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def p50_long(values: pd.Series) -> int:
    """Exact median (linear interpolation, floor to integer) — matches
    DuckDB's quantile_cont for the oracle."""
    g = values.dropna()
    if g.empty:
        return None
    return int(math.floor(g.quantile(0.5, interpolation="linear")))
