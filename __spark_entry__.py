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


# The driver verifies the FIRST 50 entries of the merged queries() dict
# (round-6 verdict: list(merged)[:50]). With more than 50 gates, ordering
# is a correctness decision: any query whose engine or oracle code changed
# in the current round MUST sit inside that window, and only queries that
# were driver-verified green on unchanged code in the previous round may
# be deferred past it. GATE_DEFERRED is this round's explicit rotation —
# every name in it was green in CORRECTNESS_r06.json and its code is
# untouched in round 7. Rotate the list each round so no query goes more
# than one round without driver verification.
GATE_DEFERRED: list[str] = [
    # Round-8 rotation: ALL 17 round-7 deferrals are back inside the window
    # (VERDICT r7 #3); the names below were driver-green in
    # CORRECTNESS_r07.json and their engine + oracle code is untouched in
    # round 8.
    "dedup_exact_stats",
    "dedup_drop_exact",
    "minhash_pairs",
    "embedding_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "doc_fingerprint",
    "pii_redaction",
    "pack_shards",
    "doc_repetition",
    "span_dedup",
    "normalized_dedup",
    "fixed_k_sample",
    "log_templates",
    "pivot_role_severity",
    "asof_latest_signup",
    "asof_next_purchase",
    "range_click_incidents",
    "sessionization",
    "zorder_buckets",
    # deferred mid-round-8 to make window room for the two NEW queries
    # (temperature_mix, corpus_cartography): r7-green, engine
    # (queries_extra.py) and oracle (oracles_hll.py) untouched in r8.
    "approx_distinct",
    # deferred late-round-8 to make window room for the NEW audio_stats
    # and embedding_outliers queries: r7-green, engines
    # (operators/funnel.py, functions/dsir.py) and oracles untouched
    # in r8.
    "funnel",
    "dsir_select",
    "leakage_split",
    "source_overlap",
    "token_mix",
    "cms_counts",
    "exact_percentiles",
    "rate_spikes",
]


def _gate_order(merged: dict) -> dict:
    """Deferred queries last; everything else keeps insertion order."""
    deferred = [n for n in GATE_DEFERRED if n in merged]
    head = {n: v for n, v in merged.items() if n not in set(deferred)}
    return {**head, **{n: merged[n] for n in deferred}}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from otel_logger_spark.queries import QUERIES_AB
    from otel_logger_spark.queries_extra import QUERIES_X
    from otel_logger_spark.queries_training import QUERIES_C

    return _gate_order({**QUERIES_AB, **QUERIES_C, **QUERIES_X})


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
