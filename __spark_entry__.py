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
# be deferred past it. GATE_DEFERRED is this round's explicit rotation;
# rotate the list each round so no query goes more than one round
# without driver verification.
GATE_DEFERRED: list[str] = [
    # Round-9 rotation (optimization round): ALL 29 round-8 deferrals are
    # back inside the window (VERDICT r8 #1). Deferred instead are
    # round-8-verified gates whose engine AND oracle code is untouched in
    # round 9 — the optimization work concentrated in dedup.py, graph.py,
    # ivf.py, quantize.py, similarity.py, lmscore.py, bigram.py,
    # tfidf.py, dsir.py, quantiles.py and specific queries_training.py
    # functions, so every gate on a touched module (or touched q_
    # function) sits in the verified window — including bpe_merges/
    # bpe_encode, whose ORACLE gained a deterministic ORDER BY this
    # round; the parse/pipeline cluster, mixes and the text.py family
    # are untouched (diff-checkable against ae9a086). All 29 below were
    # green in
    # CORRECTNESS_r08.json, and the full 79-gate set was re-verified
    # green against the sf0.01 DuckDB oracle in this round's closing
    # sweep (tools/check_correctness.py).
    "parse_event_ts",
    "parse_messages_attrs",
    "level_precedence",
    "multiline_entry_stats",
    "route_sink_counts",
    "conversation_rollup",
    "window_turn_rollup",
    "top_k_noisy",
    "flush_window_counts",
    "summary_union",
    "pricing_summary",
    "top_revenue_orders",
    "region_rollup",
    "distinct_users",
    "freqcap",
    "diversity",
    "training_mix",
    "weighted_sample",
    "lang_id",
    "decontam_split",
    "snapshot_diff",
    "vocab_oov",
    "chunk_windows",
    "parse_severity_counts",
    "text_quality",
    "contamination_profile",
    "temperature_mix",
    "median_gap",
    "rollup_role_style",
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
