"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The flagship number is the end-to-end pipeline (parse -> enrich -> route ->
aggregate -> sink writes) over transcripts constructed from the events
table; turns/sec is included for the BASELINE.md protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from otel_logger_spark import queries as Q
    from otel_logger_spark.operators.rollups import conversation_metrics
    from otel_logger_spark.operators.sinks import write_routed_sinks
    from otel_logger_spark.session import get_spark

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.monotonic()
        fn()
        timings[name] = round(time.monotonic() - t0, 3)

    # warm the JVM + Python workers once (not timed)
    Q.q_parse_severity_counts(spark, sf_dir).collect()

    n_turns = spark.read.parquet(f"{sf_dir}/events.parquet").count()

    out_dir = tempfile.mkdtemp(prefix="bench_sinks_")
    try:
        # flagship: full pipeline incl. fan-out sink writes
        def full_pipeline():
            routed = Q._routed(spark, sf_dir)
            write_routed_sinks(
                routed, conversation_metrics(routed), out_dir, run_id="bench"
            )

        run("full_pipeline", full_pipeline)
        run("parse_severity_counts", lambda: Q.q_parse_severity_counts(spark, sf_dir).collect())
        run("multiline_entry_stats", lambda: Q.q_multiline_entry_stats(spark, sf_dir).collect())
        run("conversation_rollup", lambda: Q.q_conversation_rollup(spark, sf_dir).collect())
        run("window_turn_rollup", lambda: Q.q_window_turn_rollup(spark, sf_dir).collect())
        run("flush_window_counts", lambda: Q.q_flush_window_counts(spark, sf_dir).collect())
        run("pricing_summary", lambda: Q.q_pricing_summary(spark, sf_dir).collect())
        run("top_revenue_orders", lambda: Q.q_top_revenue_orders(spark, sf_dir).collect())
        run("region_rollup", lambda: Q.q_region_rollup(spark, sf_dir).collect())

        from otel_logger_spark import queries_training as QT

        run("dedup_minhash", lambda: QT.q_minhash_pairs(spark, sf_dir).count())
        run("embedding_topk", lambda: QT.q_embedding_topk(spark, sf_dir).collect())
        run("text_quality", lambda: QT.q_text_quality(spark, sf_dir).collect())
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "n_turns": n_turns,
        "pipeline_turns_per_sec": round(n_turns / timings["full_pipeline"], 1),
    }
    # attach the north-rule scaling measurement if tools/bench_scaling.py has
    # produced one (BENCH/scaling.json; protocol in BENCH/BASELINE.md)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        out["scaling"] = {
            "N": s["N"],
            "input_turns": s["input_turns"],
            "throughput_N": s["throughput_N"],
            "throughput_4N": s["throughput_4N"],
            "efficiency": s["scaling_efficiency"],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
