"""Per-query isolation bench (guide §1.4): time ONE or more bench queries
with the same action bench.py uses (collect/count), repeated K times, with
optional plan capture and per-query Spark job/stage accounting from the
event log. bench.py stays the frozen driver artifact; this file exists so
optimization work can iterate on a single query in seconds instead of a
~6-minute full pass, and so OPTIMIZATION_r09.md can cite isolated numbers.

Usage:
  python bench_extra.py q1 [q2 ...] [--reps N] [--plan plans/r09] [--jobs]
  python bench_extra.py --list
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _query_actions(spark, sf_dir):
    """name -> zero-arg callable, mirroring bench.py's action per query."""
    from otel_logger_spark import queries as Q
    from otel_logger_spark import queries_extra as QX
    from otel_logger_spark import queries_training as QT
    from otel_logger_spark.operators.rollups import conversation_metrics
    from otel_logger_spark.operators.sinks import write_routed_sinks

    COUNT = {
        "dedup_minhash": lambda: QT.q_minhash_pairs(spark, sf_dir),
        "asof_latest_signup": lambda: QX.q_asof_latest_signup(spark, sf_dir),
        "pack_shards": lambda: QT.q_pack_shards(spark, sf_dir),
        "doc_repetition": lambda: QT.q_doc_repetition(spark, sf_dir),
        "tfidf_terms": lambda: QT.q_tfidf_terms(spark, sf_dir),
        "span_dedup": lambda: QT.q_span_dedup(spark, sf_dir),
        "cms_counts": lambda: QX.q_cms_counts(spark, sf_dir),
        "chunk_windows": lambda: QT.q_chunk_windows(spark, sf_dir),
    }
    COLLECT = {
        "parse_severity_counts": lambda: Q.q_parse_severity_counts(spark, sf_dir),
        "multiline_entry_stats": lambda: Q.q_multiline_entry_stats(spark, sf_dir),
        "conversation_rollup": lambda: Q.q_conversation_rollup(spark, sf_dir),
        "window_turn_rollup": lambda: Q.q_window_turn_rollup(spark, sf_dir),
        "flush_window_counts": lambda: Q.q_flush_window_counts(spark, sf_dir),
        "pricing_summary": lambda: Q.q_pricing_summary(spark, sf_dir),
        "top_revenue_orders": lambda: Q.q_top_revenue_orders(spark, sf_dir),
        "region_rollup": lambda: Q.q_region_rollup(spark, sf_dir),
        "embedding_topk": lambda: QT.q_embedding_topk(spark, sf_dir),
        "text_quality": lambda: QT.q_text_quality(spark, sf_dir),
        "range_click_incidents": lambda: QX.q_range_click_incidents(spark, sf_dir),
        "rate_spikes": lambda: QX.q_rate_spikes(spark, sf_dir),
        "pii_redaction": lambda: QT.q_pii_redaction(spark, sf_dir),
        "decontam_split": lambda: QT.q_decontam_split(spark, sf_dir),
        "incremental_dedup": lambda: QT.q_incremental_dedup(spark, sf_dir),
        "exact_percentiles": lambda: QX.q_exact_percentiles(spark, sf_dir),
        "snapshot_diff": lambda: QT.q_snapshot_diff(spark, sf_dir),
        "dedup_canonical": lambda: QT.q_dedup_canonical(spark, sf_dir),
        "normalized_dedup": lambda: QT.q_normalized_dedup(spark, sf_dir),
        "token_mix": lambda: QT.q_token_mix(spark, sf_dir),
        "funnel": lambda: QX.q_funnel(spark, sf_dir),
        "fixed_k_sample": lambda: QT.q_fixed_k_sample(spark, sf_dir),
        "quantized_ann": lambda: QT.q_quantized_ann(spark, sf_dir),
        "ann_ivf_quantized": lambda: QT.q_ann_ivf_quantized(spark, sf_dir),
        "semantic_dedup": lambda: QT.q_semantic_dedup(spark, sf_dir),
        "leakage_split": lambda: QT.q_leakage_split(spark, sf_dir),
        "dsir_select": lambda: QT.q_dsir_select(spark, sf_dir),
        "source_overlap": lambda: QT.q_source_overlap(spark, sf_dir),
        "lm_fluency": lambda: QT.q_lm_fluency(spark, sf_dir),
        "vocab_oov": lambda: QT.q_vocab_oov(spark, sf_dir),
        "contamination_profile": lambda: QT.q_contamination_profile(spark, sf_dir),
        "freqcap": lambda: QT.q_freqcap(spark, sf_dir),
        "diversity": lambda: QT.q_diversity(spark, sf_dir),
        "temperature_mix": lambda: QT.q_temperature_mix(spark, sf_dir),
        "corpus_cartography": lambda: QT.q_corpus_cartography(spark, sf_dir),
        "audio_stats": lambda: QT.q_audio_stats(spark, sf_dir),
        "embedding_outliers": lambda: QT.q_embedding_outliers(spark, sf_dir),
        "bigram_fluency": lambda: QT.q_bigram_fluency(spark, sf_dir),
        "image_near_dup": lambda: QT.q_image_near_dup(spark, sf_dir),
        "bpe_encode": lambda: QT.q_bpe_encode(spark, sf_dir),
        "hygiene_manifest": lambda: QT.q_hygiene_manifest(spark, sf_dir),
    }
    actions: dict[str, tuple] = {}
    for n, build in COUNT.items():
        actions[n] = ("count", build)
    for n, build in COLLECT.items():
        actions[n] = ("collect", build)

    def full_pipeline():
        import shutil
        import tempfile

        out_dir = tempfile.mkdtemp(prefix="bx_sinks_")
        try:
            routed = Q._routed(spark, sf_dir)
            write_routed_sinks(
                routed, conversation_metrics(routed), out_dir, run_id="bx"
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    actions["full_pipeline"] = ("custom", full_pipeline)
    return actions


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dir to write <q>.txt explain output")
    ap.add_argument("--plan-suffix", default="", help="e.g. _before/_after")
    ap.add_argument("--jobs", action="store_true", help="report per-rep job/stage counts")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--noop", action="store_true", help="noop sink instead of bench action")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from otel_logger_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    actions = _query_actions(spark, sf_dir)
    if args.list:
        print(" ".join(actions))
        return

    # warm JVM + python workers once, as bench.py does
    from otel_logger_spark import queries as Q

    Q.q_parse_severity_counts(spark, sf_dir).collect()

    out = {}
    for name in args.names:
        kind, build = actions[name]
        times, jobinfo = [], []
        for rep in range(args.reps):
            sc.setJobDescription(f"bx:{name}:{rep}")
            j0 = max(tracker.getJobIdsForGroup(None) or [-1])
            t0 = time.monotonic()
            if kind == "custom":
                build()
            else:
                df = build()
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                elif kind == "count":
                    df.count()
                else:
                    df.collect()
            times.append(round(time.monotonic() - t0, 3))
            if args.jobs:
                ids = [i for i in (tracker.getJobIdsForGroup(None) or []) if i > j0]
                n_stages = 0
                for i in ids:
                    ji = tracker.getJobInfo(i)
                    if ji:
                        n_stages += len(ji.stageIds)
                jobinfo.append({"jobs": len(ids), "stages": n_stages})
            sc.setJobDescription(None)
        rec = {"times": times, "min": min(times), "median": sorted(times)[len(times) // 2]}
        if args.jobs:
            rec["jobs"] = jobinfo
        out[name] = rec
        print(json.dumps({name: rec}))
        if args.plan is not None:
            kind2, build2 = actions[name]
            if kind2 != "custom":
                os.makedirs(args.plan, exist_ok=True)
                df = build2()
                p = os.path.join(args.plan, f"{name}{args.plan_suffix}.txt")
                with open(p, "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
                print(f"# wrote {p}")
    print(json.dumps({"summary": {n: r["median"] for n, r in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
