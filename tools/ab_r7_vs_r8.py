"""A/B: round-7-close engine (56d2c46) vs HEAD on the full pipeline at
37M turns, interleaved at the pass level (BENCH/NOISE.md discipline).

Motivation: three round-8 sf0.1 bench sessions flagged pipeline-adjacent
queries 20-65% over round 7. NOISE.md adjudicated the first two as host
noise (the flags hit queries whose code is untouched), but the stated
rule is "repeated flags are real" — this script settles it at the
load-bearing scale (37M turns, local[8]) by running BOTH code versions
in the same window, alternating leg order per pair. The job script
(tools/run_pipeline_job.py) is byte-identical across the two commits,
so only the --py-files package zip differs.

Usage: python tools/ab_r7_vs_r8.py [--convs 1500000] [--cores 8] [--pairs 3]
Writes BENCH/AB_r7_vs_r8.json.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import CACHE, build_pyfiles_zip, ensure_input  # noqa: E402

R7_COMMIT = "56d2c46"


def build_r7_zip() -> str:
    """Package zip of the round-7-close engine via git archive (no
    working-tree checkout; the current tree is never touched)."""
    zpath = os.path.join(CACHE, "otel_logger_spark_r7.zip")
    os.makedirs(CACHE, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="r7_src_")
    try:
        tar = os.path.join(tmp, "r7.tar")
        subprocess.run(
            ["git", "-C", REPO, "archive", "-o", tar, R7_COMMIT,
             "otel_logger_spark"],
            check=True,
        )
        subprocess.run(["tar", "-xf", tar, "-C", tmp], check=True)
        with zipfile.ZipFile(zpath, "w") as z:
            pkg = os.path.join(tmp, "otel_logger_spark")
            for root, _, files in os.walk(pkg):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, tmp))
        return zpath
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def run_once(cores: int, input_path: str, zpath: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"ab_r7r8_{cores}_")
    try:
        cmd = [
            "spark-submit",
            "--master", f"local[{cores}]",
            "--driver-memory", "16g",
            "--conf", f"spark.sql.shuffle.partitions={4 * cores}",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.adaptive.coalescePartitions.enabled=true",
            "--conf", "spark.sql.adaptive.skewJoin.enabled=true",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "run_pipeline_job.py"),
            "--input", input_path,
            "--out", out,
        ]
        res = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600
        )
        for line in res.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(
            f"no JSON: {res.stdout[-1500:]}\n{res.stderr[-1500:]}"
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=1_500_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    zips = {"r7": build_r7_zip(), "head": build_pyfiles_zip()}
    input_path = ensure_input(args.convs)

    runs = {"r7": [], "head": []}
    sink_rows = {"r7": set(), "head": set()}
    for i in range(args.pairs):
        order = ("r7", "head") if i % 2 == 0 else ("head", "r7")
        for label in order:
            r = run_once(args.cores, input_path, zips[label])
            runs[label].append(r)
            sink_rows[label].add(json.dumps(r.get("sink_rows"), sort_keys=True))
            print(
                f"pair {i + 1} {label}: {r['wall_sec']}s "
                f"({r['turns_per_sec']} turns/s)",
                flush=True,
            )

    summary = {
        "date": datetime.now(timezone.utc).isoformat(),
        "cores": args.cores,
        "r7_commit": R7_COMMIT,
        "input_turns": runs["r7"][0]["n_turns"],
        "walls_r7": [r["wall_sec"] for r in runs["r7"]],
        "walls_head": [r["wall_sec"] for r in runs["head"]],
        "best_r7": min(r["wall_sec"] for r in runs["r7"]),
        "best_head": min(r["wall_sec"] for r in runs["head"]),
        "sink_rows_equal": sink_rows["r7"] == sink_rows["head"]
        and len(sink_rows["r7"]) == 1,
    }
    summary["delta_pct_best"] = round(
        100 * (summary["best_head"] / summary["best_r7"] - 1), 1
    )
    with open(os.path.join(REPO, "BENCH", "AB_r7_vs_r8.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
