"""A/B: dictionary-encoded role/tool (OTEL_SPARK_DICT_ENUMS) vs baseline
on the full pipeline at 37M turns, interleaved at the pass level (the
BENCH/NOISE.md discipline — coldest-first sequential sweeps reverse under
page-cache drift). Run at local[N] for the bandwidth-bound leg the change
targets (default 8, the ceiling pair's lower level).

Usage: python tools/ab_dict_enums.py [--convs 1500000] [--cores 8] [--pairs 3]
Writes BENCH/AB_dict_enums.json; the adopt/reject decision goes in
BENCH/AB_dict_enums.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import build_pyfiles_zip, ensure_input  # noqa: E402


def run_once(cores: int, input_path: str, zpath: str, dict_enums: bool) -> dict:
    out = tempfile.mkdtemp(prefix=f"ab_dict_{cores}_")
    env = dict(os.environ)
    env["OTEL_SPARK_DICT_ENUMS"] = "1" if dict_enums else "0"
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
            cmd, capture_output=True, text=True, timeout=3600, env=env
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
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH"))
    args = ap.parse_args()

    zpath = build_pyfiles_zip()
    input_path = ensure_input(args.convs)

    runs = {"off": [], "on": []}
    sink_rows = {"off": set(), "on": set()}
    for i in range(args.pairs):
        # alternate leg order per pair: monotone page-cache/JIT drift
        # otherwise systematically favors whichever leg runs second
        order = (("off", False), ("on", True))
        if i % 2 == 1:
            order = order[::-1]
        for label, flag in order:
            r = run_once(args.cores, input_path, zpath, flag)
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
        "input_turns": runs["off"][0]["n_turns"],
        "walls_off": [r["wall_sec"] for r in runs["off"]],
        "walls_on": [r["wall_sec"] for r in runs["on"]],
        "best_off": min(r["wall_sec"] for r in runs["off"]),
        "best_on": min(r["wall_sec"] for r in runs["on"]),
        "sink_rows_equal": sink_rows["off"] == sink_rows["on"]
        and len(sink_rows["off"]) == 1,
    }
    summary["delta_pct_best"] = round(
        100 * (summary["best_on"] / summary["best_off"] - 1), 1
    )
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "AB_dict_enums.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
