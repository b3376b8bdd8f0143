"""A/B: shuffle/spill compression codec (spark.io.compression.codec) on
the full pipeline — the round-8 verdict's next bytes-per-row candidate
for the 8->32 ceiling (item #7). Same interleaved discipline as
ab_prev_vs_head.py: identical HEAD engine zip on every leg, only the
codec conf differs, leg order alternates per pair.

Usage:
  python tools/ab_shuffle_codec.py [--codecs lz4 zstd] [--convs 1500000]
      [--cores 8] [--pairs 3]
Writes BENCH/AB_shuffle_codec.json; the adopt/reject decision goes in
BENCH/AB_shuffle_codec.md.
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


def run_once(cores: int, input_path: str, zpath: str, codec: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"ab_codec_{codec}_")
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
            "--conf", f"spark.io.compression.codec={codec}",
            "--py-files", zpath,
            os.path.join(REPO, "tools", "run_pipeline_job.py"),
            "--input", input_path,
            "--out", out,
        ]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
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
    ap.add_argument("--codecs", nargs="+", default=["lz4", "zstd"])
    ap.add_argument("--convs", type=int, default=1_500_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    zpath = build_pyfiles_zip()
    input_path = ensure_input(args.convs)

    runs: dict[str, list] = {c: [] for c in args.codecs}
    sink_rows: dict[str, set] = {c: set() for c in args.codecs}
    for i in range(args.pairs):
        order = args.codecs if i % 2 == 0 else list(reversed(args.codecs))
        for codec in order:
            r = run_once(args.cores, input_path, zpath, codec)
            runs[codec].append(r)
            sink_rows[codec].add(json.dumps(r.get("sink_rows"), sort_keys=True))
            print(
                f"pair {i + 1} {codec}: {r['wall_sec']}s "
                f"({r['turns_per_sec']} turns/s)",
                flush=True,
            )

    summary = {
        "date": datetime.now(timezone.utc).isoformat(),
        "cores": args.cores,
        "input_turns": runs[args.codecs[0]][0]["n_turns"],
        "walls": {c: [r["wall_sec"] for r in rs] for c, rs in runs.items()},
        "best": {c: min(r["wall_sec"] for r in rs) for c, rs in runs.items()},
        "sink_rows_equal": len(set().union(*sink_rows.values())) == 1,
    }
    with open(os.path.join(REPO, "BENCH", "AB_shuffle_codec.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
