"""Micro-bench for the shuffle-free partitioned coalescer (the textfile
source's path, operators/multiline.py coalesce_entries_partitioned).

Generates a synthetic .log corpus (one file = one ordered stream, 4-line
pattern: start + 2 continuations + 1 single-line entry), then times a full
coalesce pass. Prints one JSON line; BENCH/AB_coalescer_partitioned.md
records the row-loop vs vectorized A/B.

Usage: python tools/bench_multiline_micro.py [n_files] [lines_per_file]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    lines = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    d = tempfile.mkdtemp(prefix="ml_micro_")
    block = (
        "2024-01-15T10:30:45Z ERROR boom at stage {i}/{j}\n"
        "  at Frame.one(File.java:1)\n"
        "  at Frame.two(File.java:2)\n"
        "plain single-line entry {j}\n"
    )
    for i in range(n_files):
        with open(os.path.join(d, f"f{i:03d}.log"), "w") as f:
            for j in range(lines // 4):
                f.write(block.format(i=i, j=j))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ml-micro")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from otel_logger_spark.operators.multiline import coalesce_entries_partitioned
    from otel_logger_spark.sources.textfile import read_log_files

    src = read_log_files(spark, d)
    n_input = src.count()
    # warm the Python workers so the first-UDF cold start isn't timed
    coalesce_entries_partitioned(src.limit(2000)).count()
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        row = (
            coalesce_entries_partitioned(src)
            .agg(F.count("*").alias("entries"), F.sum("n_lines").alias("n_lines"))
            .collect()[0]
        )
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    assert row["n_lines"] == n_input, (row, n_input)
    print(
        json.dumps(
            {
                "metric": "partitioned_coalescer_lines_per_sec",
                "value": round(n_input / best, 1),
                "unit": "lines/sec",
                "n_lines": n_input,
                "entries": row["entries"],
                "wall_sec_best_of_3": round(best, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
