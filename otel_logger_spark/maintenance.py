"""Operational maintenance CLI — the table-upkeep commands a deployed
sink store needs on a schedule, separate from the reference-parity
pipeline CLI (cli.py):

    python -m otel_logger_spark.maintenance compact <dir> \
        [--target-file-mb 512] [--sink logs --out <out_dir>]
    python -m otel_logger_spark.maintenance expire <dir> --before YYYY-MM-DD \
        [--partition-col event_date] [--dry-run]
    python -m otel_logger_spark.maintenance zorder <dir> --cols a,b \
        [--bits 16] [--target-file-mb 512]

Both print a one-line JSON report (the audit trail: rows/files touched),
mirroring cli.py's manifest-count output.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date


def main(argv=None):
    ap = argparse.ArgumentParser(prog="otel_logger_spark.maintenance")
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("compact", help="small-file compaction (rewrite-verify-swap)")
    c.add_argument("path", help="parquet directory (or sink out_dir with --sink)")
    c.add_argument("--sink", default=None, help="sink name under PATH (streaming layout)")
    c.add_argument("--target-file-mb", type=int, default=512)

    z = sub.add_parser("zorder", help="rewrite in Z-order over --cols (layout optimization)")
    z.add_argument("path")
    z.add_argument("--cols", required=True, help="comma-separated curve columns")
    z.add_argument("--bits", type=int, default=16)
    z.add_argument("--target-file-mb", type=int, default=512)

    e = sub.add_parser("expire", help="delete date partitions older than --before")
    e.add_argument("path")
    e.add_argument("--before", required=True, help="YYYY-MM-DD cutoff (exclusive)")
    e.add_argument("--partition-col", default="event_date")
    e.add_argument("--dry-run", action="store_true")

    args = ap.parse_args(argv)

    from otel_logger_spark.session import get_spark

    spark = get_spark("otel-logger-maintenance", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "compact":
        from otel_logger_spark.operators.compact import (
            compact_parquet_dir,
            compact_streaming_sink,
        )

        if args.sink:
            report = compact_streaming_sink(
                spark, args.path, args.sink,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
            )
        else:
            report = compact_parquet_dir(
                spark, args.path,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
            )
    elif args.cmd == "zorder":
        from otel_logger_spark.operators.zorder import zorder_parquet_dir

        report = zorder_parquet_dir(
            spark, args.path, args.cols.split(","), bits=args.bits,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
        )
    else:
        from otel_logger_spark.operators.retention import expire_partitions

        report = expire_partitions(
            spark,
            args.path,
            before=date.fromisoformat(args.before),
            partition_col=args.partition_col,
            dry_run=args.dry_run,
        )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
