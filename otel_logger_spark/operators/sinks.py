"""Multi-sink fan-out writes with checkpointed lineage (K1-K4 + A5).

The reference guarantees no record is dropped: ForceFlush before exit
(/root/reference/main.go:652-655) and at-least-once batched export
(main.go:354-358). The Spark analogue: a sink is "flushed" only when its
write commits, and a lineage manifest records, per (run, sink), the row
count, per-partition counts, and wall time. Re-running the same run_id
skips sinks already committed — idempotent resume (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

Commit unit: (sink). Parquet/Iceberg writes are atomic per sink directory
(_SUCCESS / snapshot), so a killed run resumes at sink granularity; the
per-partition counts in the manifest give partition-level lineage for
audit.

Action economy (matters at 100 TB): the routed frame is persisted once;
ONE aggregation over (partition_id, is_error, is_tool_call) yields the
per-partition lineage for logs/error/tool_call simultaneously; the metrics
row count rides the write itself via Observation. Total: 1 agg + 4 writes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from otel_logger_spark.schemas import SINK_ERROR, SINK_LOGS, SINK_TOOL_CALL


def _manifest_path(out_dir: str, run_id: str) -> str:
    return os.path.join(out_dir, "_lineage", f"{run_id}.json")


def load_manifest(out_dir: str, run_id: str) -> dict:
    p = _manifest_path(out_dir, run_id)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"run_id": run_id, "sinks": {}}


def save_manifest(out_dir: str, manifest: dict) -> None:
    d = os.path.join(out_dir, "_lineage")
    os.makedirs(d, exist_ok=True)
    p = _manifest_path(out_dir, manifest["run_id"])
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, p)  # atomic manifest commit


def parquet_partition_lineage(path: str) -> list[dict]:
    """Per-partition lineage read from the committed parquet footers: every
    write task produces one part file, so footer row counts ARE the
    per-partition counts — no extra Spark action over the data. Footer
    reads are O(files) driver-side metadata fetches (cheap even at 10^4
    files; on object storage they're ranged GETs)."""
    import pyarrow.parquet as pq

    parts = []
    for i, name in enumerate(sorted(os.listdir(path))):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        parts.append({"partition_id": i, "n_rows": md.num_rows, "file": name})
    return parts


def _commit(manifest, out_dir, sink, path, n_rows, t0, partitions):
    entry = {
        "status": "committed",
        "n_rows": n_rows,
        "wall_sec": round(time.monotonic() - t0, 3),
        "path": path,
        "partitions": partitions,
    }
    manifest["sinks"][sink] = entry
    save_manifest(out_dir, manifest)  # checkpoint after every sink commit
    return entry


def write_routed_sinks(
    routed: DataFrame,
    metrics: DataFrame,
    out_dir: str,
    run_id: str = "run-0",
    persist: bool = True,
) -> dict:
    """Fan out the routed frame to the four sinks. ``routed`` must carry
    is_error / is_tool_call (see route.with_routing) and the parsed columns.

    Returns the committed manifest (A5: every sink committed == ForceFlush).
    """
    manifest = load_manifest(out_dir, run_id)
    done = {
        s for s, e in manifest["sinks"].items() if e.get("status") == "committed"
    }
    routed_sinks = [SINK_LOGS, SINK_ERROR, SINK_TOOL_CALL]
    if persist and not ({*routed_sinks, "conversation_metrics"} <= done):
        routed = routed.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out_cols = [
            "conv_id", "turn_idx", "role", "tool", "event_ts", "level",
            "severity_num", "message", "attrs", "raw",
        ]
        base = routed.select(*[c for c in out_cols if c in routed.columns])
        filters = {
            SINK_LOGS: None,
            SINK_ERROR: routed["is_error"],
            SINK_TOOL_CALL: routed["is_tool_call"],
        }
        for sink in routed_sinks:
            if sink in done:
                continue
            t0 = time.monotonic()
            df = base if filters[sink] is None else base.filter(filters[sink])
            path = os.path.join(out_dir, sink)
            df.write.mode("overwrite").parquet(path)
            parts = parquet_partition_lineage(path)
            _commit(
                manifest, out_dir, sink, path,
                sum(p["n_rows"] for p in parts), t0, parts,
            )
        if "conversation_metrics" not in done:
            t0 = time.monotonic()
            obs = Observation()
            path = os.path.join(out_dir, "conversation_metrics")
            metrics.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
                "overwrite"
            ).parquet(path)
            _commit(manifest, out_dir, "conversation_metrics", path, obs.get["n"], t0, [])
        manifest["status"] = "committed"
        save_manifest(out_dir, manifest)
    finally:
        if persist:
            routed.unpersist()
    return manifest
