"""SparkSession factory tuned for the pipeline.

Scale notes (the configs below are chosen for cluster behavior, verified on
local[N]):
- AQE on: runtime partition coalescing + skew-join splitting, so hot
  conversations (skewed conv_id) don't straggle.
- Arrow on with a bounded batch size: the parse stage is a pandas UDF; batch
  size bounds Python-worker memory at any scale.
- shuffle.partitions is sized to cores locally; on a real cluster this is
  set to ~2-3x total executor cores via spark-submit conf.
- session timezone pinned to UTC so event-time semantics are
  cluster-independent (and comparable to the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "otel-logger-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with pipeline defaults.

    ``cores=None`` uses ``local[*]``; tests/bench pass explicit values so
    the N vs 4N scaling runs are reproducible.
    """
    if cores is None:
        env_cores = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cores}]" if env_cores else "local[*]"
        ncores = int(env_cores) if env_cores else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores

    if shuffle_partitions is None:
        # ~1x cores locally; a real cluster submit overrides to 2-3x total cores.
        shuffle_partitions = max(ncores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's parallelism-first coalescing merges post-shuffle partitions
        # up to this floor; the 1m default turns a 13 MB shuffle into ~8
        # tasks and idles 3/4 of a 32-core node on every small exchange
        # (measured on the ngram pair-count stage: 8 tasks x 780 ms).
        # 256k keeps small-but-CPU-heavy reduce stages at node parallelism;
        # at cluster scale partitions are >= the advisory size anyway, so
        # the floor is inert there. Env-overridable for deployments.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_MIN_PARTITION_SIZE", "256k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # shuffle/spill codec: zstd over the lz4 default — adopted from the
        # round-9 interleaved A/B at 37M turns/local[8] (BENCH/
        # AB_shuffle_codec.md): zstd legs 79.1-80.0s vs lz4 128.8-211.3s,
        # identical sink rows. The conv_id exchange is the pipeline's
        # bytes-per-row wall; the better ratio cuts shuffle-file I/O and
        # stabilizes walls on contended disks. Env-overridable.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bounds pandas-UDF batch memory; mirrors the reference's bounded
        # batching (BatchProcessor, /root/reference/main.go:354-358).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local mode hosts driver AND every executor thread in one JVM:
        # a 50-query bench session accumulates plans/broadcasts across
        # passes, and allocation-heavy Arrow stages (audio/image decode)
        # stall under old-gen pressure at 8g (the bench's late-pass
        # audio_stats blowups). 16g on a 128 GiB box; env-overridable —
        # a real cluster sizes driver/executor memory via spark-submit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
