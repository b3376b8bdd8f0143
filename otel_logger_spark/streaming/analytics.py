"""Streaming variants of the two batch-analytics operators that summarize
event VOLUME — log template mining (functions/templates.py) and rate-spike
detection (operators/anomaly.py) — using the same partials-then-finalize
pattern as the pipeline's conversation_metrics sink
(streaming/pipeline.write_streaming_batch): each micro-batch writes a
DECOMPOSABLE partial aggregate into its own ``batchid=<id>`` directory
(overwrite => exactly-once per (sink, batchId) on top of the checkpoint's
at-least-once redelivery), and a finalizer re-aggregates the partials into
exactly the batch operator's answer — row-for-row, whatever the
micro-batch boundaries were.

Why partials, not stateful streaming aggregation: both finalized tables
are unbounded-history summaries (a template's distinct-conversation count,
a bucket's trailing-24h baseline). Keeping them in streaming state would
grow without bound and still be unreadable mid-stream; per-batch partials
are bounded (distinct keys per batch), cheap (map-side combine inside the
micro-batch), and the finalize is an ordinary batch query over the sink —
run it whenever a fresh table is wanted.

Partial schemas (both tiny next to event volume):
- templates: (template, conv_id, n) — per-conversation counts, because
  ``n_convs`` (COUNT DISTINCT) is not sum-decomposable but IS re-derivable
  from per-(template, conv) partials;
- rate: (*group_cols, _b, _n) — per-bucket counts; a bucket spanning
  micro-batches sums correctly in the finalizer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from otel_logger_spark.functions.cms import cms_sketch
from otel_logger_spark.functions.templates import with_template
from otel_logger_spark.operators.anomaly import spikes_from_bucket_counts

TEMPLATE_SINK = "template_partials"
RATE_SINK = "rate_partials"
CMS_SINK = "cms_partials"


def template_partials(
    df: DataFrame, text_col: str = "text", conv_col: str = "conv_id"
) -> DataFrame:
    """(template, conv_id, n) for one micro-batch."""
    return (
        with_template(df, text_col)
        .groupBy("template", F.col(conv_col).alias("conv_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rate_partials(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """(*group_cols, _b, _n) for one micro-batch."""
    bucket = F.expr(f"unix_timestamp({ts_col}) DIV {bucket_seconds}")
    return (
        df.select(*group_cols, bucket.alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )


def write_analytics_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    text_col: str = "text",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    cms_key_col: str | None = "conv_id",
    cms_d: int = 4,
    cms_w: int = 512,
) -> None:
    """One micro-batch's analytics partials, batchId-idempotent. The CMS
    partial is the per-batch sketch itself (<= d*w cells): cms_merge's
    cell-wise-sum law makes the union of batch sketches EXACTLY the
    sketch of the union, whatever the micro-batch boundaries were."""
    batch_df = batch_df.persist()
    try:
        template_partials(batch_df, text_col, conv_col).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, TEMPLATE_SINK, f"batchid={batch_id}"))
        rate_partials(batch_df, ts_col, group_cols, bucket_seconds).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, RATE_SINK, f"batchid={batch_id}"))
        if cms_key_col:
            cms_sketch(batch_df, cms_key_col, cms_d, cms_w).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, CMS_SINK, f"batchid={batch_id}"))
    finally:
        batch_df.unpersist()


def run_streaming_analytics(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    cms_key_col: str | None = "conv_id",
):
    """Run the analytics partial sinks over the live transcript stream;
    returns the started query. Same trigger semantics as
    run_streaming_pipeline (availableNow drains then stops)."""
    from otel_logger_spark.streaming.pipeline import read_transcript_stream

    stream = read_transcript_stream(spark, input_dir, max_files_per_trigger)
    src = stream.filter(F.length("text") > 0)

    def write_batch(batch_df: DataFrame, batch_id: int):
        write_analytics_batch(
            batch_df, batch_id, out_dir,
            group_cols=group_cols, bucket_seconds=bucket_seconds,
            cms_key_col=cms_key_col,
        )

    writer = src.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_cms_sketch(spark: SparkSession, out_dir: str) -> DataFrame:
    """Finalize the CMS sink: cell-wise sum over all micro-batch
    sketches — by the merge law this IS functions/cms.cms_sketch of the
    full stream, row-for-row (pinned by pytest), ready for
    cms_estimate/cms_heavy_hitters."""
    parts = spark.read.parquet(os.path.join(out_dir, CMS_SINK))
    return parts.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def read_template_counts(spark: SparkSession, out_dir: str) -> DataFrame:
    """Finalize the template sink: (template, n, n_convs) — field-for-field
    functions/templates.template_counts on the union of all micro-batches
    (n_convs re-derived exactly from the per-(template, conv) partials)."""
    parts = spark.read.parquet(os.path.join(out_dir, TEMPLATE_SINK))
    return parts.groupBy("template").agg(
        F.sum("n").alias("n"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def read_rate_spikes(
    spark: SparkSession,
    out_dir: str,
    group_cols: tuple[str, ...] = ("role",),
    bucket_seconds: int = 3600,
    trailing: int = 24,
    z: int = 3,
    min_baseline: int = 0,
    max_span_buckets: int = 8784,
    span_overflow: str = "error",
) -> DataFrame:
    """Finalize the rate sink: re-aggregate per-batch bucket counts and run
    the SAME post-aggregation detector as batch rate_spikes
    (operators/anomaly.spikes_from_bucket_counts — dense timeline, span
    guard, integer-exact z-score), so streaming equals batch row-for-row."""
    parts = spark.read.parquet(os.path.join(out_dir, RATE_SINK))
    counts = parts.groupBy(*group_cols, "_b").agg(F.sum("_n").alias("_n"))
    return spikes_from_bucket_counts(
        counts,
        group_cols=group_cols,
        bucket_seconds=bucket_seconds,
        trailing=trailing,
        z=z,
        min_baseline=min_baseline,
        max_span_buckets=max_span_buckets,
        span_overflow=span_overflow,
    )


# --- contamination profile over a documents stream (round 8) -----------------
#
# The per-doc contamination counts (functions/decontam.contamination_per_doc)
# are the natural partial: a document lives wholly inside one micro-batch, so
# per-batch per-doc rows union losslessly (no cross-batch summing needed at
# all — idempotence comes from the batchid=<id> overwrite), and the decile
# histogram finalizes over the union with the SAME tiny aggregate the batch
# operator uses (profile_from_per_doc). Benchmark n-grams are a bounded
# static side, re-broadcast per micro-batch exactly as the batch plan
# broadcasts them per query.

CONTAM_SINK = "contam_partials"

DOCUMENTS_SCHEMA = (
    "doc_id bigint, source string, lang string, text string"
)


def read_documents_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def write_contam_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    bench: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    use_hash: bool = False,
) -> None:
    """One micro-batch's per-doc contamination partial, batchId-idempotent."""
    from otel_logger_spark.functions.decontam import contamination_per_doc

    contamination_per_doc(
        batch_df, bench, n, id_col, text_col, group_col, use_hash
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, CONTAM_SINK, f"batchid={batch_id}")
    )


def run_streaming_contamination(
    spark: SparkSession,
    input_dir: str,
    bench: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    n: int = 13,
    group_col: str = "source",
    use_hash: bool = False,
):
    """Contamination partials over a live documents stream; returns the
    started query (availableNow drains then stops, like the pipeline)."""
    stream = read_documents_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int):
        write_contam_batch(
            batch_df, batch_id, out_dir, bench,
            n=n, group_col=group_col, use_hash=use_hash,
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


OOV_SINK = "oov_partials"


def write_oov_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> None:
    """One micro-batch's per-doc OOV partial against the PINNED
    vocabulary, batchId-idempotent (overwrite of batchid=<id> makes
    redelivery converge to the same bytes)."""
    from otel_logger_spark.functions.vocab import with_oov_stats

    with_oov_stats(
        batch_df, vocab, text_col, id_col, (group_col,)
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, OOV_SINK, f"batchid={batch_id}")
    )


def run_streaming_oov(
    spark: SparkSession,
    input_dir: str,
    vocab: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
    group_col: str = "lang",
):
    """OOV-coverage partials over a live documents stream against a
    pinned tokenizer vocabulary (the production monitoring shape: the
    vocab is a build-time artifact; what streams is the corpus). A doc
    lives wholly in one micro-batch, so per-doc (group, n_tokens, n_oov)
    rows are exact partials and the finalizer's group sums are
    associative across batches. Returns the started query."""
    stream = read_documents_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int):
        write_oov_batch(batch_df, batch_id, out_dir, vocab, group_col=group_col)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_oov_report(
    spark: SparkSession, out_dir: str, group_col: str = "lang"
) -> DataFrame:
    """Finalize the OOV sink: the batch finalizer
    (functions/vocab.oov_from_per_doc) over the union of all micro-batch
    per-doc partials — row-for-row equal to batch oov_report with the
    same pinned vocab (pinned by pytest)."""
    from otel_logger_spark.functions.vocab import oov_from_per_doc

    parts = spark.read.parquet(os.path.join(out_dir, OOV_SINK))
    return oov_from_per_doc(parts, group_col=group_col)


HYGIENE_SINK = "hygiene_partials"


def write_hygiene_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    uni_tab: dict,
    oov_nll: int,
    quality_min_milli: int,
    nll_max_micro: int,
    rep_thresholds_milli: dict | None = None,
    group_col: str = "lang",
) -> None:
    """One micro-batch's per-doc hygiene manifest against the PINNED
    rule parameters (the NLL table is a build-time artifact, like the
    streaming-OOV vocabulary), batchId-idempotent via batchid=<id>
    overwrite. Per-doc flag rows are exact partials: a doc lives wholly
    in one micro-batch and the report is pure flag sums."""
    from otel_logger_spark.functions.hygiene import hygiene_manifest

    hygiene_manifest(
        batch_df, uni_tab, oov_nll, quality_min_milli, nll_max_micro,
        rep_thresholds_milli, carry_cols=(group_col,),
    ).write.mode("overwrite").parquet(
        os.path.join(out_dir, HYGIENE_SINK, f"batchid={batch_id}")
    )


def run_streaming_hygiene(
    spark: SparkSession,
    input_dir: str,
    uni_tab: dict,
    oov_nll: int,
    quality_min_milli: int,
    nll_max_micro: int,
    out_dir: str,
    checkpoint_dir: str,
    rep_thresholds_milli: dict | None = None,
    group_col: str = "lang",
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """Hygiene-manifest partials over a live documents stream — the
    monitoring shape for an ingest pipeline: rule parameters are pinned
    build-time artifacts, the corpus streams, and the finalizer's
    per-group flag sums are associative across batches. Returns the
    started query."""
    stream = read_documents_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int):
        write_hygiene_batch(
            batch_df, batch_id, out_dir, uni_tab, oov_nll,
            quality_min_milli, nll_max_micro, rep_thresholds_milli,
            group_col,
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_hygiene_report(
    spark: SparkSession, out_dir: str, group_col: str = "lang"
) -> DataFrame:
    """Finalize the hygiene sink: per-group flag sums over the union of
    all micro-batch per-doc manifests — row-for-row equal to batch
    hygiene_report with the same pinned parameters (pinned by pytest)."""
    from pyspark.sql import functions as F

    m = spark.read.parquet(os.path.join(out_dir, HYGIENE_SINK))
    return m.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("rep_flag").cast("long")).alias("n_rep"),
        F.sum(F.col("quality_flag").cast("long")).alias("n_quality"),
        F.sum(F.col("fluency_flag").cast("long")).alias("n_fluency"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


DIVERSITY_COUNTS_SINK = "diversity_counts"
DIVERSITY_DIGESTS_SINK = "diversity_digests"


def write_diversity_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    n: int = 3,
    group_col: str = "source",
) -> None:
    """One micro-batch's diversity partials: summable counts + the
    batch-DISTINCT digest set (the exact-distinct decomposition —
    distinct-of-union == distinct). Both sinks batchId-idempotent via
    batchid=<id> overwrite."""
    from otel_logger_spark.functions.diversity import diversity_partials

    counts, digests = diversity_partials(batch_df, n, group_col)
    counts.write.mode("overwrite").parquet(
        os.path.join(out_dir, DIVERSITY_COUNTS_SINK, f"batchid={batch_id}")
    )
    digests.write.mode("overwrite").parquet(
        os.path.join(out_dir, DIVERSITY_DIGESTS_SINK, f"batchid={batch_id}")
    )


def run_streaming_diversity(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    n: int = 3,
    group_col: str = "source",
    available_now: bool = True,
    processing_time: str | None = None,
    max_files_per_trigger: int | None = None,
):
    """N-gram diversity partials over a live documents stream. Unlike
    the contamination/OOV partials (pure sums), the distinct-gram
    metrics need the exact-distinct decomposition: each batch ships its
    DISTINCT (group, kind, digest) set — bounded by the batch's
    vocabulary, never its token stream — and the finalizer re-distincts
    the union. Returns the started query."""
    stream = read_documents_stream(spark, input_dir, max_files_per_trigger)

    def write_batch(batch_df: DataFrame, batch_id: int):
        write_diversity_batch(batch_df, batch_id, out_dir, n, group_col)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_diversity_report(
    spark: SparkSession, out_dir: str, group_col: str = "source"
) -> DataFrame:
    """Finalize the diversity sinks: sums over the count partials, COUNT
    DISTINCT over the re-unioned digest partials — row-for-row equal to
    batch diversity_report (pinned by pytest)."""
    from otel_logger_spark.functions.diversity import diversity_finalize

    counts = spark.read.parquet(os.path.join(out_dir, DIVERSITY_COUNTS_SINK))
    digests = spark.read.parquet(
        os.path.join(out_dir, DIVERSITY_DIGESTS_SINK)
    )
    return diversity_finalize(
        counts.drop("batchid"), digests.drop("batchid"), group_col
    )


def read_contamination_profile(
    spark: SparkSession, out_dir: str, group_col: str = "source"
) -> DataFrame:
    """Finalize the contamination sink: the batch operator's decile
    histogram (functions/decontam.profile_from_per_doc) over the union
    of all micro-batch per-doc partials — row-for-row equal to batch
    contamination_profile on the full corpus (pinned by pytest)."""
    from otel_logger_spark.functions.decontam import profile_from_per_doc

    parts = spark.read.parquet(os.path.join(out_dir, CONTAM_SINK))
    return profile_from_per_doc(parts, group_col=group_col)
