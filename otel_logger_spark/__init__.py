"""otel_logger_spark — a PySpark-native log/telemetry analytics engine.

A brand-new parse -> enrich -> route -> aggregate pipeline over tables of
multi-turn conversation/agent transcripts, re-expressing the query semantics
of the reference log forwarder (``middle-management/otel-logger``,
``/root/reference/main.go``) in idiomatic Spark: DataFrame/SQL plans,
Arrow-vectorized pandas UDFs for the parse stage, broadcast-join enrichment,
window-function rollups, multi-sink fan-out writes with per-partition
lineage, plus the training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB pipeline needs.

Not a port: the reference is a single-threaded Go program; this engine is a
distributed Spark plan designed for 1000-executor clusters.
"""

__version__ = "0.1.0"
