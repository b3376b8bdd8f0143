"""Plan-shape regression pins: the claims BENCH/PLANS.md documents —
exchange counts, join strategies, no-Python-in-JVM-paths — as ENFORCED
invariants. A refactor that introduces an extra shuffle, turns a
broadcast into a shuffled join, or drops a pushed filter fails here
instead of silently shipping a slower plan.

Bounds are <= (upper bounds), not ==: AQE or version drift may REMOVE
work, which should pass; only added work fails. All shapes are taken at
sf0.001 — plan structure is scale-invariant for these queries (that's
the point), and the scan is cheap."""

import pytest

from otel_logger_spark.plans.audit import shape

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shapes(spark):
    from otel_logger_spark import queries as Q
    from otel_logger_spark import queries_extra as QX
    from otel_logger_spark import queries_training as QT
    from otel_logger_spark.operators.skew import conversation_metrics_salted
    from otel_logger_spark.pipeline import build_parsed
    from otel_logger_spark.synth import synthesize_pandas

    routed = build_parsed(
        spark.createDataFrame(synthesize_pandas(20, seed=5))
    )
    return {
        "routed": shape(routed),
        "training_mix": shape(QT.q_training_mix(spark, SF)),
        "embedding_topk": shape(QT.q_embedding_topk(spark, SF)),
        "region_rollup": shape(Q.q_region_rollup(spark, SF)),
        "asof": shape(QX.q_asof_latest_signup(spark, SF)),
        "salted": shape(conversation_metrics_salted(Q._routed(spark, SF))),
        # plain scan, not load_corpus (whose under-split-input normalizer
        # adds its own repartition): this pins the OPERATOR's shape
        "signatures": shape(
            __import__(
                "otel_logger_spark.functions.dedup", fromlist=["minhash_signatures"]
            ).minhash_signatures(
                spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
            )
        ),
    }


def test_routed_pipeline_single_conv_exchange(shapes):
    """The whole parse->enrich->route plan: ONE exchange (conv_id, reused
    by the coalesce window), both enrichments as expressions (no join
    operator), and exactly the parse UDF's Arrow stages."""
    s = shapes["routed"]
    assert s["exchanges"] <= 1
    assert s["joins"] == []
    assert s["python_stages"] <= 2


def test_training_mix_is_pure_filter_plus_one_aggregate(shapes):
    s = shapes["training_mix"]
    assert s["exchanges"] <= 1
    assert s["joins"] == []
    assert s["python_stages"] == 0


def test_embedding_topk_corpus_never_shuffles(shapes):
    """Corpus side stays in place: the query side broadcasts (no SMJ /
    shuffled join); exchanges are the rank window's tiny key plus, at
    gate scale only, the loader's under-split fan-out (a one-file input
    would otherwise run the cosine folds on 1 of N cores — a real table's
    natural splits skip that branch)."""
    s = shapes["embedding_topk"]
    assert all(j == "BroadcastNestedLoopJoin" or "Broadcast" in j for j in s["joins"])
    assert "SortMergeJoin" not in s["joins"]
    assert "ShuffledHashJoin" not in s["joins"]
    # rank-window key + the loader fan-out appearing on both derived
    # sides of the self-referential corpus/query split + (round 9) the
    # enforced max_queries cap's count window on the QUERY side — the
    # broadcast-small side by the same contract; the corpus side still
    # never exchanges (join assertions above)
    assert s["exchanges"] <= 4
    assert s["python_stages"] == 0


def test_region_rollup_broadcasts_dimensions(shapes):
    """Dimension chain broadcasts onto the fact scan — the fact side never
    shuffles before the rollup aggregate."""
    s = shapes["region_rollup"]
    assert s["joins"] and all("Broadcast" in j for j in s["joins"])
    assert s["exchanges"] <= 1


def test_asof_has_no_join_operator(shapes):
    """The as-of operator itself is union + window: no join operator in
    the plan at all; exchanges are the by-key window plus the gate
    query's right-side uniqueness pre-aggregate."""
    s = shapes["asof"]
    assert s["joins"] == []
    assert s["exchanges"] <= 2
    assert s["python_stages"] == 0


def test_salted_rollup_two_aggregate_exchanges(shapes):
    """Extreme-skew path: (conv_id, salt) then (conv_id) — exactly the
    two-phase shape, nothing more."""
    s = shapes["salted"]
    assert s["exchanges"] <= 3  # two aggregate phases + routed's conv_id
    assert s["joins"] == []


def test_minhash_signatures_shuffle_free_projection(shapes):
    """Signatures are a pure per-row projection (array_min over transform)
    — zero exchanges, zero joins, zero Python."""
    s = shapes["signatures"]
    assert s["exchanges"] == 0
    assert s["joins"] == []
    assert s["python_stages"] == 0


def test_rate_spikes_volume_touches_one_aggregate(spark):
    """Burst detection: the event-volume data crosses exactly one
    aggregate exchange (role, bucket counts with map-side partials);
    the dense-timeline join broadcasts and nothing runs in Python. The
    scan reads only the two columns the query derives from."""
    from otel_logger_spark.queries_extra import q_rate_spikes

    s = shape(q_rate_spikes(spark, SF))
    assert s["python_stages"] == 0
    assert "SortMergeJoin" not in s["joins"]
    assert all("Broadcast" in j for j in s["joins"])
    assert s["exchanges"] <= 4  # count agg + tiny span agg + window key
    assert all("text" not in sc.get("ReadSchema", "") for sc in s["scans"])


def test_pack_shards_two_exchanges_no_python(spark):
    """Packing: one exchange for the (source, bucket) window streams, one
    for the shard-manifest aggregate — integer window arithmetic only."""
    from otel_logger_spark.queries_training import q_pack_shards

    s = shape(q_pack_shards(spark, SF))
    assert s["python_stages"] == 0
    assert s["joins"] == []
    assert s["exchanges"] <= 2


def test_pii_redaction_no_python_no_joins(spark):
    """The redaction report is ONE regex-codegen pass un-pivoted via
    stack(): no UDF, no join, and no union of per-type branches (which
    would re-run every regex per branch — no cross-branch CSE). The
    exchange bound pins single-pass-ness: fan-out repartition + the tiny
    report aggregate."""
    from otel_logger_spark.queries_training import q_pii_redaction

    s = shape(q_pii_redaction(spark, SF))
    assert s["python_stages"] == 0
    assert s["joins"] == []
    assert s["exchanges"] <= 2


def test_zorder_buckets_one_volume_exchange_pruned_scan(spark):
    """Z-order key math: quantize + Morton interleave are pure integer
    codegen, so event volume crosses exactly ONE exchange (the 64-value
    curve-bucket aggregate), and the scan reads only the two curve
    columns — never event payloads."""
    from otel_logger_spark.queries_extra import q_zorder_buckets

    s = shape(q_zorder_buckets(spark, SF))
    assert s["python_stages"] == 0
    assert s["joins"] == []
    assert s["exchanges"] <= 1
    assert s["scans"], "expected a parquet scan"
    for sc in s["scans"]:
        rs = sc.get("ReadSchema", "")
        assert "user_id" in rs and "ts" in rs
        assert "event_type" not in rs and "conv_id" not in rs


def test_cms_sketch_one_aggregate_exchange_no_python(spark):
    """The CMS sketch is ONE aggregation whatever N is: the d-row explode
    is a projection, the (row, bucket) groupBy its only exchange; the
    estimate adds the broadcast of the tiny sketch plus its own final
    agg — never a shuffled join, never Python."""
    from pyspark.sql import functions as F

    from otel_logger_spark.functions.cms import cms_estimate, cms_sketch

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("event_type").alias("k")
    )
    sk = cms_sketch(ev, "k")
    s = shape(sk)
    assert s["exchanges"] <= 1 and s["python_stages"] == 0
    e = shape(cms_estimate(sk, ev, "k"))
    assert e["exchanges"] <= 2 and e["python_stages"] == 0
    assert all(j == "BroadcastHashJoin" for j in e["joins"])


def test_normalized_dedup_stats_pure_codegen_two_exchanges(spark):
    """Normalization is codegen string expressions at the scan; the two
    exchanges are the distinct-aggregate pair the math requires."""
    from otel_logger_spark.functions.normalize import normalized_dedup_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    s = shape(normalized_dedup_stats(docs))
    assert s["exchanges"] <= 2 and s["python_stages"] == 0
    assert s["joins"] == []
    # the scan reads only the two columns the stats need
    assert "doc_id" not in s["scans"][0]["ReadSchema"]


def test_scans_are_column_pruned(shapes):
    """Pushdown evidence: the training-mix scan reads only its two used
    columns, never the documents table's text payload."""
    scans = shapes["training_mix"]["scans"]
    assert scans, "expected a parquet scan in the plan"
    assert all("text" not in s.get("ReadSchema", "") for s in scans)
