"""The brute-force ANN reference shapes (cosine_topk, quantized_topk)
score the full corpus per query row; round 9 enforces their small-query
contract IN-PLAN (verdict r8 #6): an assert_true fed by a count window
over the query side, routed through the query-id column so the optimizer
cannot prune it. Below the cap results are unchanged; above it the job
fails loudly instead of silently going quadratic."""

import pytest
from pyspark.sql import functions as F

from otel_logger_spark.functions.quantize import measure_ranges, quantized_topk
from otel_logger_spark.functions.similarity import cosine_topk


def _emb(spark, n=30, d=4):
    rows = [
        (i, [((i * 31 + j * 7) % 97) / 97.0 for j in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_cap_silent_below_and_fires_above(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    base = sorted(map(tuple, cosine_topk(emb, q, k=2, max_queries=None).collect()))
    capped = sorted(map(tuple, cosine_topk(emb, q, k=2, max_queries=8).collect()))
    assert base == capped  # the guard is value-neutral under the cap
    with pytest.raises(Exception, match="max_queries=2"):
        cosine_topk(emb, q, k=2, max_queries=2).collect()


def test_quantized_topk_cap_fires(spark):
    emb = _emb(spark)
    ranges = measure_ranges(emb)
    q = emb.filter(F.col("vec_id") < 4)
    ok = quantized_topk(emb, q, ranges, k=2)
    assert ok.count() == 8
    with pytest.raises(Exception, match="quantized_topk: query side exceeds"):
        quantized_topk(emb, q, ranges, k=2, max_queries=3).collect()
