"""Int8 embedding quantization (functions/quantize.py): code range and
boundary mapping, the constant-dimension guard, a pure-Python bit-exact
replay of codes + distances + ranking, and oracle parity at a second
SF."""

import duckdb
import math

from pyspark.sql import functions as F

from otel_logger_spark.functions.quantize import (
    measure_ranges,
    quantized_topk,
    with_quantized,
)

SF = "/root/testdata/sf0.001"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_code_range_and_boundaries(spark):
    df = _emb(spark, [[0.0, -1.0, 5.0], [10.0, 1.0, 5.0], [5.0, 0.0, 5.0]])
    ranges = measure_ranges(df)
    assert ranges == [(0.0, 10.0), (-1.0, 1.0), (5.0, 5.0)]
    codes = {r["vec_id"]: r["qvec"] for r in
             with_quantized(df, ranges).collect()}
    assert codes[0] == [0, 0, 0]        # dim mins -> 0; constant dim -> 0
    assert codes[1] == [255, 255, 0]    # dim maxes -> 255
    assert codes[2] == [127, 127, 0]    # midpoints floor to 127
    assert all(0 <= c <= 255 for v in codes.values() for c in v)


def _py_codes(vecs, ranges):
    out = []
    for v in vecs:
        cs = []
        for x, (mn, mx) in zip(v, ranges):
            span = (mx - mn) if mx > mn else 1.0
            # float32 -> double, then the same left-associated expression
            cs.append(max(0, min(255, math.floor((x - mn) * 255.0 / span))))
        out.append(cs)
    return out


def test_python_bitexact_replay_of_topk(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ranges = measure_ranges(emb)
    queries = emb.filter(F.col("vec_id") < 5)
    got = sorted(map(tuple, quantized_topk(emb, queries, ranges, k=3).collect()))

    rows = emb.select("vec_id", F.col("embedding").cast("array<double>")
                      .alias("v")).collect()
    ids = [r["vec_id"] for r in rows]
    codes = dict(zip(ids, _py_codes([r["v"] for r in rows], ranges)))
    want = []
    for qid in [i for i in ids if i < 5]:
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(codes[nid], codes[qid])), nid)
            for nid in ids if nid != qid
        )
        for rank, (d, nid) in enumerate(ds[:3], 1):
            want.append((qid, nid, d, rank))
    assert got == sorted(want)


def test_oracle_parity_second_sf(spark):
    from otel_logger_spark.queries_training import (
        _o_quantized_ann,
        q_quantized_ann,
    )

    got = sorted(map(tuple, q_quantized_ann(spark, SF).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = sorted(map(tuple, con.execute(_o_quantized_ann()).fetchall()))
    assert got == want


def test_d512_constant_plan_size_and_correctness(spark):
    """Round 7: real embedding dims are 768-4096 — the quantize
    expression must stay constant-size in D (two array literals + a
    zip_with chain), never per-index unrolling (O(D^2) optimized tree).
    Pins (a) structural shape, (b) bit-exact codes at D=512 vs the
    pure-Python replay, (c) a generous wall bound that the unrolled
    form could not meet."""
    import time

    import numpy as np

    D, N = 512, 120
    # round through float32 up front: the table column is array<float>,
    # so the replay must see the same float32-rounded values Spark stores
    vecs = [
        [float(np.float32(math.sin(0.1 * i * (j + 1)) * (j % 7 + 1)))
         for j in range(D)]
        for i in range(N)
    ]
    df = _emb(spark, vecs)

    t0 = time.monotonic()
    ranges = measure_ranges(df)
    assert len(ranges) == D
    q = with_quantized(df, ranges)
    # structural pin: the code expression references the vector through
    # exactly two zip_with nodes, zero per-index accesses
    plan = q._jdf.queryExecution().analyzed().toString()
    assert plan.count("zip_with") == 2
    assert "embedding#" in plan and "[511]" not in plan

    top = quantized_topk(df, df.filter(F.col("vec_id") < 3), ranges, k=3)
    got = sorted(map(tuple, top.collect()))
    wall = time.monotonic() - t0
    assert wall < 60, f"D=512 quantize+topk took {wall:.1f}s"

    codes = dict(zip(range(N), _py_codes(vecs, ranges)))
    want = []
    for qid in range(3):
        ds = sorted(
            (sum((a - b) ** 2 for a, b in zip(codes[nid], codes[qid])), nid)
            for nid in range(N) if nid != qid
        )
        for rank, (d, nid) in enumerate(ds[:3], 1):
            want.append((qid, nid, d, rank))
    assert got == sorted(want)
