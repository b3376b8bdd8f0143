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
