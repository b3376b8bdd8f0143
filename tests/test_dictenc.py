"""Dictionary encoding of enum columns (operators/dictenc.py, round 8):
encode->decode identity on arbitrary input (including out-of-enum and
null values), and full-pipeline equality with the flag on vs off."""

from pyspark.sql import functions as F

from otel_logger_spark.operators.dictenc import (
    ROLE_ENUM,
    decode_enums,
    encode_enums,
    tool_enum,
)


def test_encode_decode_identity_arbitrary_values(spark):
    rows = [
        ("user", "search"),
        ("assistant", None),
        ("system", tool_enum()[-1]),
        (None, "not-in-registry"),
        ("moderator", "also-unknown"),  # out-of-enum role
        ("tool", tool_enum()[0]),
    ]
    df = spark.createDataFrame(rows, "role string, tool string")
    enc = encode_enums(df)
    # in-enum values really are tinyint codes; escapes only for unknowns
    assert dict(enc.dtypes)["role"] == "tinyint"
    assert dict(enc.dtypes)["tool"] == "tinyint"
    assert enc.filter(F.col("role_other").isNotNull()).count() == 1
    assert enc.filter(F.col("tool_other").isNotNull()).count() == 2
    got = [(r["role"], r["tool"]) for r in decode_enums(enc).collect()]
    assert sorted(got, key=str) == sorted(rows, key=str)


def test_codes_are_one_based_and_stable(spark):
    df = spark.createDataFrame(
        [(name, None) for name in ROLE_ENUM], "role string, tool string"
    )
    enc = encode_enums(df)
    codes = {r["role_other"]: r["role"] for r in enc.collect()}
    # all known -> no escapes; codes 1..len in enum order
    assert set(codes) == {None} or list(codes) == [None]
    assert sorted(r["role"] for r in enc.collect()) == list(
        range(1, len(ROLE_ENUM) + 1)
    )


def test_pipeline_identical_with_flag(spark, tmp_path):
    """build_parsed(dict_encode_enums=True) must equal the default
    row-for-row on real transcripts (multiline spans included)."""
    from otel_logger_spark.config import PipelineConfig
    from otel_logger_spark.graftdata import load_events_transcripts
    from otel_logger_spark.pipeline import build_parsed

    t = load_events_transcripts(spark, "/root/testdata/sf0.001")
    off = build_parsed(t, config=PipelineConfig(repartition=8))
    on = build_parsed(
        t, config=PipelineConfig(repartition=8, dict_encode_enums=True)
    )
    assert off.columns == on.columns
    cols = [c for c in off.columns if c != "sinks"]  # arrays compare fine too
    a = off.select(*cols).exceptAll(on.select(*cols))
    b = on.select(*cols).exceptAll(off.select(*cols))
    assert a.count() == 0 and b.count() == 0
