"""Real WAV codec (functions/multimodal.py round 8): stdlib parse of
canonical 16-bit PCM WAV + numpy sample statistics, the audio analog of
the BMP path. Pins generator/decoder round-trips, the int16 abs-overflow
edge (-32768), an independent pure-python stats replay, strict sniff
rejection, per-row decoder dispatch inside decode_audio, and the gate
oracle's per-sample SQL replay at a second SF."""

import struct

import duckdb
import pytest

from otel_logger_spark.functions.multimodal import (
    as_media,
    decode_audio,
    decode_wav,
    make_wav,
    parse_wav_header,
    wav_fixture_rows,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_header_all_fixtures():
    for fid, data in wav_fixture_rows():
        nc, sr, size = parse_wav_header(data)
        # header says what the generator was asked for
        g_nc, g_sr = struct.unpack_from("<HI", data, 22)
        assert (nc, sr) == (g_nc, g_sr)
        assert size == len(data) - 44
        dec_sr, dec_nc, n_frames, duration_ms, _, _ = decode_wav(data)
        assert (dec_sr, dec_nc) == (sr, nc)
        assert n_frames == size // (2 * nc)
        assert duration_ms == (1000 * n_frames) // sr


def test_full_scale_negative_sample_abs_overflow_edge():
    """abs(int16 -32768) overflows int16 — the decoder must report
    peak_abs 32768, not -32768 or garbage."""
    body = struct.pack("<4h", -32768, 32767, 0, -1)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
        b"data", len(body),
    )
    sr, nc, n_frames, duration_ms, peak, meansq = decode_wav(hdr + body)
    assert (sr, nc, n_frames) == (8000, 1, 4)
    assert peak == 32768
    assert meansq == (32768**2 + 32767**2 + 0 + 1) // 4


def test_stats_pure_python_replay():
    """numpy stats must equal an independent stdlib replay: unpack every
    int16 word, MAX(ABS), SUM(v*v)//n."""
    data = make_wav(100, 16000, 2, seed=7)
    nc, sr, size = parse_wav_header(data)
    vals = struct.unpack_from(f"<{size // 2}h", data, 44)
    _, _, _, _, peak, meansq = decode_wav(data)
    assert peak == max(abs(v) for v in vals)
    assert meansq == sum(v * v for v in vals) // len(vals)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"RIFF",
        "RIFF plain text that happens to start with the magic".encode(),
        b"\x00" * 100,
        make_wav(10)[:-1],  # truncated sample words
        make_wav(10)[:40],  # truncated header
    ],
)
def test_sniff_rejects_non_wav(payload):
    assert parse_wav_header(payload) is None


def test_sniff_rejects_inconsistent_header_fields():
    good = bytearray(make_wav(10, 16000, 1))
    bad_fmt = bytearray(good)
    struct.pack_into("<H", bad_fmt, 20, 3)  # IEEE float, not PCM
    assert parse_wav_header(bytes(bad_fmt)) is None
    bad_bits = bytearray(good)
    struct.pack_into("<H", bad_bits, 34, 8)
    assert parse_wav_header(bytes(bad_bits)) is None
    bad_rate = bytearray(good)
    struct.pack_into("<I", bad_rate, 28, 999)  # byte_rate != sr * align
    assert parse_wav_header(bytes(bad_rate)) is None
    bad_size = bytearray(good)
    struct.pack_into("<I", bad_size, 40, 21)  # not whole-frame sized
    assert parse_wav_header(bytes(bad_size)) is None


def test_decode_audio_per_row_dispatch(spark):
    """Mixed batch: WAV payloads take the real codec (decoder='wav',
    true header fields + true sample stats), text payloads the
    deterministic fake."""
    wav = make_wav(37, 22050, 1, seed=13)
    rows = [
        (1, "audio", bytearray(wav), {"codec": "wav"}),
        (2, "audio", bytearray("plain text payload".encode()), {"codec": "fake"}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, kind string, data binary, media_meta map<string,string>"
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["decoder"] == "wav"
    assert (got[1]["sample_rate"], got[1]["n_channels"], got[1]["n_frames"]) == (
        22050, 1, 37,
    )
    assert got[1][6:9] == tuple(decode_wav(wav)[3:])
    assert got[2]["decoder"] == "fake"
    n = len("plain text payload")
    assert (got[2]["n_frames"], got[2]["peak_abs"], got[2]["meansq"]) == (
        n, n % 32768, (n * 37) % 1048576,
    )


def test_corpus_text_never_sniffs_as_wav(spark):
    """The gate's corpus leg relies on text payloads always taking the
    fake path — check every document at the test SF."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = decode_audio(as_media(docs))
    assert out.filter("decoder <> 'fake'").count() == 0


def test_gate_oracle_replays_samples_second_sf(spark):
    from otel_logger_spark.queries_training import _o_audio_stats, q_audio_stats

    sql = _o_audio_stats()
    # the oracle must NOT carry the generator's arguments — only byte
    # parsing (header ints + the per-sample hex walk)
    assert "substring(f.h, 89 + 4 * r.range" in sql and "16777216" in sql
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(sql).fetchall()}
    got = {tuple(r) for r in q_audio_stats(spark, SF).collect()}
    assert got == exp
    assert sum(1 for t in got if t[9] == "wav") == 8
