"""Real BMP codec (functions/multimodal.py round 8): stdlib-only parse of
uncompressed 24-bit BMPs + genuine 8x8 average-hash, the one codec path
that is NOT a deterministic fake. Pins generator/decoder round-trips,
stride padding, top-down handling, strict sniff rejection, the per-row
decoder dispatch inside decode_media, and the gate oracle's SQL
header-byte parse at a second SF."""

import struct

import duckdb
import pytest

from otel_logger_spark.functions.multimodal import (
    as_media,
    bmp_fixture_rows,
    decode_bmp,
    decode_media,
    make_bmp,
    parse_bmp_header,
)

SF = "/root/testdata/sf0.001"


def test_roundtrip_dims_all_fixtures():
    for fid, data in bmp_fixture_rows():
        w, h, _ = decode_bmp(data)
        hdr = parse_bmp_header(data)
        assert (w, h) == (hdr[0], abs(hdr[1]))
        # header says what the generator was asked for
        gw, gh = struct.unpack_from("<ii", data, 18)
        assert (w, h) == (gw, gh)


def test_stride_padding_width_not_multiple_of_4():
    # width 5 -> row 15 bytes -> stride 16: decoder must skip the pad
    data = make_bmp(5, 4, seed=7)
    w, h, offset, stride = parse_bmp_header(data)
    assert (w, h, stride) == (5, 4, 16)
    assert len(data) == 54 + stride * 4


def test_topdown_negative_height_same_pixels_same_hash():
    """A top-down BMP (negative biHeight) storing rows in reversed order
    is the SAME image — decode_bmp must produce the identical phash."""
    up = bytearray(make_bmp(8, 6, seed=3))
    w, h, offset, stride = parse_bmp_header(bytes(up))
    rows = [
        bytes(up[offset + i * stride : offset + (i + 1) * stride])
        for i in range(h)
    ]
    down = bytearray(up[:offset]) + b"".join(reversed(rows))
    struct.pack_into("<i", down, 22, -h)  # mark top-down
    assert decode_bmp(bytes(up)) == decode_bmp(bytes(down))


def test_phash_pure_python_replay():
    """The average-hash must equal an independent replay of its spec:
    integer grayscale at the (2i+1)/16 sample grid, bit k iff > mean."""
    data = make_bmp(16, 16, seed=17)
    w, h, offset, stride = parse_bmp_header(data)

    def px(x, y):  # bottom-up storage
        i = offset + (h - 1 - y) * stride + x * 3
        return data[i], data[i + 1], data[i + 2]

    samples = []
    for sy in range(8):
        for sx in range(8):
            b, g, r = px(((2 * sx + 1) * w) // 16, ((2 * sy + 1) * h) // 16)
            samples.append((299 * r + 587 * g + 114 * b) // 1000)
    mean = sum(samples) // 64
    bits = sum(1 << k for k, s in enumerate(samples) if s > mean)
    if bits >= 1 << 63:
        bits -= 1 << 64
    assert decode_bmp(data)[2] == bits


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"BM",
        "BM just text that happens to start with the magic".encode(),
        b"\x00" * 100,
        make_bmp(5, 4)[:-1],  # truncated pixel array
        make_bmp(5, 4)[:40],  # truncated header
    ],
)
def test_sniff_rejects_non_bmp(payload):
    assert parse_bmp_header(payload) is None


def test_sniff_rejects_wrong_bpp_or_compression():
    good = bytearray(make_bmp(4, 4))
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 8)
    assert parse_bmp_header(bytes(bad_bpp)) is None
    bad_comp = bytearray(good)
    struct.pack_into("<I", bad_comp, 30, 1)  # BI_RLE8
    assert parse_bmp_header(bytes(bad_comp)) is None


def test_decode_media_per_row_dispatch(spark):
    """Mixed batch: BMP payloads take the real codec (decoder='bmp',
    true header dims), text payloads the deterministic fake."""
    bmp = make_bmp(13, 7, seed=13)
    rows = [
        (1, "image", bytearray(bmp), {"codec": "bmp"}),
        (2, "image", bytearray("plain text payload".encode()), {"codec": "fake"}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, kind string, data binary, media_meta map<string,string>"
    )
    got = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert got[1]["decoder"] == "bmp"
    assert (got[1]["width"], got[1]["height"]) == (13, 7)
    assert got[2]["decoder"] == "fake"
    n = len("plain text payload")
    assert (got[2]["width"], got[2]["height"]) == (64 + n % 577, 64 + (n * 31) % 433)


def test_corpus_text_never_sniffs_as_bmp(spark):
    """The gate's corpus leg relies on text payloads always taking the
    fake path — check every document at the test SF."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = decode_media(as_media(docs))
    assert out.filter("decoder <> 'fake'").count() == 0


def test_gate_oracle_parses_header_bytes_second_sf(spark, monkeypatch):
    from otel_logger_spark.queries_training import (
        _o_multimodal_decode,
        q_multimodal_decode,
    )

    sql = _o_multimodal_decode()
    # the oracle must NOT carry the generator's dims — only byte parsing
    assert "substring(h," in sql and "16777216" in sql
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = {tuple(r) for r in con.sql(sql).fetchall()}
    got = {
        (r["doc_id"], r["kind"], r["n_bytes"], r["width"], r["height"], r["decoder"])
        for r in q_multimodal_decode(spark, SF).collect()
    }
    assert got == exp
    assert sum(1 for t in got if t[5] == "bmp") == 8
