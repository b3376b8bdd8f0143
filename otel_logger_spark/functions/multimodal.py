"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The heavyweight decode
libraries (PIL/ffmpeg/librosa) are NOT in this container, so those codec
steps are stubbed (import-try + deterministic fake) while everything
Spark-side — schema, batch iteration, partitioning, UDF signatures — is
real and tested.

TWO codecs ARE real (round 8, VERDICT r7 #6): uncompressed 24-bit BMP
needs no library — ``parse_bmp_header``/``decode_bmp`` below are a
stdlib-only parser (magic, BITMAPINFOHEADER, bottom-up/top-down pixel
rows with 4-byte stride padding) plus a genuine 8x8 average-hash over
integer-grayscale samples. ``decode_media`` sniffs each payload: a
valid BMP takes the real path (decoder='bmp'), everything else falls
back to PIL (absent here) or the deterministic fake. The sniff is
strict (exact magic, biSize=40, planes=1, bpp=24, compression=0, dim
bounds, pixel-array bounds) so opaque text/audio payloads can never
mis-parse — the header requires NUL bytes no UTF-8 text corpus carries.

The audio analog is canonical 16-bit PCM WAV (RIFF/WAVE/fmt/data, the
44-byte layout every uncompressed recorder writes):
``parse_wav_header``/``decode_wav`` parse the header and compute true
sample statistics (peak amplitude, integer mean-square energy) over the
int16 frames with numpy — int64 accumulation so a full-scale -32768
sample can't overflow. ``decode_audio`` is the mapInPandas stage: valid
WAV rows take the real path (decoder='wav'), opaque payloads the
deterministic fake. Strictness mirrors the BMP sniff: exact magics at
three offsets, PCM format 1, 16-bit, byte_rate/block_align consistency
— no text corpus byte string can satisfy all of it by accident.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if ever available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, data binary, media_meta map<string,string>"
)

DECODED_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, width int, height int, "
    "phash bigint, decoder string"
)


def as_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as fake media rows (UTF-8 bytes as the opaque
    payload) — exercises the binary-column plumbing end to end."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.create_map(
            F.lit("codec"), F.lit("fake"), F.lit("src"), F.lit("documents")
        ).alias("media_meta"),
    )


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A real uncompressed 24-bit BMP (bottom-up, BITMAPINFOHEADER, rows
    padded to 4 bytes) with pixels deterministic in (seed, x, y) — the
    fixture generator for the codec tests and the gate oracle."""
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    row = width * 3
    stride = (row + 3) & ~3
    pix = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up row order
        for x in range(width):
            for c in range(3):  # stored B,G,R
                pix.append((seed * 73 + y * 31 + x * 7 + c * 11) % 256)
        pix.extend(b"\x00" * (stride - row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix),
        2835, 2835, 0, 0,
    )
    return bytes(header + info + pix)


def parse_bmp_header(data: bytes) -> tuple[int, int, int, int] | None:
    """(width, abs_height, pixel_offset, row_stride) for a valid
    uncompressed 24-bit BMP, else None. Strict on purpose: every field
    the decoder relies on is checked, so arbitrary binary/text payloads
    fall through to the fake path instead of mis-decoding. Height may be
    negative in the header (top-down) — ``decode_bmp`` handles both."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    offset = struct.unpack_from("<I", data, 10)[0]
    bisize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bisize != 40 or planes != 1 or bpp != 24 or comp != 0:
        return None
    if not (0 < w <= 1 << 14) or not (0 < abs(h) <= 1 << 14):
        return None
    stride = (w * 3 + 3) & ~3
    if offset < 54 or offset + stride * abs(h) > len(data):
        return None
    return w, h, offset, stride


def decode_bmp(data: bytes) -> tuple[int, int, int]:
    """(width, height, phash) via the REAL codec path: parse the header,
    read actual pixel rows (bottom-up or top-down), and compute a true
    8x8 average-hash — integer grayscale (299r+587g+114b)//1000 sampled
    on the (2i+1)/16 grid (total for any dims >= 1x1), bit k set iff
    sample k exceeds the integer mean. phash is returned int64-signed
    (two's complement) to match the DECODED_SCHEMA column."""
    hdr = parse_bmp_header(data)
    if hdr is None:
        raise ValueError("not a supported BMP payload")
    w, h, offset, stride = hdr
    ah, topdown = abs(h), h < 0

    def gray(x: int, y: int) -> int:
        row = y if topdown else ah - 1 - y
        i = offset + row * stride + x * 3
        b, g, r = data[i], data[i + 1], data[i + 2]
        return (299 * r + 587 * g + 114 * b) // 1000

    samples = [
        gray(((2 * sx + 1) * w) // 16, ((2 * sy + 1) * ah) // 16)
        for sy in range(8)
        for sx in range(8)
    ]
    mean = sum(samples) // 64
    bits = 0
    for k, s in enumerate(samples):
        if s > mean:
            bits |= 1 << k
    if bits >= 1 << 63:
        bits -= 1 << 64
    return w, ah, bits


AUDIO_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, sample_rate int, "
    "n_channels int, n_frames bigint, duration_ms bigint, peak_abs int, "
    "meansq bigint, decoder string"
)


def make_wav(
    n_frames: int, sample_rate: int = 16000, n_channels: int = 1, seed: int = 0
) -> bytes:
    """A real canonical 16-bit PCM WAV (RIFF + 16-byte fmt + data, 44-byte
    header) with int16 samples deterministic in (seed, frame, channel) —
    the fixture generator for the codec tests and the gate oracle. The
    sample formula deliberately reaches the full int16 range including
    -32768 (the abs-overflow edge)."""
    if n_frames < 1 or n_channels < 1:
        raise ValueError(f"bad wav shape {n_frames}x{n_channels}")
    data_size = n_frames * n_channels * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + data_size, b"WAVE",
        b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
        b"data", data_size,
    )
    body = bytearray()
    for i in range(n_frames):
        for ch in range(n_channels):
            v = (seed * 2654435761 + i * 40503 + ch * 9973) % 65536 - 32768
            body += struct.pack("<h", v)
    return hdr + bytes(body)


def parse_wav_header(data: bytes) -> tuple[int, int, int] | None:
    """(n_channels, sample_rate, data_size) for a valid canonical 16-bit
    PCM WAV, else None. Strict on purpose, like parse_bmp_header: three
    exact magics, fmt size 16, PCM format 1, 16-bit, byte_rate and
    block_align arithmetic consistency, bounded rate/channels, data chunk
    within the payload and whole-frame sized — so arbitrary binary/text
    payloads fall through to the fake path instead of mis-decoding."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    if data[12:16] != b"fmt " or data[36:40] != b"data":
        return None
    fmt_size, audio_fmt, n_channels, sample_rate, byte_rate, block_align, bits = (
        struct.unpack_from("<IHHIIHH", data, 16)
    )
    if fmt_size != 16 or audio_fmt != 1 or bits != 16:
        return None
    if not (1 <= n_channels <= 8) or not (8000 <= sample_rate <= 192000):
        return None
    if block_align != n_channels * 2 or byte_rate != sample_rate * block_align:
        return None
    data_size = struct.unpack_from("<I", data, 40)[0]
    if data_size <= 0 or 44 + data_size > len(data) or data_size % block_align:
        return None
    return n_channels, sample_rate, data_size


def decode_wav(data: bytes) -> tuple[int, int, int, int, int, int]:
    """(sample_rate, n_channels, n_frames, duration_ms, peak_abs, meansq)
    via the REAL codec path: parse the header, then numpy over the actual
    int16 sample words. peak_abs is max |sample| (int64 cast first —
    abs(-32768) overflows int16), meansq is the exact integer mean of
    squares (sum(v*v) DIV n, int64-safe: 32768^2 * n_samples needs ~2^30
    headroom per billion samples)."""
    import numpy as np

    hdr = parse_wav_header(data)
    if hdr is None:
        raise ValueError("not a canonical 16-bit PCM WAV payload")
    n_channels, sample_rate, data_size = hdr
    n = data_size // 2
    vals = np.frombuffer(data, dtype="<i2", count=n, offset=44).astype(np.int64)
    n_frames = n // n_channels
    duration_ms = (1000 * n_frames) // sample_rate
    peak_abs = int(np.abs(vals).max())
    meansq = int((vals * vals).sum() // n)
    return sample_rate, n_channels, n_frames, duration_ms, peak_abs, meansq


def _audio_fake(data: bytes) -> tuple[int, int, int, int, int, int]:
    """Deterministic fake audio stats for opaque (non-WAV) payloads —
    every field a simple integer function of the byte length so the gate
    oracle can replay it from strlen(text)."""
    n = len(data)
    return 16000, 1, n, (1000 * n) // 16000, n % 32768, (n * 37) % 1048576


def decode_audio(df: DataFrame) -> DataFrame:
    """mapInPandas audio-decode stage: binary in, typed sample statistics
    out. Valid canonical PCM WAV payloads take decode_wav (the REAL
    codec); everything else the deterministic fake over identical
    plumbing. Arrow-sized batches bound executor memory regardless of
    scale, same contract as decode_media."""

    def run(batches):
        for pdf in batches:
            cols: dict[str, list] = {
                "sample_rate": [], "n_channels": [], "n_frames": [],
                "duration_ms": [], "peak_abs": [], "meansq": [], "decoder": [],
            }
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                if parse_wav_header(b) is not None:
                    sr, nc, nf, dur, peak, msq = decode_wav(b)
                    dec = "wav"
                else:
                    sr, nc, nf, dur, peak, msq = _audio_fake(b)
                    dec = "fake"
                cols["sample_rate"].append(sr)
                cols["n_channels"].append(nc)
                cols["n_frames"].append(nf)
                cols["duration_ms"].append(dur)
                cols["peak_abs"].append(peak)
                cols["meansq"].append(msq)
                cols["decoder"].append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(
                        lambda d: len(d) if d is not None else 0
                    ),
                    "sample_rate": pd.Series(cols["sample_rate"], dtype="int32"),
                    "n_channels": pd.Series(cols["n_channels"], dtype="int32"),
                    "n_frames": pd.Series(cols["n_frames"], dtype="int64"),
                    "duration_ms": pd.Series(cols["duration_ms"], dtype="int64"),
                    "peak_abs": pd.Series(cols["peak_abs"], dtype="int32"),
                    "meansq": pd.Series(cols["meansq"], dtype="int64"),
                    "decoder": cols["decoder"],
                }
            )

    return df.mapInPandas(run, AUDIO_SCHEMA)


# WAV gate fixture: doc_ids below -100 keep them disjoint from both the
# corpus and the BMP fixtures; shapes cover a single frame, odd frame
# counts, mono/stereo, the full supported rate range, and enough samples
# (1000 frames stereo) that the oracle's per-sample SQL replay is a real
# workout. The gate oracle re-derives channels/rate/size AND the sample
# statistics in SQL from the raw bytes — see
# queries_training._o_audio_stats.
WAV_FIXTURE_SPECS: list[tuple[int, int, int, int, int]] = [
    (-101, 1, 8000, 1, 3),
    (-102, 37, 16000, 1, 5),
    (-103, 100, 16000, 2, 7),
    (-104, 256, 44100, 2, 11),
    (-105, 3, 22050, 1, 13),
    (-106, 500, 48000, 1, 17),
    (-107, 64, 11025, 1, 19),
    (-108, 1000, 8000, 2, 23),
]


def wav_fixture_rows() -> list[tuple[int, bytes]]:
    """[(doc_id, wav_bytes)] — deterministic, shared by the Spark gate
    leg and the DuckDB oracle generator."""
    return [
        (fid, make_wav(nf, sr, nc, seed))
        for fid, nf, sr, nc, seed in WAV_FIXTURE_SPECS
    ]


def _decode_real(data: bytes, kind: str):
    raise NotImplementedError(
        "real media decode beyond BMP needs PIL/ffmpeg which this "
        "container lacks; BMP payloads take decode_bmp above, everything "
        "else the deterministic fake exercising the identical plumbing"
    )


def _decode_fake(data: bytes, kind: str) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from payload length,
    perceptual-hash stand-in from a real digest of the bytes."""
    n = len(data)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 433)
    phash = int.from_bytes(hashlib.sha256(data).digest()[:8], "big") - (1 << 63)
    return width, height, phash


def resize_media(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stage: binary in, binary out with updated metadata. The codec
    is stubbed (deterministic byte-fold standing in for a real resampler),
    the Spark plumbing — binary column through Arrow batches, metadata map
    update — is real."""

    def run(batches):
        for pdf in batches:
            out_bytes = []
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                target = max(1, (width * height) // 64)
                folded = (b * ((target // max(len(b), 1)) + 1))[:target]
                out_bytes.append(folded)
            meta = pdf["media_meta"].map(
                lambda m: {**(m or {}), "resized": f"{width}x{height}"}
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "data": out_bytes,
                    "media_meta": meta,
                }
            )

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (frame payloads are deterministic byte slices — the stub — but the
    row-explosion shape, schema and batch iteration are the real pipeline).
    Non-video rows pass through as a single frame 0."""

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "frame_idx": [], "frame": []}
            for doc_id, kind, data in zip(pdf["doc_id"], pdf["kind"], pdf["data"]):
                b = bytes(data) if data is not None else b""
                if kind == "video" and len(b) > every_n:
                    n = min(max_frames, max(1, len(b) // every_n))
                    for f in range(n):
                        rows["doc_id"].append(doc_id)
                        rows["kind"].append(kind)
                        rows["frame_idx"].append(f * every_n)
                        rows["frame"].append(b[f * every_n : f * every_n + every_n])
                else:
                    rows["doc_id"].append(doc_id)
                    rows["kind"].append(kind)
                    rows["frame_idx"].append(0)
                    rows["frame"].append(b)
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        run, "doc_id bigint, kind string, frame_idx int, frame binary"
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extraction stage: payload -> fixed-width float vector. The
    featurizer is a deterministic digest fold (model inference is stubbed);
    output shape matches what an embedding column consumer expects
    (array<float>, unit scale)."""

    def run(batches):
        for pdf in batches:
            vecs = []
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                d = hashlib.sha256(b).digest()
                raw = [d[i % 32] for i in range(dim)]
                vecs.append([round(x / 255.0, 6) for x in raw])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": vecs})

    return df.mapInPandas(run, "doc_id bigint, features array<float>")


def decode_media(df: DataFrame, use_real: bool = False) -> DataFrame:
    """mapInPandas decode stage: binary in, typed metadata out. Batches are
    Arrow-sized, so executor memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch regardless of scale."""

    def run(batches):
        for pdf in batches:
            widths, heights, phashes, decoders = [], [], [], []
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                if parse_bmp_header(b) is not None:
                    w, h, p = decode_bmp(b)  # the REAL codec path
                    dec = "bmp"
                elif use_real and HAVE_PIL:
                    w, h, p = _decode_real(b, "image")
                    dec = "pil"
                else:
                    w, h, p = _decode_fake(b, "")
                    dec = "fake"
                widths.append(w)
                heights.append(h)
                phashes.append(p)
                decoders.append(dec)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "phash": pd.Series(phashes, dtype="int64"),
                    "decoder": decoders,
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


# BMP gate fixture: negative doc_ids keep it disjoint from any corpus
# doc_id; dims cover 1x1, non-multiple-of-4 widths (stride padding), and
# a wide/flat case. The gate oracle re-derives width/height in SQL from
# the HEADER BYTES of these exact payloads (hex-literal VALUES +
# little-endian byte arithmetic) — see queries_training._o_multimodal_decode.
BMP_FIXTURE_SPECS: list[tuple[int, int, int, int]] = [
    (-1, 1, 1, 3),
    (-2, 2, 3, 5),
    (-3, 5, 4, 7),
    (-4, 8, 8, 11),
    (-5, 13, 7, 13),
    (-6, 16, 16, 17),
    (-7, 31, 2, 19),
    (-8, 64, 37, 23),
]


def bmp_fixture_rows() -> list[tuple[int, bytes]]:
    """[(doc_id, bmp_bytes)] — deterministic, shared by the Spark gate
    leg and the DuckDB oracle generator."""
    return [
        (fid, make_bmp(w, h, seed)) for fid, w, h, seed in BMP_FIXTURE_SPECS
    ]
