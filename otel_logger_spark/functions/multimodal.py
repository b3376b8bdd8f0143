"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The decode libraries
(PIL/ffmpeg/librosa) are NOT in this container, so the codec step is
stubbed (import-try + deterministic fake) while everything Spark-side —
schema, batch iteration, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib

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


def _decode_real(data: bytes, kind: str):
    raise NotImplementedError(
        "real media decode needs PIL/ffmpeg which this container lacks; "
        "the deterministic fake below exercises the identical Spark plumbing"
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
            widths, heights, phashes = [], [], []
            for data in pdf["data"]:
                b = bytes(data) if data is not None else b""
                if use_real and HAVE_PIL:
                    w, h, p = _decode_real(b, "image")
                else:
                    w, h, p = _decode_fake(b, "")
                widths.append(w)
                heights.append(h)
                phashes.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "phash": pd.Series(phashes, dtype="int64"),
                    "decoder": "pil" if (use_real and HAVE_PIL) else "fake",
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)
