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
