"""Multimodal column plumbing: treat non-text payloads (the `html`
binary column of the mandated pages shape, and by extension image/audio/
video bytes) as opaque `binary` columns with typed metadata extracted by
Arrow-batched mapInPandas UDFs.

What is REAL here (and tested): the Spark-side plumbing — schema, batch
shape, vectorized byte-level feature extraction (length, Shannon entropy,
magic-number sniff), and the deterministic fake decode. What is STUBBED:
actual media decoding (`decode_image`) — no image/audio libraries exist
in this container, so it raises NotImplementedError by design; a
deployment swaps in PIL/ffmpeg inside the same UDF without touching the
plan. The fake decode derives stable pseudo-dimensions from the payload
hash so downstream schema/partitioning logic is exercised end-to-end.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from . import hashing as H

#: magic-number table (prefix -> modality tag); html is the corpus's
#: native payload, the image/audio rows exercise the sniffing path
_MAGIC = [
    (b"<html>", "html"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/avi containers
    (b"OggS", "ogg"),
]


def sniff_magic(data: bytes) -> str:
    for prefix, tag in _MAGIC:
        if data.startswith(prefix):
            return tag
    return "unknown"


def byte_entropy(data: bytes) -> float:
    """Shannon entropy (bits/byte) of the payload — a cheap modality cue
    (compressed media ~8, text ~4-5, empty -> 0)."""
    if not data:
        return 0.0
    counts = np.bincount(np.frombuffer(data, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / len(data)
    return float(-(p * np.log2(p)).sum())


def decode_image(data: bytes):
    """Real media decode — STUB. No image/audio codec libraries exist in
    this environment; deployments replace this body with PIL/ffmpeg. The
    pipeline never calls it unless cfg-level real decoding is requested."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg, not available in this environment"
    )


def fake_decode_dims(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: pseudo width/height derived from
    the payload's FNV-1a hash — stable across runs/partitions so tests can
    assert exact values while the real decoder is stubbed."""
    h = H.fnv1a64(data[:64])
    return 16 + (h & 0x3FF), 16 + ((h >> 10) & 0x3FF)


MODALITY_FEATURES_COLUMNS = [
    "url", "n_bytes", "entropy", "magic", "fake_width", "fake_height"
]


def modality_features_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("entropy", T.DoubleType(), False),
            T.StructField("magic", T.StringType(), False),
            T.StructField("fake_width", T.LongType(), False),
            T.StructField("fake_height", T.LongType(), False),
        ]
    )


def features_one(url: str, data: bytes | None) -> dict:
    data = data or b""
    w, h = fake_decode_dims(data)
    return {
        "url": url,
        "n_bytes": len(data),
        "entropy": round(byte_entropy(data), 6),
        "magic": sniff_magic(data),
        "fake_width": int(w),
        "fake_height": int(h),
    }


def make_modality_features_fn():
    """mapInPandas fn: (url, payload binary) -> typed modality metadata.
    Arrow batches in, Arrow batches out — no per-row Python UDF."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [
                features_one(u, d)
                for u, d in zip(pdf["url"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=MODALITY_FEATURES_COLUMNS)

    return fn


def modality_features(pages_df):
    """pages(url, html, ...) -> modality metadata table. Column-pruned to
    (url, payload) before the Arrow boundary (P1)."""
    from pyspark.sql import functions as F

    narrow = pages_df.select("url", F.col("html").alias("payload"))
    return narrow.mapInPandas(
        make_modality_features_fn(), modality_features_schema()
    )
