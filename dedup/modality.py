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

import hashlib

import numpy as np

from . import hashing as H

#: resize/frame-sample parameters shared by the Spark wrappers, the
#: per-row kernels, AND the contract-oracle reference builders — one
#: constant each, so the twin can never silently diverge from the query
#: over a default-argument edit.
THUMB_MAX_DIM = 64
FRAME_EVERY_N = 4

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


def resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving clamp to max_dim on the long side — pure integer
    math (floor), so every engine and the single-process reference agree
    exactly. The REAL pixel resample lives behind the same decode stub as
    decode_image; this is the dimension plan a deployment's PIL/ffmpeg
    call receives."""
    if max(w, h) <= max_dim:
        return int(w), int(h)
    if w >= h:
        return int(max_dim), max(1, (h * max_dim) // w)
    return max(1, (w * max_dim) // h), int(max_dim)


THUMBNAIL_COLUMNS = [
    "url", "src_width", "src_height", "out_width", "out_height", "thumb_sha"
]


def thumbnail_one(url: str, data: bytes | None, max_dim: int = THUMB_MAX_DIM) -> dict:
    """Resize plumbing for one payload: source dims from the (stubbed)
    decode, integer aspect-clamped output dims, and a deterministic fake
    thumbnail fingerprint (sha256 of payload head + planned dims) standing
    in for the resampled bytes — stable across runs/partitions so the
    downstream schema and tests are exact while the codec is stubbed."""
    data = data or b""
    w, h = fake_decode_dims(data)
    ow, oh = resize_dims(w, h, max_dim)
    sha = hashlib.sha256(data[:64] + f"|{ow}x{oh}".encode()).hexdigest()
    return {
        "url": url,
        "src_width": int(w),
        "src_height": int(h),
        "out_width": int(ow),
        "out_height": int(oh),
        "thumb_sha": sha,
    }


def fake_frame_count(data: bytes) -> int:
    """Deterministic stand-in for container probing: 1..24 pseudo-frames
    derived from the payload hash (a real deployment asks ffprobe)."""
    return 1 + int((H.fnv1a64(data[:64]) >> 20) % 24)


FRAME_SAMPLE_COLUMNS = ["url", "frame_no", "n_frames", "frame_sha"]


def frame_sample_rows(
    url: str, data: bytes | None, every_n: int = FRAME_EVERY_N
) -> list[dict]:
    """Frame-sampling plumbing for one payload: every_n-th frame index of
    the (fake) frame count, each with a deterministic fake frame
    fingerprint. The 1->N row expansion is the real thing under test —
    it is exactly the batch shape a video pipeline's decode UDF emits."""
    data = data or b""
    n = fake_frame_count(data)
    out = []
    for i in range(0, n, every_n):
        sha = hashlib.sha256(data[:64] + f"|frame|{i}".encode()).hexdigest()
        out.append(
            {"url": url, "frame_no": i, "n_frames": n, "frame_sha": sha}
        )
    return out


def _thumbnail_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("src_width", T.LongType(), False),
            T.StructField("src_height", T.LongType(), False),
            T.StructField("out_width", T.LongType(), False),
            T.StructField("out_height", T.LongType(), False),
            T.StructField("thumb_sha", T.StringType(), False),
        ]
    )


def _frame_sample_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("frame_no", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("frame_sha", T.StringType(), False),
        ]
    )


def _per_payload_op(pages_df, row_fn, columns, schema, expand: bool):
    """The shared per-payload op skeleton every modality operator uses:
    column-prune to (url, payload) before the Arrow boundary, run the
    row kernel over each batch, emit 1:1 rows (expand=False) or a 1:N
    expansion (expand=True, the video-decode shape)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def fn(batches):
        for pdf in batches:
            rows = []
            for u, d in zip(pdf["url"], pdf["payload"]):
                out = row_fn(u, d)
                rows.extend(out) if expand else rows.append(out)
            yield pd.DataFrame(rows, columns=columns)

    narrow = pages_df.select("url", F.col("html").alias("payload"))
    return narrow.mapInPandas(fn, schema)


def modality_thumbnail(pages_df, max_dim: int = THUMB_MAX_DIM):
    """pages -> one resize-plan row per payload (Arrow batches, 1:1)."""
    return _per_payload_op(
        pages_df,
        lambda u, d: thumbnail_one(u, d, max_dim),
        THUMBNAIL_COLUMNS,
        _thumbnail_schema(),
        expand=False,
    )


def modality_frame_sample(pages_df, every_n: int = FRAME_EVERY_N):
    """pages -> sampled-frame rows (Arrow batches, 1:N expansion)."""
    return _per_payload_op(
        pages_df,
        lambda u, d: frame_sample_rows(u, d, every_n),
        FRAME_SAMPLE_COLUMNS,
        _frame_sample_schema(),
        expand=True,
    )


def modality_features(pages_df):
    """pages(url, html, ...) -> modality metadata table. Column-pruned to
    (url, payload) before the Arrow boundary (P1)."""
    return _per_payload_op(
        pages_df,
        features_one,
        MODALITY_FEATURES_COLUMNS,
        modality_features_schema(),
        expand=False,
    )
