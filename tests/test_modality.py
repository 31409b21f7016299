"""Multimodal-column plumbing gates (dedup/modality.py): the Spark
mapInPandas featurizer must reproduce the NumPy reference exactly; the
decode stub must be explicit (NotImplementedError), and the fake decode
deterministic."""

import numpy as np
import pandas as pd
import pytest

from dedup.modality import (
    byte_entropy,
    decode_image,
    fake_decode_dims,
    features_one,
    modality_features,
    sniff_magic,
)


def test_sniff_magic():
    assert sniff_magic(b"<html><body>hi") == "html"
    assert sniff_magic(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert sniff_magic(b"\xff\xd8\xff\xe0") == "jpeg"
    assert sniff_magic(b"GIF89a") == "gif"
    assert sniff_magic(b"RIFF....WAVE") == "riff"
    assert sniff_magic(b"plain text") == "unknown"
    assert sniff_magic(b"") == "unknown"


def test_byte_entropy_bounds():
    assert byte_entropy(b"") == 0.0
    assert byte_entropy(b"aaaa") == 0.0                   # single symbol
    assert abs(byte_entropy(bytes(range(256)) * 4) - 8.0) < 1e-9  # uniform
    rng = np.random.default_rng(0)
    e = byte_entropy(rng.integers(0, 256, 10000, dtype=np.uint8).tobytes())
    assert 7.5 < e <= 8.0


def test_decode_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_fake_decode_deterministic():
    a = fake_decode_dims(b"payload-1")
    assert a == fake_decode_dims(b"payload-1")
    assert a != fake_decode_dims(b"payload-2")
    w, h = a
    assert 16 <= w < 16 + 1024 and 16 <= h < 16 + 1024


def test_spark_features_match_reference(spark):
    """The distributed featurizer equals the per-row reference exactly
    (same kernels, Arrow batch boundary only)."""
    from dedup.synth import load_pages_spark

    sf = "/root/testdata/sf0.001"
    pages = load_pages_spark(spark, sf)
    got = (
        modality_features(pages).toPandas().sort_values("url", ignore_index=True)
    )
    src = pages.select("url", "html").toPandas()
    want = pd.DataFrame(
        [features_one(u, d) for u, d in zip(src["url"], src["html"])]
    ).sort_values("url", ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every synthesized page is html-wrapped -> magic must detect it
    assert (got["magic"] == "html").all()
    assert (got["n_bytes"] > 0).all()


def test_resize_dims_integer_clamp():
    from dedup.modality import resize_dims

    assert resize_dims(32, 16, 64) == (32, 16)       # under cap: unchanged
    assert resize_dims(128, 64, 64) == (64, 32)       # landscape clamp
    assert resize_dims(50, 200, 64) == (16, 64)       # portrait clamp
    assert resize_dims(1000, 1, 64) == (64, 1)        # floor never hits 0
    assert resize_dims(1, 1000, 64) == (1, 64)


def test_thumbnail_and_frame_sample_match_reference(spark):
    """The mapInPandas resize plan and the 1->N frame expansion must equal
    their single-process kernels row-for-row on the fixture corpus — the
    frames the DuckDB twins SELECT."""
    from dedup.contract_oracle import (
        _modality_frames_reference_frame,
        _modality_thumbs_reference_frame,
    )
    from dedup.modality import modality_frame_sample, modality_thumbnail
    from dedup.synth import make_corpus

    corpus = make_corpus("/root/testdata/sf0.001", seed=42)
    pages = spark.createDataFrame(corpus.pages)

    got_t = sorted(
        tuple(r) for r in modality_thumbnail(pages).collect()
    )
    want_t = sorted(
        tuple(r) for r in
        _modality_thumbs_reference_frame(corpus.pages).itertuples(index=False)
    )
    assert got_t == want_t

    got_f = sorted(tuple(r) for r in modality_frame_sample(pages).collect())
    want_f = sorted(
        tuple(r) for r in
        _modality_frames_reference_frame(corpus.pages).itertuples(index=False)
    )
    assert got_f == want_f
    # the expansion really expands: more frame rows than docs, and every
    # doc contributes at least frame 0
    assert len(got_f) > len(corpus.pages)
    assert {t[0] for t in got_f} == set(corpus.pages["url"])
