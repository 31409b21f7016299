"""The batched stage-1 kernel (features.batch_doc_features) must produce
bit-identical outputs to the per-document reference kernel
(features.doc_features) — the oracle keeps using the per-doc path, so
this equality is what carries oracle parity over to the vectorized
production path."""

import numpy as np
import pytest

from dedup import hashing as H
from dedup.config import DEFAULT
from dedup.features import batch_doc_features, doc_features, minhash_params

EDGE_TEXTS = [
    None,                                   # dropped (null)
    "",                                     # dropped (too short)
    "ab",                                   # dropped (norm < min_text_len)
    "hello",                                # exactly min length, one token
    "Hello   WORLD \t this is   a test document with some words",
    "的是一个测试文档没有空格所以整个文档是一个超长词元" * 40,  # one giant token
    "short doc",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",  # many 1-char tokens
    "x" * 31,                               # shorter than one 32-gram
    "y" * 32,                               # exactly one 32-gram
    "the quick brown fox jumps over the lazy dog " * 30,  # repetitive
    "Ünïcødé tëxt with áccents and emoji \U0001f600 mixed in for bytes",
]


def _reference(texts, cfg):
    a, b = minhash_params(cfg)
    out = []
    for i, t in enumerate(texts):
        f = doc_features(t, cfg, a, b)
        if f is not None:
            out.append((i, f))
    return out


def _assert_equal(texts, cfg):
    a, b = minhash_params(cfg)
    bf = batch_doc_features(texts, cfg, a, b)
    ref = _reference(texts, cfg)
    if bf is None:
        assert ref == []
        return
    assert bf.keep.tolist() == [i for i, _ in ref]
    for row, (_, f) in enumerate(ref):
        np.testing.assert_array_equal(bf.minhash[row], f.minhash)
        np.testing.assert_array_equal(bf.runnerup[row], f.runnerup)
        assert int(bf.simhash[row]) == f.simhash
        assert int(bf.n_shingles[row]) == f.n_shingles
        assert int(bf.n_tokens[row]) == f.n_tokens
        assert bf.text_sha[row] == f.text_sha
        np.testing.assert_array_equal(bf.fingerprints[row], f.fingerprints)


def test_edge_cases_match_per_doc_kernel():
    _assert_equal(EDGE_TEXTS, DEFAULT)


def test_synth_corpus_matches_per_doc_kernel(corpus_smoke):
    _assert_equal(corpus_smoke.pages["text"].tolist(), DEFAULT)


def test_all_rows_filtered_returns_none():
    a, b = minhash_params(DEFAULT)
    assert batch_doc_features([None, "", "ab"], DEFAULT, a, b) is None


def test_batched_kernel_rejects_unsupported_modes():
    a, b = minhash_params(DEFAULT)
    with pytest.raises(ValueError, match="char shingles"):
        batch_doc_features(["x"], DEFAULT.with_(minhash_scheme="kxu"), a, b)


def test_fnv_tokens_batch_matches_scalar():
    rng = np.random.default_rng(7)
    # segments of wildly mixed lengths, including ones that hit the
    # scalar-finish path (few very long tails)
    segs = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            for n in [0, 1, 3, 7, 2000, 5, 5, 8000, 2, 100]]
    buf = np.frombuffer(b"".join(segs), dtype=np.uint8)
    lens = np.array([len(s) for s in segs], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    got = H.fnv1a64_tokens_batch(buf, starts, lens)
    want = np.array([H.fnv1a64(s) for s in segs], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
