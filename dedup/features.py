"""Per-document feature extraction — THE kernel shared verbatim by the
NumPy oracle (dedup/oracle.py) and the Spark pandas UDFs (dedup/udfs.py).
Bit-for-bit parity of stage-1 outputs is structural: both sides call
`doc_features` with the same config and seed (SURVEY.md §0.2)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from . import hashing as H
from .config import DedupConfig


class DocFeatures(NamedTuple):
    minhash: np.ndarray      # uint64 (K,)
    runnerup: np.ndarray     # uint64 (K,)
    simhash: int             # unsigned 64-bit value as Python int
    n_shingles: int
    n_tokens: int
    text_sha: str
    fingerprints: np.ndarray  # uint64 (m,) winnowing-selected gram hashes


def minhash_params(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    return H.minhash_params(cfg.seed, cfg.minhash_k)


def doc_features(
    text: Optional[str], cfg: DedupConfig, a: np.ndarray, b: np.ndarray
) -> Optional[DocFeatures]:
    """Signature bundle for one document, or None if the row is filtered
    (P2: null text or normalized length < min_text_len). Normalization
    happens on a copy; `text` itself is never touched (byte invariant)."""
    if text is None:
        return None
    norm = H.normalize(text)
    if len(norm) < cfg.min_text_len:
        return None
    if cfg.shingle_mode == "word":
        shingles = H.word_shingles(norm, cfg.word_w)
    else:
        shingles = H.char_shingles(norm, cfg.shingle_k)
    if shingles.size == 0:
        return None
    if cfg.minhash_scheme == "oph":
        minh, runner = H.oph_minhash_with_runnerup(
            shingles, cfg.minhash_k, a[0], b[0]
        )
    else:
        minh, runner = H.minhash_with_runnerup(shingles, a, b)
    tokens = norm.split(b" ")
    sim = H.simhash64(H.fnv1a64_tokens(tokens))
    fps = H.winnow_fingerprints(norm, cfg.gram_k, cfg.winnow_window)
    return DocFeatures(
        minhash=minh,
        runnerup=runner,
        simhash=sim,
        n_shingles=int(shingles.size),
        n_tokens=len(tokens),
        text_sha=H.sha256_hex(text),
        fingerprints=fps,
    )


def u64_to_i64(x: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 as two's-complement int64 (Spark LongType view)."""
    return np.asarray(x, dtype=np.uint64).view(np.int64)


def i64_to_u64(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.int64).view(np.uint64)
