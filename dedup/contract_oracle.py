"""Materialize the NumPy oracle's stage tables as parquet so the driver's
DuckDB twins can check every dedup stage (VERDICT r1 "next round" #1).

The driver contract compares each `queries()` entry against an
`oracle_sql()` DuckDB query. The dedup stages were rows-only in round 1
because their inputs (the synthesized corpus) and kernels (MinHash /
probe sequences) are not SQL-expressible over the fixture views. The fix:
run the single-process NumPy oracle (dedup/oracle.py — the stand-in for
the reference implementation, SURVEY.md §0.2) on the same deterministic
corpus and write its stage tables to a cache directory. Then

  - stage-1/2 twins (`signatures`, `buckets`) SELECT straight from the
    oracle parquet: a genuinely independent cross-check (pure NumPy vs
    distributed Spark), bit-for-bit;
  - stage-3..6 twins re-implement each stage's TRANSFORM in DuckDB SQL
    over the oracle's *upstream* tables (bucket grouping + cap + pair
    explosion, list-op Jaccard + bit_count(xor) verification, recursive-
    CTE connected components, window canonical pick) — so the driver
    checks the distributed stage logic against an independent SQL
    restatement, not against a copy of its own output.

The cache is derived data (deterministic from sf_dir + seed + config):
safe to delete any time; keyed by config_hash so a config change
invalidates it.
"""

from __future__ import annotations

import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_ROOT = os.path.join(REPO_ROOT, ".oracle_cache")
MARKER = "_COMPLETE.json"

TABLES = ("pages", "signatures", "buckets", "candidates", "verified", "clusters")


def cache_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, os.path.basename(sf_dir.rstrip("/")))


def _kernel_hash() -> str:
    """Fingerprint of the kernel sources the oracle's outputs depend on —
    cache invalidation must trigger on KERNEL edits too, not only config
    changes (a config_hash-only key serves stale tables after an
    algorithm change at unchanged config)."""
    import hashlib

    h = hashlib.sha256()
    here = os.path.dirname(os.path.abspath(__file__))
    for mod in ("hashing.py", "features.py", "oracle.py", "synth.py"):
        with open(os.path.join(here, mod), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def ensure_cache(sf_dir: str, cfg=None) -> str:
    """Run the NumPy oracle on the corpus synthesized from sf_dir (if not
    already cached for this config + kernel version) and return the cache
    directory holding pages/signatures/buckets/candidates/verified/
    clusters parquet."""
    from .config import DEFAULT

    cfg = cfg or DEFAULT
    d = cache_dir(sf_dir)
    marker_path = os.path.join(d, MARKER)
    khash = _kernel_hash()
    if os.path.exists(marker_path):
        try:
            with open(marker_path) as f:
                m = json.load(f)
                if (
                    m.get("config_hash") == cfg.config_hash()
                    and m.get("kernel_hash") == khash
                ):
                    return d
        except (json.JSONDecodeError, OSError):
            pass  # corrupt marker -> rebuild

    from .oracle import run_oracle
    from .synth import make_corpus

    os.makedirs(d, exist_ok=True)
    corpus = make_corpus(sf_dir, seed=cfg.seed)
    o = run_oracle(corpus.pages, cfg)
    frames = {
        "pages": corpus.pages,
        "signatures": o.signatures,
        "buckets": o.buckets,
        "candidates": o.candidates,
        "verified": o.verified,
        "clusters": o.clusters,
    }
    for name, df in frames.items():
        df.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)
    tmp = marker_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"config_hash": cfg.config_hash(), "kernel_hash": khash,
             "sf_dir": sf_dir},
            f,
        )
    os.replace(tmp, marker_path)
    return d
