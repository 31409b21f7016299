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

Round 3 extends the same mechanism to the two queries that were rows-only
in round 2 (VERDICT r2 "next round" #1): the probe-heap k-NN
(`mplsh_knn`) and the blob featurizer (`modality_features`) are not
SQL-expressible, but their single-process NumPy references
(dedup/mplsh.py reference_topk, dedup/modality.py features_one) ARE
independent of the distributed path — so their reference outputs are
materialized here (`mplsh_topk.parquet`, `modality_features.parquet`)
and the DuckDB twins SELECT from them, closing the board at 33/33.

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

TABLES = (
    "pages", "signatures", "buckets", "candidates", "verified", "clusters",
    "mplsh_topk", "modality_features", "ivf_topk", "semdedup",
    "modality_thumbs", "modality_frames", "bpe_merges", "bpe_tokens",
)

#: merge rounds for the bpe_train contract query — shared by the Spark
#: trainer (__spark_entry__._bpe_train_over) and the reference below
BPE_TRAIN_MERGES = 8


#: Stable alias the oracle_sql() twins read through: `ensure_cache(sf_dir)`
#: points it at the sf it just materialized, so the twin SQL strings stay
#: correct at WHATEVER sf the driver runs (round-3 hardcoded sf0.01 here —
#: ADVICE r3 #3's landmine: a driver correctness run at any other sf would
#: have failed every materialized-reference twin spuriously). Every dedup_*/
#: mplsh/ivf/semdedup/modality queries() entry calls ensure_cache(sf_dir)
#: before the driver executes its twin, so the link is always fresh.
CURRENT = os.path.join(CACHE_ROOT, "current")


def cache_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, os.path.basename(sf_dir.rstrip("/")))


def _point_current(d: str) -> None:
    """Atomically (re)point the `current` symlink at cache dir `d`
    (symlink at a temp name, then os.replace — readers never see a
    missing or half-written link)."""
    os.makedirs(CACHE_ROOT, exist_ok=True)
    rel = os.path.basename(d.rstrip("/"))
    if os.path.islink(CURRENT) and os.readlink(CURRENT) == rel:
        return
    tmp = CURRENT + ".tmp"
    try:
        os.remove(tmp)
    except FileNotFoundError:
        pass
    os.symlink(rel, tmp)
    os.replace(tmp, CURRENT)


def _kernel_hash() -> str:
    """Fingerprint of the kernel sources the oracle's outputs depend on —
    cache invalidation must trigger on KERNEL edits too, not only config
    changes (a config_hash-only key serves stale tables after an
    algorithm change at unchanged config)."""
    import hashlib

    h = hashlib.sha256()
    here = os.path.dirname(os.path.abspath(__file__))
    for mod in (
        "hashing.py", "features.py", "oracle.py", "synth.py",
        "mplsh.py", "modality.py", "ivf.py", "semdedup.py",
        "contract_oracle.py",  # twin materialization logic itself
    ):
        with open(os.path.join(here, mod), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _mplsh_reference_frame(sf_dir: str):
    """Single-process NumPy reference answer for the `mplsh_knn` contract
    query (dedup/mplsh.py reference_* — dict-of-buckets search, no Spark,
    no joins): per query vec_id < 5, the top-5 candidates by exact L2 over
    the probed-bucket candidate set. `dist_exact` is stored UNROUNDED; the
    DuckDB twin rounds, matching how the Spark side rounds only in its
    final projection."""
    import numpy as np
    import pandas as pd

    from .mplsh import MplshConfig, reference_candidates

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ids = emb["vec_id"].to_numpy()
    X = np.array(emb["embedding"].tolist(), dtype=np.float64)
    mcfg = MplshConfig()
    cands = reference_candidates(X, mcfg)
    k = 5
    rows = []
    for i in np.nonzero(ids < 5)[0]:
        cs = cands[i]
        if not cs:
            continue
        cl = np.array(sorted(cs))
        d2 = ((X[cl] - X[i]) ** 2).sum(axis=1)
        order = np.lexsort((ids[cl], d2))[:k]
        for j in order:
            rows.append(
                {
                    "query_id": int(ids[i]),
                    "neighbor_id": int(ids[cl[j]]),
                    "dist_exact": float(np.sqrt(d2[j])),
                }
            )
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "dist_exact"])


def _ivf_reference_frame(sf_dir: str):
    """Single-process NumPy reference answer for the `ivf_knn` contract
    query (dedup/ivf.py reference_* — k-means training + posting-list
    probe, no Spark, no joins); `dist_exact` stored UNROUNDED, the DuckDB
    twin rounds (same convention as mplsh_topk)."""
    import pandas as pd

    from .ivf import IvfConfig, reference_topk_frame

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return reference_topk_frame(emb, IvfConfig(), k=5, n_queries=5)


def _semdedup_reference_frame(sf_dir):
    """Single-process NumPy reference for the `semdedup_keep` contract
    query (dedup/semdedup.py reference_keep_frame — shared-kernel k-means
    + fixed-point within-cluster cosine, no Spark); all-integer/boolean
    output, so the twin SELECT is exact with no rounding convention."""
    import pandas as pd

    from .semdedup import SemDedupConfig, reference_keep_frame

    emb = pd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return reference_keep_frame(emb, SemDedupConfig())


def _modality_reference_frame(pages):
    """Row-wise NumPy reference for `modality_features`
    (dedup/modality.py features_one) over the synthesized pages corpus —
    the same kernel the Spark mapInPandas wraps, run single-process."""
    import pandas as pd

    from .modality import MODALITY_FEATURES_COLUMNS, features_one

    rows = [
        features_one(u, d) for u, d in zip(pages["url"], pages["html"])
    ]
    return pd.DataFrame(rows, columns=MODALITY_FEATURES_COLUMNS)


def _modality_thumbs_reference_frame(pages):
    """Row-wise reference for `modality_thumbnail` (dedup/modality.py
    thumbnail_one) — same kernel as the Spark mapInPandas, single-process."""
    import pandas as pd

    from .modality import THUMBNAIL_COLUMNS, thumbnail_one

    rows = [thumbnail_one(u, d) for u, d in zip(pages["url"], pages["html"])]
    return pd.DataFrame(rows, columns=THUMBNAIL_COLUMNS)


def _modality_frames_reference_frame(pages):
    """Row-wise reference for `frame_sample` (dedup/modality.py
    frame_sample_rows) — the 1->N expansion run single-process."""
    import pandas as pd

    from .modality import FRAME_SAMPLE_COLUMNS, frame_sample_rows

    rows = []
    for u, d in zip(pages["url"], pages["html"]):
        rows.extend(frame_sample_rows(u, d))
    return pd.DataFrame(rows, columns=FRAME_SAMPLE_COLUMNS)


def _bpe_reference_frame(sf_dir: str):
    """Single-process reference BPE trainer (Sennrich et al. 2016) for the
    `bpe_train` contract query: word-frequency dictionary over the
    documents fixture ([a-z]+ words of length >= 2, the rule the Spark
    side mirrors), then BPE_TRAIN_MERGES rounds of (count adjacent symbol
    pairs weighted by word frequency; merge the max-count pair, ties by
    lexicographic (left, right); apply greedily left-to-right). The Spark
    trainer must reproduce this table exactly — same integer counts, same
    tie-breaks, same greedy merge semantics."""
    import re
    from collections import Counter

    import pandas as pd

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    wc: Counter = Counter()
    for t in docs["text"]:
        for w in t.split(" "):
            if len(w) >= 2 and re.fullmatch("[a-z]+", w):
                wc[w] += 1
    syms = {w: list(w) for w in wc}
    rows = []
    for step in range(1, BPE_TRAIN_MERGES + 1):
        pc: Counter = Counter()
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), n_occ = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append(
            {"step": step, "left": a, "right": b,
             "merged": a + b, "n_occ": n_occ}
        )
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return pd.DataFrame(
        rows, columns=["step", "left", "right", "merged", "n_occ"]
    )


def _bpe_encode_reference_frame(sf_dir: str):
    """Single-process reference BPE ENCODER for the `bpe_encode` contract
    query: run the reference trainer above, then replay its merges in
    learned order (each greedy left-to-right) over the distinct word
    dictionary — (word, tokens, n_syms). The Spark encoder must reproduce
    this table exactly."""
    import re

    import pandas as pd

    merges = _bpe_reference_frame(sf_dir)
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    words = set()
    for t in docs["text"]:
        for w in t.split(" "):
            if len(w) >= 2 and re.fullmatch("[a-z]+", w):
                words.add(w)
    syms = {w: list(w) for w in words}
    for _, m in merges.iterrows():
        a, b = m["left"], m["right"]
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return pd.DataFrame(
        {
            "word": sorted(words),
            "tokens": [" ".join(syms[w]) for w in sorted(words)],
            "n_syms": [len(syms[w]) for w in sorted(words)],
        }
    )


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
                    _point_current(d)
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
        "mplsh_topk": _mplsh_reference_frame(sf_dir),
        "modality_features": _modality_reference_frame(corpus.pages),
        "ivf_topk": _ivf_reference_frame(sf_dir),
        "semdedup": _semdedup_reference_frame(sf_dir),
        "modality_thumbs": _modality_thumbs_reference_frame(corpus.pages),
        "modality_frames": _modality_frames_reference_frame(corpus.pages),
        "bpe_merges": _bpe_reference_frame(sf_dir),
        "bpe_tokens": _bpe_encode_reference_frame(sf_dir),
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
    _point_current(d)
    return d
