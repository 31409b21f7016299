"""SemDedup-style semantic deduplication over an embedding column —
the training-data operator that removes *semantic* duplicates (same
content, different words) the text tiers cannot see.

Public lineage: Abbas et al. 2023, "SemDedup: Data-efficient learning
at web-scale through semantic deduplication" (arXiv:2303.09540):
k-means-cluster the embeddings, compare pairs only WITHIN a cluster,
and drop all but one member of every semantic-duplicate set. The
clustering is what makes the quadratic pairwise step tractable — k
grows with n in production so per-cluster membership stays bounded,
and the within-cluster comparison volume is sum(|c|^2) ~ n^2/k.

Keep rule (deterministic): a vector is DROPPED iff some other vector in
its cluster has a LOWER id and cosine similarity >= tau. The lowest-id
member of every duplicate set is therefore always kept — the same
min-id canonical convention as the text pipeline's cluster
representative (dedup/stages.py canonical pick).

Exactness across engines (the repo's fixed-point discipline): vectors
are quantized to int64 (floor(x * 2^20) — one IEEE float64 multiply +
floor, identical in NumPy and the JVM), dot products are pure int64
sums (|dot| < 2^51, order-independent), and the cosine denominator is
sqrt(double(aa) * double(bb)) — single deterministic IEEE multiply +
sqrt of exactly-representable ints. The keep decision compares the
UNROUNDED double cosine against tau, so Spark, the NumPy reference,
and the DuckDB twin (which SELECTs the materialized reference,
dedup/contract_oracle.py) agree bit-for-bit; no float column is ever
hashed.

Spark mapping: centroid training + assignment reuse dedup/ivf.py
(bounded driver-side sample; vectorized Arrow assignment); the
within-cluster pair join is cid-keyed (never all-pairs), per-vector
norms are computed once before the join, and the final keep flag is a
left-anti join of the dropped-id set. Reference: /root/reference/
README.md:1 (the reference repo's only line; semantics per the paper).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .ivf import IvfConfig, assign, train_centroids

#: fixed-point scale (power of two: the float->int map is exact and
#: identical in NumPy and the JVM)
SEM_Q = 1 << 20


@dataclass(frozen=True)
class SemDedupConfig:
    tau: float = 0.35  # duplicate threshold on exact cosine (fixture's
    #                    ~99.9th pairwise percentile, as cosine_near_dup)
    ivf: IvfConfig = field(default_factory=IvfConfig)


def quantize(X: np.ndarray) -> np.ndarray:
    """floor(x * 2^20) as int64 — the exact fixed-point grid shared with
    the JVM expression F.floor(x.cast('double') * 2^20)."""
    return np.floor(X.astype(np.float64) * float(SEM_Q)).astype(np.int64)


def reference_keep_frame(emb_pdf, cfg: SemDedupConfig):
    """Single-process NumPy reference (the DuckDB twin's source): per
    vector, (vec_id, cid, keep). Same centroid training, assignment, and
    fixed-point cosine as the Spark path — shared kernels, zero
    reimplementation drift."""
    import pandas as pd

    emb_pdf = emb_pdf.sort_values("vec_id", ignore_index=True)
    ids = emb_pdf["vec_id"].to_numpy()
    X = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    sel = np.nonzero(ids < cfg.ivf.sample_cap)[0]
    S = X[sel[np.argsort(ids[sel], kind="stable")]]
    C = train_centroids(S, cfg.ivf)
    a = assign(X, C)
    Xq = quantize(X)
    norms = (Xq * Xq).sum(axis=1)  # int64, exact
    keep = np.ones(len(ids), dtype=bool)
    for c in np.unique(a):
        members = np.nonzero(a == c)[0]
        order = members[np.argsort(ids[members], kind="stable")]
        for pos, i in enumerate(order):
            if norms[i] == 0:
                continue  # zero-norm is never anyone's duplicate (pinned
                #           rule, mirrored by the Spark norm predicate)
            for j in order[:pos]:  # strictly lower ids
                if norms[j] == 0:
                    continue
                num = float((Xq[i] * Xq[j]).sum())
                den = np.sqrt(float(norms[i]) * float(norms[j]))
                if num / den >= cfg.tau:
                    keep[i] = False
                    break
    return pd.DataFrame(
        {"vec_id": ids, "cid": a, "keep": keep},
        columns=["vec_id", "cid", "keep"],
    )


def semdedup_keep(emb_df, cfg: SemDedupConfig):
    """embeddings(vec_id, embedding) -> (vec_id, cid, keep): the SemDedup
    verdict as a DataFrame plan.

    Shape: bounded driver-side centroid training (dedup/ivf.py — the
    centroids are a model, not data), one vectorized Arrow assignment
    pass to (vec_id, cid), per-vector fixed-point norms computed ONCE,
    a cid-keyed self-join (id_a < id_b) with one int64 dot-product fold
    per pair, and a left-anti join marking survivors. No crossJoin; the
    pairwise volume is bounded by the cluster granularity k, which
    scales with n in production (paper's recipe), exactly like the
    LSH tiers bound theirs by bucket width."""
    from pyspark.sql import functions as F

    from .ivf import assign_df, train_from_df

    narrow = emb_df.select("vec_id", "embedding")
    C = train_from_df(narrow, cfg.ivf)
    asg = assign_df(narrow, C)

    qvec = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * F.lit(float(SEM_Q))),
    )

    def idot(a_col, b_col):
        return F.aggregate(
            F.zip_with(a_col, b_col, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )

    # eager localCheckpoint: base feeds three subtrees (both pair sides
    # and the final keep projection) — without it one action re-runs the
    # Arrow assignment pass and the quantize/norm folds three times. At
    # production scale a deployment materializes (vec_id, q, n2, cid) as
    # a table instead.
    base = (
        narrow.select("vec_id", qvec.alias("q"))
        .withColumn("n2", idot(F.col("q"), F.col("q")))
        .join(asg, "vec_id")
        .localCheckpoint()
    )

    a = base.select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na"),
    )
    b = base.select(
        F.col("cid"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb"),
    )
    cos = idot(F.col("qa"), F.col("qb")) / F.sqrt(
        F.col("na").cast("double") * F.col("nb").cast("double")
    )
    # zero-norm guard: an all-zero quantized vector gives cos = 0/0 = NaN,
    # which Spark's ordering ranks ABOVE tau while NumPy's comparison is
    # False — without the explicit norm predicate the two sides disagree
    # on degenerate vectors. Rule (both engines, pinned): a zero-norm
    # vector is never anyone's duplicate.
    dropped = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .filter(cos >= F.lit(cfg.tau))
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return (
        base.select("vec_id", "cid")
        .join(dropped.withColumn("d", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cid", F.col("d").isNull().alias("keep"))
    )
