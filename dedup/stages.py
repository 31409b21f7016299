"""The dedup pipeline stages as declarative DataFrame transforms
(SURVEY.md §3.2). Each function takes DataFrames in, returns DataFrames out;
materialization/checkpointing lives in pipeline.py. Catalyst handles column
pruning/pushdown; the only Python on the data path is the Arrow UDF surface
in udfs.py.

Scale notes (the 100 TB story, SURVEY.md §4):
- Candidate generation never self-joins the bucket table. Buckets are
  grouped (map-side partial agg on the count pass), oversized groups are
  removed BEFORE any collect_list via a pre-count semi-join — a hot bucket
  (boilerplate pages) costs one counter row per map task, never an
  all-pairs explosion or a giant collected list (A1 + A2).
- Probe rows multiply shuffle volume by <= T/bands compared to adding
  tables; that trade (probe more, shuffle less) is the [MPLSH] idea
  restated for Spark (SURVEY.md §4).
- Verification is pure JVM expression work (zip_with/aggregate/bit_count)
  except the rare winnow-substring confirm, which runs only on pairs the
  cheap rules left undecided.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from .config import DedupConfig
from . import udfs


# ---------------------------------------------------------------------------
# stage 1 — signatures
# ---------------------------------------------------------------------------
def stage1_signatures(pages: DataFrame, cfg: DedupConfig) -> DataFrame:
    """pages -> signatures. P1: only (url, text) crosses into Arrow; html
    and every other column are pruned at the scan."""
    narrow = pages.select("url", "text").filter(F.col("text").isNotNull())
    return narrow.mapInPandas(udfs.make_signatures_fn(cfg), udfs.SIGNATURES_SCHEMA)


# ---------------------------------------------------------------------------
# stage 2 — banding + multi-probe bucket rows
# ---------------------------------------------------------------------------
def stage2_buckets(signatures: DataFrame, cfg: DedupConfig) -> DataFrame:
    narrow = signatures.select("url", "minhash", "runnerup")
    return narrow.mapInPandas(udfs.make_buckets_fn(cfg), udfs.BUCKETS_SCHEMA)


# ---------------------------------------------------------------------------
# stage 3 — candidate generation (lsh ∪ sha ∪ simhash ∪ winnow)
# ---------------------------------------------------------------------------
class CandidateOut(NamedTuple):
    candidates: DataFrame      # url_a, url_b, sources (comma-joined, sorted)
    dropped_buckets: DataFrame # generator, key, n


def _capped_pairs(
    entries: DataFrame,
    group_cols: list[str],
    cfg: DedupConfig,
    generator: str,
    exclude_probe_probe: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate machinery: group `entries` (one row per member URL,
    columns group_cols + url + is_probe) by group_cols, drop groups larger
    than max_bucket (logged, never silent), emit canonical pairs.

    The pre-count uses plain groupBy().count() — partial (map-side)
    aggregation makes the hot-key cost one row per map task. The semi-join
    against the surviving keys removes hot-bucket rows BEFORE collect_list,
    so no task ever materializes an oversized member list.
    """
    counts = entries.groupBy(*group_cols).agg(F.count("*").alias("n"))
    ok_keys = counts.filter((F.col("n") >= 2) & (F.col("n") <= cfg.max_bucket))
    dropped = counts.filter(F.col("n") > cfg.max_bucket).select(
        F.lit(generator).alias("generator"),
        F.concat_ws(":", *[F.col(c).cast("string") for c in group_cols]).alias("key"),
        F.col("n").cast("long").alias("n"),
    )
    grouped = (
        entries.join(ok_keys.select(*group_cols), group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(F.collect_list(F.struct("url", "is_probe")).alias("members"))
    )
    pairs = grouped.select("members").mapInPandas(
        udfs.make_pairs_fn(exclude_probe_probe), udfs.PAIRS_SCHEMA
    )
    return pairs.withColumn("source", F.lit(generator)), dropped


def stage3_candidates(
    signatures: DataFrame, buckets: DataFrame, cfg: DedupConfig
) -> CandidateOut:
    # (a) LSH home+probe buckets. Dedup (band, key, url) with the home row
    # winning (min over boolean: false < true) — J2 semantics, oracle parity.
    ent = buckets.groupBy("band", "bucket_key", "url").agg(
        F.min("is_probe").alias("is_probe")
    )
    lsh_pairs, lsh_drop = _capped_pairs(
        ent, ["band", "bucket_key"], cfg, "lsh", exclude_probe_probe=True
    )

    # (b) exact tier: identical text_sha -> star pairs (linear in group size,
    # skew-proof by construction; no cap needed).
    sha_roots = (
        signatures.groupBy("text_sha")
        .agg(F.min("url").alias("url_a"), F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    sha_pairs = (
        signatures.select("text_sha", "url")
        .join(sha_roots.select("text_sha", "url_a"), "text_sha")
        .filter(F.col("url") != F.col("url_a"))
        .select("url_a", F.col("url").alias("url_b"))
        .withColumn("source", F.lit("sha"))
    )

    # (c) SimHash pigeonhole blocks: hamming <= blocks-1 ⇒ >= 1 equal block.
    width = cfg.simhash_bits // cfg.pigeonhole_blocks
    mask = (1 << width) - 1
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("v"),
            )
            for i in range(cfg.pigeonhole_blocks)
        ]
    )
    sim_entries = (
        signatures.select("url", F.explode(block_structs).alias("b"))
        .select(F.col("b.blk").alias("blk"), F.col("b.v").alias("v"), "url")
        .withColumn("is_probe", F.lit(False))
    )
    sim_pairs, sim_drop = _capped_pairs(
        sim_entries, ["blk", "v"], cfg, "simhash", exclude_probe_probe=False
    )

    # (d) winnowing fingerprints (substring tier). fingerprints are distinct
    # per doc (np.unique in the kernel) so count(*) == distinct urls.
    fp_entries = (
        signatures.select("url", F.explode("fingerprints").alias("fp"))
        .withColumn("is_probe", F.lit(False))
    )
    win_pairs, win_drop = _capped_pairs(
        fp_entries, ["fp"], cfg, "winnow", exclude_probe_probe=False
    )

    all_pairs = (
        lsh_pairs.unionByName(sha_pairs)
        .unionByName(sim_pairs)
        .unionByName(win_pairs)
    )
    candidates = all_pairs.groupBy("url_a", "url_b").agg(
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources")
    )
    dropped = lsh_drop.unionByName(sim_drop).unionByName(win_drop)
    return CandidateOut(candidates, dropped)


# ---------------------------------------------------------------------------
# stage 4 — verification
# ---------------------------------------------------------------------------
def stage4_verify(
    candidates: DataFrame,
    signatures: DataFrame,
    pages: DataFrame,
    cfg: DedupConfig,
) -> DataFrame:
    """Attach exact signature-Jaccard, Hamming distance and sha equality to
    every candidate pair (all JVM-side expressions); run the substring
    confirm only where a winnow-sourced pair is still undecided.

    Dup rule (identical to dedup/oracle.py stage 4):
        is_dup = sha_equal OR jaccard >= tau OR hamming <= radius
                 OR (winnow-sourced AND shares a normalized substring
                     >= min_substr)
    """
    sig = signatures.select("url", "minhash", "simhash", "text_sha")
    sig_a = sig.select(
        F.col("url").alias("url_a"),
        F.col("minhash").alias("mh_a"),
        F.col("simhash").alias("sim_a"),
        F.col("text_sha").alias("sha_a"),
    )
    sig_b = sig.select(
        F.col("url").alias("url_b"),
        F.col("minhash").alias("mh_b"),
        F.col("simhash").alias("sim_b"),
        F.col("text_sha").alias("sha_b"),
    )
    joined = candidates.join(sig_a, "url_a").join(sig_b, "url_b")

    matches = F.aggregate(
        F.zip_with(
            "mh_a", "mh_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    base = joined.select(
        "url_a",
        "url_b",
        (matches / F.lit(float(cfg.minhash_k))).alias("jaccard"),
        F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        .cast("long")
        .alias("hamming"),
        (F.col("sha_a") == F.col("sha_b")).alias("sha_equal"),
        "sources",
    )
    cheap = (
        F.col("sha_equal")
        | (F.col("jaccard") >= F.lit(cfg.jaccard_tau))
        | (F.col("hamming") <= F.lit(cfg.hamming_radius))
    )
    base = base.withColumn("cheap_dup", cheap)

    need = base.filter(
        F.col("sources").contains("winnow") & ~F.col("cheap_dup")
    ).select("url_a", "url_b")
    texts = pages.select("url", "text")
    # `need` is small (undecided winnow pairs) — broadcast it to both text
    # joins so the big pages table never shuffles here.
    need_t = (
        texts.join(F.broadcast(need), texts["url"] == need["url_a"])
        .select("url_a", "url_b", F.col("text").alias("text_a"))
        .join(texts, F.col("url") == F.col("url_b"))
        .select("url_a", "url_b", "text_a", F.col("text").alias("text_b"))
    )
    substr = need_t.mapInPandas(udfs.make_substr_fn(cfg), udfs.SUBSTR_SCHEMA)

    verified = (
        base.join(F.broadcast(substr), ["url_a", "url_b"], "left")
        .withColumn("substr_ok", F.coalesce("substr_ok", F.lit(False)))
        .withColumn("is_dup", F.col("cheap_dup") | F.col("substr_ok"))
        .select(
            "url_a", "url_b", "jaccard", "hamming",
            "sha_equal", "substr_ok", "is_dup", "sources",
        )
    )
    return verified


# ---------------------------------------------------------------------------
# stage 6 — canonical pick + report (W1, A6)
# ---------------------------------------------------------------------------
def stage6_canonical(clusters: DataFrame, pages: DataFrame) -> DataFrame:
    """Per cluster keep the earliest warc_ts (tie: min url) as canonical.
    `text` passes through untouched (byte-identity invariant)."""
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy("warc_ts", "url")
    return (
        pages.join(clusters, "url")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("is_canonical", F.col("rn") == 1)
        .drop("rn")
    )


def cluster_report(clusters: DataFrame) -> DataFrame:
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("size"))
    return sizes.groupBy("size").agg(F.count("*").alias("n_clusters")).orderBy("size")
