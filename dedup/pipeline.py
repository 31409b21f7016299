"""End-to-end dedup pipeline orchestration with checkpoint/resume and
per-partition metrics (SURVEY.md §3.2; BASELINE.json:6).

Every stage writes its output table + commit manifest through
catalog.Warehouse, then the next stage reads the committed table back —
the write/read boundary is simultaneously the resume point, the lineage
cut, and where per-partition metrics are harvested (one parquet file per
write task = one partition's lineage record).

Resume semantics: `run(..., resume=True)` skips any stage whose table has
a committed manifest for the SAME config_hash; a crash mid-stage leaves no
manifest, so the stage reruns from its (committed) inputs. tests/test_resume
proves a killed-after-stage-k run resumes to byte-identical final tables.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import stages
from .catalog import Warehouse
from .cc import connected_components, connected_components_contracted
from .config import DedupConfig

STAGE_ORDER = [
    "pages",
    "signatures",
    "buckets",
    "candidate_pairs",
    "dropped_buckets",
    "verified_pairs",
    "clusters",
    "canonical_pages",
]

@dataclass
class RunResult:
    warehouse: Warehouse
    stages_run: list[str] = field(default_factory=list)
    stages_skipped: list[str] = field(default_factory=list)

    def df(self, spark: SparkSession, table: str) -> DataFrame:
        return self.warehouse.read(spark, table)


def _partition_metrics(path: str) -> list[dict]:
    """Per-file (= per write-task partition) rows/bytes from parquet
    footers — the per-partition lineage record (S4/U5)."""
    import pyarrow.parquet as pq

    out = []
    files = sorted(
        os.path.join(dp, fn)
        for dp, _d, fns in os.walk(path)
        for fn in fns
        if fn.endswith(".parquet")
    )
    for i, f in enumerate(files):
        md = pq.ParquetFile(f).metadata
        out.append(
            {
                "partition_id": i,
                "file": os.path.relpath(f, path),
                "rows": md.num_rows,
                "bytes": os.path.getsize(f),
            }
        )
    return out


def run_in_memory(
    spark: SparkSession, pages: DataFrame, cfg: DedupConfig
) -> dict[str, DataFrame]:
    """Compose the whole pipeline without warehouse materialization —
    for the driver contract / small interactive runs. Signatures and
    buckets are cached (each feeds two consumers); CC still localCheckpoints
    per iteration internally."""
    fused = stages.stage12_fused(pages, cfg).cache()
    sigs = stages.signatures_from_fused(fused)
    buckets = stages.buckets_from_fused(fused)
    cand = stages.stage3_candidates(sigs, buckets, cfg)
    candidates = cand.candidates.cache()
    dropped = cand.dropped_buckets.cache()
    # materialize both consumers of the persisted entries/counts relations
    # now, then release them — callers hold these DataFrames for a whole
    # session (driver contract), and the large entries relation (~64
    # rows/doc) must not stay pinned in executor storage that long
    candidates.count()
    dropped.count()
    cand.entries.unpersist()
    cand.counts.unpersist()
    verified = stages.stage4_verify(candidates, sigs, pages, cfg).cache()
    dup = verified.filter("is_dup").select("url_a", "url_b")
    # Size-based plan choice (same rule as run()): the exact-dup
    # contraction pays two extra joins, worth it only when pairs dwarf
    # docs (dup-heavy corpora — the regime it exists for).
    if verified.count() > 8 * pages.select("url").count():
        clusters = connected_components_contracted(
            dup, pages.select("url"), sigs.select("url", "text_sha"), cfg
        )
    else:
        clusters = connected_components(dup, pages.select("url"), cfg)
    return {
        "signatures": sigs,
        "buckets": buckets,
        "candidate_pairs": candidates,
        "dropped_buckets": dropped,
        "verified_pairs": verified,
        "clusters": clusters,
        "canonical_pages": stages.stage6_canonical(clusters, pages),
    }


def run(
    spark: SparkSession,
    pages: DataFrame,
    cfg: DedupConfig,
    warehouse_root: str,
    run_id: str | None = None,
    resume: bool = True,
    stop_after: str | None = None,
) -> RunResult:
    """Run (or resume) the full dedup pipeline.

    pages: DataFrame with the mandated shape (url, warc_ts, html, text,
    lang). stop_after: stage name to halt after (kill/resume tests).
    """
    wh = Warehouse(
        root=warehouse_root,
        config_hash=cfg.config_hash(),
        run_id=run_id or uuid.uuid4().hex[:12],
    )
    if not resume and wh.is_complete("pages"):
        # Callers (jobs/run_dedup.py, bench.py) pass `pages` read from this
        # warehouse's own pages table; resume=False would overwrite the path
        # being read from (Spark error or data loss). A non-resume rerun
        # needs a fresh warehouse root.
        raise ValueError(
            f"resume=False on a warehouse that already has a committed pages "
            f"table ({warehouse_root}); use a fresh warehouse root"
        )
    res = RunResult(warehouse=wh)

    import threading

    metrics_lock = threading.Lock()
    metrics_threads: list[threading.Thread] = []
    metrics_rows: list[dict] = []

    def _remember(store: list, out):
        store.append(out)
        return out

    def do_stage(name: str, build, partition_by=None) -> bool:
        """Returns True if the caller should stop (stop_after hit)."""
        if resume and wh.is_complete(name):
            res.stages_skipped.append(name)
            return stop_after == name
        t0 = time.monotonic()
        df = build()
        manifest = wh.write(df, name, partition_by=partition_by)
        wall_ms = int((time.monotonic() - t0) * 1000)

        # Per-partition lineage harvest (footer scan) runs in a background
        # thread: stage k+1's Spark work overlaps stage k's metrics IO
        # instead of serializing behind it (VERDICT r1 serial-fraction
        # item). Only local pyarrow/file IO happens off-thread — no Spark
        # calls. Threads are joined before run() returns.
        def harvest(path=wh.path(name), stage=name, wall=wall_ms, man=manifest):
            parts = _partition_metrics(path)
            rows = [
                {
                    "run_id": wh.run_id,
                    "stage": stage,
                    "wall_ms": wall,
                    "config_hash": wh.config_hash,
                    "ts": man["written_at"],
                    **p,
                }
                for p in parts
            ]
            with metrics_lock:
                metrics_rows.extend(rows)
                wh.append_metrics(spark, rows)

        th = threading.Thread(target=harvest, daemon=True)
        th.start()
        metrics_threads.append(th)
        res.stages_run.append(name)
        return stop_after == name

    def _finish() -> RunResult:
        for th in metrics_threads:
            th.join()
        # S4: this run's metrics also land as a Spark-written parquet
        # table (one append per run, not per stage)
        wh.write_metrics_table(spark, metrics_rows)
        return res

    # stage 0: snapshot the input (the Iceberg table stand-in; byte-identity
    # of `text` is checked against THIS table by the invariant tests).
    # The snapshot is partitioned by warc_day — the filesystem stand-in
    # for Iceberg's days(warc_ts) partition transform (SURVEY §2.7 F10):
    # incremental window reads prune to the matching day directories
    # (plan-asserted in tests/test_partitioning.py).
    def build_pages() -> DataFrame:
        if "warc_day" in pages.columns or "warc_ts" not in pages.columns:
            return pages
        return pages.withColumn("warc_day", F.to_date("warc_ts"))

    pages_partition = (
        ["warc_day"]
        if ("warc_ts" in pages.columns or "warc_day" in pages.columns)
        else None
    )
    if do_stage("pages", build_pages, partition_by=pages_partition):
        return _finish()

    pages_t = wh.read(spark, "pages")
    # Fused stage 1+2 (stages.stage12_fused): when neither table is
    # committed yet, ONE Arrow pass computes both; the signatures write
    # materializes the fused relation into executor storage and the
    # buckets write is a JVM explode over that cache. A resumed run with
    # signatures already committed falls back to the separate stage-2
    # pass over the committed table (same values either way).
    need_sig = not (resume and wh.is_complete("signatures"))
    need_buk = not (resume and wh.is_complete("buckets"))
    if need_sig:
        from pyspark import StorageLevel

        fused = stages.stage12_fused(pages_t, cfg).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        stop = do_stage(
            "signatures", lambda: stages.signatures_from_fused(fused)
        )
        if not stop and need_buk:
            stop = do_stage("buckets", lambda: stages.buckets_from_fused(fused))
        fused.unpersist()
        if stop:
            return _finish()
    else:
        if do_stage("signatures", lambda: None):  # committed: records skip
            return _finish()
        sigs_c = wh.read(spark, "signatures")
        if do_stage("buckets", lambda: stages.stage2_buckets(sigs_c, cfg)):
            return _finish()

    sigs = wh.read(spark, "signatures")
    buckets = wh.read(spark, "buckets")
    cand_out: list[stages.CandidateOut] = []

    def build_cands() -> DataFrame:
        out = stages.stage3_candidates(sigs, buckets, cfg)
        cand_out.append(out)
        return out.candidates

    def build_dropped() -> DataFrame:
        if not cand_out:
            _remember(cand_out, stages.stage3_candidates(sigs, buckets, cfg))
        return cand_out[0].dropped_buckets

    stop = do_stage("candidate_pairs", build_cands)
    dropped_async: list[threading.Thread | BaseException] = []
    if not stop:
        if stop_after == "dropped_buckets" or (
            resume and wh.is_complete("dropped_buckets")
        ) or not cand_out:
            stop = do_stage("dropped_buckets", build_dropped)
        else:
            # The dropped-buckets table is a filter over the persisted
            # counts relation and nothing downstream reads it — write it
            # concurrently with the verify stage instead of serializing a
            # (tiny) commit barrier into the critical path.
            def _dropped_bg():
                try:
                    do_stage("dropped_buckets", build_dropped)
                except BaseException as exc:  # re-raised at join
                    dropped_async.append(exc)

            th = threading.Thread(target=_dropped_bg, daemon=True)
            dropped_async.insert(0, th)
            th.start()

    def _join_cand() -> None:
        """Join the overlapped dropped-buckets write, re-raise its
        failure, and release the persisted stage-3 intermediates."""
        for item in dropped_async:
            if isinstance(item, threading.Thread):
                item.join()
        for item in dropped_async:
            if isinstance(item, BaseException):
                raise item
        if cand_out:
            cand_out[0].entries.unpersist()
            cand_out[0].counts.unpersist()

    if stop:
        _join_cand()
        return _finish()

    cands = wh.read(spark, "candidate_pairs")
    stop = do_stage(
        "verified_pairs",
        lambda: stages.stage4_verify(cands, sigs, pages_t, cfg),
    )
    _join_cand()
    if stop:
        return _finish()

    verified = wh.read(spark, "verified_pairs")

    def build_clusters() -> DataFrame:
        dup = verified.filter("is_dup").select("url_a", "url_b")
        # Size-based plan choice, from committed manifests (no extra
        # jobs): the exact-dup contraction costs two extra joins and a
        # second CC input prep, which only pays when pairs dwarf docs —
        # the dup-heavy regime it exists for (the replicated bench corpus
        # runs ~32 pairs/doc; a lightly-duplicated corpus runs ~3).
        n_pairs = (wh._read_manifest("verified_pairs") or {}).get("rows", 0)
        n_docs = max(1, (wh._read_manifest("pages") or {}).get("rows", 1))
        if n_pairs > 8 * n_docs:
            return connected_components_contracted(
                dup, pages_t.select("url"), sigs.select("url", "text_sha"), cfg
            )
        return connected_components(dup, pages_t.select("url"), cfg)

    if do_stage("clusters", build_clusters):
        return _finish()

    clusters = wh.read(spark, "clusters")
    if do_stage(
        "canonical_pages",
        lambda: stages.stage6_canonical(clusters, pages_t),
        partition_by=(
            ["warc_day"] if "warc_day" in pages_t.columns else None
        ),
    ):
        return _finish()
    return _finish()
