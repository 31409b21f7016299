"""Streaming launch entry (the spark-submit surface for dedup/streaming.py):

    spark-submit --py-files dedup.zip jobs/run_stream.py \
        --source /path/to/drop_dir --warehouse /path/to/wh \
        --checkpoint /path/to/ckpt [--parallelism N] \
        [--max-files-per-trigger K] [--config default|banding16]

Folds every parquet pages file currently in the drop directory into the
warehouse as a sequence of incremental dedup commits (Trigger.AvailableNow
— rerun the same command when new files land, or swap the trigger for a
processing-time one in a long-lived deployment; the idempotence markers
make reruns safe either way). Batch 0 bootstraps the base run if the
warehouse is empty. Prints a one-line JSON summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="drop directory of parquet pages files")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--parallelism", type=int, default=None, help="local[N] when no cluster master")
    ap.add_argument("--max-files-per-trigger", type=int, default=1)
    ap.add_argument(
        "--compact-every", type=int, default=None,
        help="fold committed deltas into a fresh base generation whenever "
        "the warehouse holds >= N active pages deltas (bounds read-side "
        "delta-chain growth for long-lived streams)",
    )
    ap.add_argument("--config", default="default", choices=["default", "banding16"])
    args = ap.parse_args()

    from dedup import config as C
    from dedup.catalog import Warehouse
    from dedup.session import build_session
    from dedup.streaming import run_stream

    cfg = C.DEFAULT if args.config == "default" else C.BANDING16
    master = f"local[{args.parallelism}]" if args.parallelism else None
    spark = build_session(app_name="dedup-stream", master=master)
    try:
        t0 = time.monotonic()
        result = run_stream(
            spark,
            args.source,
            cfg,
            args.warehouse,
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            compact_every=args.compact_every,
        )
        wall = time.monotonic() - t0
        wh = Warehouse(args.warehouse, cfg.config_hash(), "read")
        clusters = wh.read(spark, "clusters")
        n_urls = clusters.count()
        n_clusters = clusters.select("cluster_id").distinct().count()
        print(
            json.dumps(
                {
                    "wall_sec": round(wall, 2),
                    "batches_processed": result.processed,
                    "batches_skipped": result.skipped,
                    "batches_rolled_back": result.rolled_back,
                    "batches_compacted": result.compacted,
                    "bootstrapped": result.bootstrapped,
                    "urls": n_urls,
                    "clusters": n_clusters,
                    "dup_rate": round(1 - n_clusters / max(n_urls, 1), 4),
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
