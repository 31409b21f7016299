"""A/B the two stage-4 verify physical strategies (stages.STAGE4_STRATEGY:
full vs semi) on a shared pre-committed warehouse (pages..dropped_buckets),
timing only the verify stage and reporting its MEASURED shuffle bytes
(the resumed run executes verified_pairs alone, so the session-cumulative
shuffle counters at its commit are that stage's own volume).

Usage: python scripts/ab_stage4.py [--replicate 12] [--sf-dir DIR]
       [--par 8] [--trials 1]
Prints one JSON line per (strategy, parallelism) trial.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from bench_scaling import make_pyfiles_zip  # noqa: E402


def run_job(par: int, wh: str, sf_dir: str, replicate: int, zip_path: str,
            stop_after: str | None, strategy: str | None) -> dict:
    env = dict(os.environ)
    if strategy:
        env["DEDUP_STAGE4_STRATEGY"] = strategy
    cmd = [
        "spark-submit", "--master", f"local[{par}]",
        "--driver-memory", "32g", "--py-files", zip_path,
        os.path.join(REPO, "jobs", "run_dedup.py"),
        "--input", sf_dir, "--warehouse", wh,
        "--parallelism", str(par), "--replicate", str(replicate),
    ]
    if stop_after:
        cmd += ["--stop-after", stop_after]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000,
                         check=True, env=env)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def verify_stage_row(wh: str) -> dict:
    last = None
    with open(os.path.join(wh, "stage_metrics.jsonl")) as f:
        for ln in f:
            row = json.loads(ln)
            if row["stage"] == "verified_pairs":
                last = row  # last run wins
    return last or {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=12)
    ap.add_argument("--par", type=int, nargs="+", default=[8])
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    zip_path = os.path.join(tempfile.gettempdir(), "dedup_pyfiles_ab4.zip")
    make_pyfiles_zip(zip_path)

    base = tempfile.mkdtemp(prefix="ab4_base_")
    run_job(8, base, args.sf_dir, args.replicate, zip_path,
            "dropped_buckets", None)
    print(f"prepped base warehouse {base}", file=sys.stderr)

    for t in range(args.trials):
        for par in args.par:
            for strat in ("full", "semi"):
                wh = tempfile.mkdtemp(prefix=f"ab4_{strat}_{par}_")
                shutil.rmtree(wh)
                shutil.copytree(base, wh)
                run_job(par, wh, args.sf_dir, args.replicate, zip_path,
                        "verified_pairs", strat)
                row = verify_stage_row(wh)
                print(json.dumps({
                    "trial": t, "strategy": strat, "parallelism": par,
                    "verify_wall_s": row.get("wall_ms", -1) / 1000.0,
                    "verify_shuffle_write_mb": round(
                        row.get("cum_shuffle_write_bytes", 0) / 1e6, 2),
                    "verify_shuffle_read_mb": round(
                        row.get("cum_shuffle_read_bytes", 0) / 1e6, 2),
                }))
                sys.stdout.flush()
                shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
