"""A/B the two stage-3 physical strategies (stages.STAGE3_STRATEGY:
semijoin vs window) at two parallelism levels, on a shared pre-committed
warehouse (pages+signatures+buckets), timing only the candidate stage.

Usage: python scripts/ab_stage3.py [--replicate 12] [--sf-dir DIR]
       [--par 2 8] [--trials 1]
Prints one JSON line per (strategy, parallelism) trial with the
candidate_pairs wall from the pipeline's own stage metrics.
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
        env["DEDUP_STAGE3_STRATEGY"] = strategy
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


def stage_wall(wh: str, stage: str) -> float:
    seen = {}
    with open(os.path.join(wh, "stage_metrics.jsonl")) as f:
        for ln in f:
            row = json.loads(ln)
            seen[row["stage"]] = row["wall_ms"]  # last run wins
    return seen.get(stage, -1) / 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=12)
    ap.add_argument("--par", type=int, nargs="+", default=[8])
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    zip_path = os.path.join(tempfile.gettempdir(), "dedup_pyfiles_ab.zip")
    make_pyfiles_zip(zip_path)

    base = tempfile.mkdtemp(prefix="ab3_base_")
    run_job(8, base, args.sf_dir, args.replicate, zip_path, "buckets", None)
    print(f"prepped base warehouse {base}", file=sys.stderr)

    for t in range(args.trials):
        for par in args.par:
            for strat in ("semijoin", "window"):
                wh = tempfile.mkdtemp(prefix=f"ab3_{strat}_{par}_")
                shutil.rmtree(wh)
                shutil.copytree(base, wh)
                summary = run_job(par, wh, args.sf_dir, args.replicate,
                                  zip_path, "dropped_buckets", strat)
                print(json.dumps({
                    "trial": t, "strategy": strat, "parallelism": par,
                    "candidates_wall_s": stage_wall(wh, "candidate_pairs"),
                    "job_wall_s": summary.get("wall_sec"),
                }))
                sys.stdout.flush()
                shutil.rmtree(wh, ignore_errors=True)
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
