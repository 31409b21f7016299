"""Host parallel-scaling ceiling probe — NO Spark anywhere.

Measures what THIS machine can possibly deliver when the same fixed work
runs in N independent processes, for the two workload classes that
bracket the dedup pipeline:

- ``bw``  (bandwidth-bound): FNV-style integer hashing over a streaming
  uint64 array + reduceat mins + a copy — the memory-access shape of the
  stage-1 OPH kernel and of shuffle serialization.
- ``cpu`` (compute-bound): small float32 matmul chain that lives in L2 —
  the shape of pure arithmetic with no memory pressure.

Aggregate throughput at each process count gives the HOST CEILING for
any software running that workload class at that parallelism:
``efficiency(N -> 4N) = (thr_4N / thr_N) / 4``. A pipeline measurement
can only be judged against the ceiling of its workload mix; chasing a
scaling-efficiency bar above the bandwidth ceiling is chasing physics,
not code. Measured on this sandbox (2026-08-17, post-reboot host):

    bw  1->4: 0.70     bw  2->8: 0.76     (memory bus saturates)
    cpu 1->4: ~1.00    cpu 2->8: ~1.00    (CPU scheduling is clean)

so any workload with a substantial memory-bound fraction tops out
between 0.70-0.76 (1->4) and 0.76-1.0 (2->8) here; single-core turbo
additionally inflates the 1-process leg, which is why the bw 1->4
ceiling is BELOW the 2->8 one. On a real cluster each node owns its
memory bus, so this ceiling does not transfer — the things that do
transfer (shuffle volume, partitioning, skew defenses, serial barriers)
are what the pipeline optimizes and docs/SCALE.md prices.

Usage: python scripts/host_ceiling.py [--pairs 1,4 2,8] [--iters 30]
Prints one JSON line per (class, nproc) plus derived ceilings.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time

# pin BLAS BEFORE numpy import: OpenBLAS sizes its pool at library load,
# so setting these in main() was too late — forked workers inherited a
# full-width pool and N x 32 threads thrashed, reading as a host failure
# (measured: cpu "ceiling" 0.269 on a host whose pinned burn scales 1.0)
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_var] = "1"

import numpy as np


def _burn_bw(n_iters: int) -> float:
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**31, size=2_000_000, dtype=np.uint64)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        y = (x * np.uint64(0x100000001B3)) ^ (x >> np.uint64(7))
        _ = np.minimum.reduceat(y, np.arange(0, len(y), 1000))
        _ = y.copy()
    return time.perf_counter() - t0


def _burn_cpu(n_iters: int) -> float:
    rng = np.random.default_rng(1)
    a = rng.standard_normal((384, 384)).astype(np.float32)
    m = a
    t0 = time.perf_counter()
    for _ in range(n_iters):
        m = (m @ a) / 384.0
    return time.perf_counter() - t0


_BURNS = {"bw": (_burn_bw, 1), "cpu": (_burn_cpu, 13)}  # ~equal wall/unit


def aggregate_throughput(kind: str, nproc: int, iters: int) -> float:
    burn, mult = _BURNS[kind]
    n = iters * mult
    with mp.Pool(nproc) as pool:
        t0 = time.perf_counter()
        pool.map(burn, [n] * nproc)
        wall = time.perf_counter() - t0
    return nproc * n / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", nargs="+", default=["1,4", "2,8"])
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    pairs = [tuple(int(x) for x in p.split(",")) for p in args.pairs]
    nprocs = sorted({n for p in pairs for n in p})
    thr: dict[str, dict[int, float]] = {}
    for kind in _BURNS:
        thr[kind] = {}
        for nproc in nprocs:
            t = aggregate_throughput(kind, nproc, args.iters)
            thr[kind][nproc] = t
            print(json.dumps({"class": kind, "nproc": nproc,
                              "throughput": round(t, 2)}))
    out = {}
    for kind in _BURNS:
        for lo, hi in pairs:
            eff = (thr[kind][hi] / thr[kind][lo]) / (hi / lo)
            out[f"{kind}_{lo}to{hi}"] = round(eff, 3)
    print(json.dumps({"ceilings": out}))


if __name__ == "__main__":
    main()
