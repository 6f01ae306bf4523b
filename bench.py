"""Benchmark: end-to-end phasing throughput through the full pipeline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: HiPhase v1.x steady state on HG001 WGS with 16 CPU threads
≈ 2,068 hets/sec (reference docs/user_guide.md:78).

The primary metric is `e2e_phased_hets_per_sec`: wall clock of the full CLI
(block gen → allele assignment → beam solve on the TPU → ordered writers)
on a WGS-realistic simulated dataset (coverage deserts, ~250 kb block
cadence, SNVs+indels+SVs+TRs, 1% read errors — see
hiphase_tpu/utils/simulate.py). The device beam-kernel microbenchmark is
reported as a secondary field.

The dataset is built once and cached; a warmup run populates the persistent
JAX compilation cache, then the best of `--reps` timed runs is reported
(run-to-run noise on tunneled dev backends is real; best-of is the stable
statistic).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_HETS_PER_SEC = 2068.0  # HiPhase 16-thread steady state


def kernel_metric():
    """Secondary: device-only beam-solve throughput on synthetic batches."""
    import jax

    from hiphase_tpu.phasing.beam import beam_solve_batch

    B, R, V, W = 256, 128, 64, 256
    rng = np.random.default_rng(0)
    h1 = rng.integers(0, 2, size=(B, V))
    hap_choice = rng.random((B, R, 1)) < 0.5
    base = np.where(hap_choice, h1[:, None, :], 1 - h1[:, None, :])
    flip = rng.random((B, R, V)) < 0.03
    alleles = np.where(flip, 1 - base, base).astype(np.uint8)
    nov = rng.random((B, R, V)) < 0.1
    alleles = np.where(nov, 3, alleles).astype(np.uint8)
    quals = rng.integers(20, 80, size=(B, R, V)).astype(np.int32)
    quals[alleles >= 2] = 0
    skip = np.zeros((B, V), dtype=bool)
    args = (alleles, quals, skip)

    out = beam_solve_batch(*args, beam_width=W)  # warmup/compile
    jax.block_until_ready(out)
    reps = 5
    elapsed = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = beam_solve_batch(*args, beam_width=W)
        jax.block_until_ready(out)
        elapsed = min(elapsed, (time.perf_counter() - t0) / reps)
    return B * V / elapsed


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-kernel", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("HIPHASE_TPU_BENCH_QUIET", "1")
    import bench_e2e

    e2e_args = bench_e2e.build_args(["--mb", str(args.mb)])
    meta = bench_e2e.ensure_dataset(e2e_args)

    # warmup: populates the persistent compile cache / page cache
    bench_e2e.run_once(e2e_args, meta)
    best = float("inf")
    times = []
    for _ in range(args.reps):
        elapsed = bench_e2e.run_once(e2e_args, meta)
        times.append(round(elapsed, 2))
        best = min(best, elapsed)

    hets_per_sec = meta["n_het"] / best
    kern = None if args.skip_kernel else kernel_metric()
    print(json.dumps({
        "metric": "e2e_phased_hets_per_sec",
        "value": round(hets_per_sec, 1),
        "unit": "hets/s",
        "vs_baseline": round(hets_per_sec / BASELINE_HETS_PER_SEC, 3),
        "elapsed_s": times,
        "n_het": meta["n_het"],
        "total_bp": meta["total_bp"],
        "kernel_hets_per_sec": None if kern is None else round(kern, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
