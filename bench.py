"""Benchmark: phased het variants/second on one chip via the beam engine.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: HiPhase v1.x steady state on HG001 WGS with 16 CPU threads
≈ 2,068 hets/sec (reference docs/user_guide.md:78).
"""

import json
import time

import numpy as np


def main():
    import os

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/hiphase_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from hiphase_tpu.phasing.beam import beam_solve_batch

    # Block-batch shapes modeled on WGS HiFi phasing: ~30x coverage piles,
    # blocks bucketed to 64 variants x 128 reads, beam width 256 (well above
    # the reference's effective queue width for typical blocks). The batch is
    # large enough that per-dispatch latency (significant on tunneled dev
    # backends) is amortized against real device work.
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

    # warmup / compile
    out = beam_solve_batch(*args, beam_width=W)
    jax.block_until_ready(out)

    # best of 3 trials: the tunneled dev backend has high dispatch variance
    reps = 5
    elapsed = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = beam_solve_batch(*args, beam_width=W)
        jax.block_until_ready(out)
        elapsed = min(elapsed, (time.perf_counter() - t0) / reps)

    hets_per_sec = B * V / elapsed
    baseline = 2068.0  # HiPhase 16-thread steady state, hets/sec
    print(json.dumps({
        "metric": "phased_het_variants_per_sec_per_chip",
        "value": round(hets_per_sec, 1),
        "unit": "hets/s",
        "vs_baseline": round(hets_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
