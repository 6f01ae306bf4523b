"""Benchmark: end-to-end phasing throughput through the full pipeline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: HiPhase v1.x steady state on HG001 WGS with 16 CPU threads
≈ 2,068 hets/sec (reference docs/user_guide.md:78).

Every timed rep is a FRESH PROCESS (`bench_e2e.py` via subprocess), so the
numbers include process start, engine selection, reference load, and any
persistent-cache reads — what a real user pays. Run 1 is reported
separately (`run1_s`, `cold_over_warm`) alongside the warm best.

Configurations reported:
  * local-only mode (the reference's published steady-state config) — the
    primary metric
  * dual/global-realignment mode (the SV/TR path; reference costs 2.2x
    wall in this mode, docs/performance.md:32)
  * device-resident beam-kernel microbenchmark + node expansions/s (run in
    a subprocess with a deadline so a degraded device link cannot hang the
    bench; see kernel_metric_note)
"""

import json
import os
import subprocess
import sys
import time

BASELINE_HETS_PER_SEC = 2068.0   # HiPhase 16-thread steady state, local mode
BASELINE_DUAL = 2068.0 / 2.2     # dual mode costs 2.2x wall (performance.md:32)

KERNEL_NOTE = (
    "kernel_hets_per_sec is a device-resident microbenchmark at the full "
    "sound beam width (W=1024): beam state stays on device across reps and "
    "a final scalar fetch proves completion (block_until_ready alone can "
    "return early on remote backends). (r02->r03 historical note: the r03 "
    "value measured per-call tunnel transfer latency after the tiled "
    "rewrite, not the kernel; this restores a device-resident definition.) "
    "node_expansions_per_sec counts generated beam candidates (the A* "
    "node-expansion analog); e2e_node_expansions_per_sec is the same "
    "counter from the end-to-end run's solver."
)


def _run_json(cmd, timeout):
    """Run a subprocess, return its last JSON stdout line (or None)."""
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(p.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def kernel_metric():
    """Device-resident beam-kernel throughput (run me via --kernel-only)."""
    import numpy as np

    import jax

    from hiphase_tpu.phasing.beam import beam_init_state, beam_tile

    B, R, W, T = 16, 128, 1024, 128
    rng = np.random.default_rng(0)
    alleles = rng.integers(0, 2, size=(B, R, T)).astype(np.uint8)
    quals = rng.integers(20, 80, size=(B, R, T)).astype(np.int32)
    skip = np.zeros((B, T), dtype=bool)
    resets = np.zeros((B, R, T), dtype=bool)
    import numpy as _np
    dev_in = [jax.device_put(x) for x in (alleles, quals, skip, resets)]
    state = tuple(jax.device_put(s) for s in beam_init_state(B, R, W))
    state, _ = beam_tile(state, *dev_in, beam_width=W)  # compile
    _np.asarray(state[3][:, 0])  # warm; also proves completion
    reps = 16
    best = float("inf")
    for _trial in range(3):
        st = state
        t0 = time.perf_counter()
        for _ in range(reps):
            st, _ys = beam_tile(st, *dev_in, beam_width=W)
        # fetch a scalar slice: on remote backends block_until_ready can
        # return before execution finishes; a materialized value cannot lie
        _np.asarray(st[3][:, 0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return {
        "kernel_hets_per_sec": round(B * T / best, 1),
        # candidates generated per column ~= 4*W per batch row
        "node_expansions_per_sec": round(B * T * 4 * W / best, 1),
        "kernel_batch": [B, R, T],
        "kernel_beam_width": W,
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=30,
                    help="dataset size; 30Mb balances steady-state "
                         "representativeness against cold dataset-gen time")
    ap.add_argument("--reps", type=int, default=3,
                    help="fresh-process warm reps after run 1")
    ap.add_argument("--skip-kernel", action="store_true")
    ap.add_argument("--skip-global", action="store_true")
    ap.add_argument("--kernel-only", action="store_true",
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.kernel_only:
        print(json.dumps(kernel_metric()))
        return 0

    os.environ.setdefault("HIPHASE_TPU_BENCH_QUIET", "1")
    here = os.path.dirname(os.path.abspath(__file__))
    e2e = os.path.join(here, "bench_e2e.py")

    # build the dataset once so run 1 times the pipeline, not the simulator
    import bench_e2e
    bench_e2e.ensure_dataset(bench_e2e.build_args(["--mb", str(args.mb)]))

    base_cmd = [sys.executable, e2e, "--mb", str(args.mb)]
    # shared deadline: the WHOLE bench must fit a driver-side `timeout 600`,
    # so later reps get whatever budget earlier (possibly hung) reps left
    deadline = time.monotonic() + 360
    attempts = []
    for _ in range(1 + args.reps):
        left = deadline - time.monotonic()
        if left < 20:
            attempts.append(None)
            continue
        attempts.append(_run_json(base_cmd, timeout=left))
    runs = [r for r in attempts if r is not None]
    if not runs:
        print(json.dumps({"metric": "e2e_phased_hets_per_sec", "value": 0,
                          "unit": "hets/s", "vs_baseline": 0,
                          "error": "all e2e runs failed"}))
        return 1

    times = [r["elapsed_s"] for r in runs]
    warm_best = min(times[1:]) if len(times) > 1 else times[0]
    n_het = runs[0]["n_het"]
    hets_per_sec = n_het / warm_best
    best_run = min(runs[1:] or runs, key=lambda r: r["elapsed_s"])

    out = {
        "metric": "e2e_phased_hets_per_sec",
        "value": round(hets_per_sec, 1),
        "unit": "hets/s",
        "vs_baseline": round(hets_per_sec / BASELINE_HETS_PER_SEC, 3),
        "elapsed_s": [round(t, 2) for t in times],
        "n_het": n_het,
        "total_bp": runs[0]["total_bp"],
        "engine_resolved": best_run.get("engine"),
        "fresh_process_per_rep": True,
    }
    # run 1 is the cold run; if it failed/timed out, say so — never label a
    # warm rep as the cold number
    if attempts[0] is not None:
        run1 = attempts[0]["elapsed_s"]
        out["run1_s"] = round(run1, 2)
        out["warm_best_s"] = round(warm_best, 2)
        out["cold_over_warm"] = round(run1 / warm_best, 2)
    else:
        out["run1_error"] = "cold run failed or timed out (>420s)"
    if len(runs) < len(attempts):
        out["failed_reps"] = len(attempts) - len(runs)
    if best_run.get("node_expansions"):
        sol = best_run.get("solve_seconds") or 0
        out["e2e_node_expansions"] = best_run["node_expansions"]
        if sol > 0:
            out["e2e_node_expansions_per_sec"] = round(
                best_run["node_expansions"] / sol, 1)

    if not args.skip_global:
        g = _run_json(base_cmd + ["--global"],
                      timeout=max(deadline + 120 - time.monotonic(), 20))
        if g is not None:
            out["global_mode"] = {
                "e2e_phased_hets_per_sec": g["value"],
                "elapsed_s": g["elapsed_s"],
                "vs_local": round(g["elapsed_s"] / warm_best, 2),
                "vs_dual_baseline": round(g["value"] / BASELINE_DUAL, 3),
            }

    if not args.skip_kernel:
        # bounded tightly: the whole bench must fit a driver-side
        # `timeout 600`, and a hung device link must cost minutes of margin,
        # not the budget
        k = _run_json([sys.executable, os.path.abspath(__file__),
                       "--kernel-only"], timeout=180)
        if k is None:
            out["kernel_hets_per_sec"] = None
            out["kernel_error"] = ("device kernel bench timed out or "
                                   "failed (degraded device link)")
        else:
            out.update(k)
        out["kernel_metric_note"] = KERNEL_NOTE

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
