"""Prototype: Pallas permute+update kernel for the beam step's survivor
gather — out[b,w,:] = delta[b, idx[b,w], :] + sgn[b,w]*e0[b,:], zeroed at
reset slots. The XLA gather is per-index bound (~307us at B=64, W=1024,
R=128); this keeps delta VMEM-resident per batch row and applies the
permutation as on-the-fly one-hot bf16 MXU matmuls (exact via a
two's-complement hi/lo digit split, |delta| < 2^15 required).

    python scripts/pallas_permute.py [--check] [--bench]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ap = argparse.ArgumentParser()
ap.add_argument("--B", type=int, default=64)
ap.add_argument("--W", type=int, default=1024)
ap.add_argument("--R", type=int, default=128)
ap.add_argument("--T", type=int, default=128)
ap.add_argument("--check", action="store_true")
ap.add_argument("--bench", action="store_true")
ap.add_argument("--interpret", action="store_true")
args = ap.parse_args()


def _permute_kernel(idx_ref, sgn_ref, e0_ref, rn_ref, delta_ref, out_ref):
    _, W, R = delta_ref.shape
    dlt = delta_ref[0]
    hi = (dlt >> 8).astype(jnp.bfloat16)
    lo = (dlt & 255).astype(jnp.bfloat16)
    e0 = e0_ref[0]                     # [1, R] i32
    rn = rn_ref[0]                     # [1, R] i32 (0/1)
    for ot in range(W // 128):
        rows = idx_ref[0, 0, ot * 128:(ot + 1) * 128]     # [128] i32
        sg = sgn_ref[0, 0, ot * 128:(ot + 1) * 128]       # [128] i32
        acc = jnp.zeros((128, R), jnp.float32)
        for kt in range(W // 128):
            kiota = kt * 128 + jax.lax.broadcasted_iota(
                jnp.int32, (128, 128), 1)
            oh = (rows[:, None] == kiota).astype(jnp.bfloat16)
            acc += jnp.dot(oh, hi[kt * 128:(kt + 1) * 128],
                           preferred_element_type=jnp.float32) * 256.0
            acc += jnp.dot(oh, lo[kt * 128:(kt + 1) * 128],
                           preferred_element_type=jnp.float32)
        g = acc.astype(jnp.int32)
        upd = g + sg[:, None] * e0
        out_ref[0, ot * 128:(ot + 1) * 128, :] = jnp.where(rn != 0, 0, upd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def permute_update_pallas(delta, idx, sgn, e0, rn, interpret=False):
    B, W, R = delta.shape
    return pl.pallas_call(
        _permute_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0)),  # idx
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0)),  # sgn
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0)),  # e0
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0)),  # rn
            pl.BlockSpec((1, W, R), lambda b: (b, 0, 0)),  # delta
        ],
        out_specs=pl.BlockSpec((1, W, R), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, W, R), jnp.int32),
        interpret=interpret,
    )(idx[:, None, :], sgn[:, None, :], e0[:, None, :], rn[:, None, :],
      delta)


def reference(delta, idx, sgn, e0, rn):
    bidx = np.arange(delta.shape[0])[:, None]
    out = delta[bidx, idx] + sgn[:, :, None] * e0[:, None, :]
    return np.where(rn[:, None, :] != 0, 0, out)


def main():
    B, W, R, T = args.B, args.W, args.R, args.T
    rng = np.random.default_rng(0)
    delta = rng.integers(-3000, 3000, (B, W, R)).astype(np.int32)
    idx = rng.integers(0, W, (B, W)).astype(np.int32)
    sgn = rng.integers(-1, 2, (B, W)).astype(np.int32)
    e0 = rng.integers(-160, 161, (B, R)).astype(np.int32)
    rn = (rng.random((B, R)) < 0.05).astype(np.int32)

    if args.check:
        got = np.asarray(permute_update_pallas(
            jnp.asarray(delta), jnp.asarray(idx), jnp.asarray(sgn),
            jnp.asarray(e0), jnp.asarray(rn), interpret=args.interpret))
        want = reference(delta, idx, sgn, e0, rn)
        ok = np.array_equal(got, want)
        print(json.dumps({"check": bool(ok),
                          "platform": jax.devices()[0].platform}))
        if not ok:
            bad = np.argwhere(got != want)
            print("first diffs:", bad[:5].tolist(),
                  got[tuple(bad[0])], want[tuple(bad[0])])
            sys.exit(1)
        if not args.bench:
            return

    # bench: chain T permutes like one tile's scan
    d = jax.device_put(delta)
    idxs = jax.device_put(rng.integers(0, W, (T, B, W)).astype(np.int32))
    sg = jax.device_put(sgn)
    e = jax.device_put(e0)
    r = jax.device_put(rn)

    @jax.jit
    def chain(d0, idxs):
        def step(dlt, ix):
            return permute_update_pallas(dlt, ix, sg, e, r), ix[0, 0]
        return jax.lax.scan(step, d0, idxs)

    t0 = time.perf_counter()
    out, _ = chain(d, idxs)
    np.asarray(out[0, 0, 0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = chain(d, idxs)
        np.asarray(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "B": B, "W": W, "R": R, "T": T,
        "compile_s": round(compile_s, 2),
        "per_permute_us": round(best / T * 1e6, 1),
    }))


if __name__ == "__main__":
    main()
