"""Isolate the beam-step survivor gather: which formulation is fastest?

Times y = c1[b, idx[b, w], :] for [B, W, R] state and [B, W] indices,
chained 128x (like one tile's scan) so dispatch overhead amortizes:

  fancy    current production: c1[bidx, idx] with broadcasted iota
  flat     reshape to [B*W, R], gather rows with flat indices via jnp.take
  onehot   one-hot f32 matmul (MXU): einsum('bwp,bpr->bwr')
  onehot_bf16 same with bf16 one-hot and f32 accumulation
  dynslice vmap of dynamic_slice per row  (expected slow; for the record)
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

ap = argparse.ArgumentParser()
ap.add_argument("--variant", default="fancy")
ap.add_argument("--B", type=int, default=16)
ap.add_argument("--R", type=int, default=128)
ap.add_argument("--W", type=int, default=1024)
ap.add_argument("--T", type=int, default=128)
ap.add_argument("--dtype", default="int32")
args = ap.parse_args()


def gather(c1, idx, variant):
    B, W, R = c1.shape
    if variant == "fancy":
        bidx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
        return c1[bidx, idx]
    if variant == "flat":
        flat = c1.reshape(B * W, R)
        g = (jax.lax.broadcasted_iota(jnp.int32, (B, W), 0) * W + idx)
        return jnp.take(flat, g.reshape(-1), axis=0).reshape(B, W, R)
    if variant == "onehot":
        onehot = (idx[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
                  ).astype(jnp.float32)
        return jnp.einsum("bwp,bpr->bwr", onehot,
                          c1.astype(jnp.float32),
                          preferred_element_type=jnp.float32
                          ).astype(c1.dtype)
    if variant == "onehot_bf16":
        onehot = (idx[:, :, None] ==
                  jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
                  ).astype(jnp.bfloat16)
        return jnp.einsum("bwp,bpr->bwr", onehot,
                          c1.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32
                          ).astype(c1.dtype)
    if variant == "dynslice":
        def row(c, i):
            return jax.lax.dynamic_slice(c, (i, 0), (1, c.shape[1]))[0]
        return jax.vmap(jax.vmap(row, in_axes=(None, 0)))(c1, idx)
    raise SystemExit(f"unknown variant {variant}")


@functools.partial(jax.jit, static_argnames=("variant", "T"))
def chain(c1, idxs, variant, T):
    def step(c, i):
        g = gather(c, i, variant)
        return g + 1, g[:, 0, 0]
    return jax.lax.scan(step, c1, idxs)


def main():
    B, R, W, T = args.B, args.R, args.W, args.T
    rng = np.random.default_rng(0)
    dt = np.int16 if args.dtype == "int16" else np.int32
    c1 = rng.integers(0, 1000, size=(B, W, R)).astype(dt)
    idxs = rng.integers(0, W, size=(T, B, W)).astype(np.int32)
    c1_d = jax.device_put(c1)
    idxs_d = jax.device_put(idxs)

    t0 = time.perf_counter()
    out, _ = chain(c1_d, idxs_d, args.variant, T)
    np.asarray(out[:, 0, 0])
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, _ = chain(c1_d, idxs_d, args.variant, T)
        np.asarray(out[:, 0, 0])
        best = min(best, time.perf_counter() - t0)
    bytes_touched = 2 * B * W * R * c1.itemsize * T
    print(json.dumps({
        "variant": args.variant, "dtype": args.dtype, "B": B, "W": W,
        "R": R, "T": T, "platform": jax.devices()[0].platform,
        "compile_s": round(compile_s, 2),
        "chain_ms": round(best * 1e3, 2),
        "per_gather_us": round(best / T * 1e6, 1),
        "eff_GBps": round(bytes_touched / best / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
