"""Pallas TPU kernel for the beam engine's hot loop: candidate cost
evaluation (hot loop #1, ref: read_segments.rs:177-206 inside
astar_phaser.rs:69-119).

For each beam slot and each of the 4 diplotype extensions, the candidate
cost is Σ_r min(c1 + d1, c2 + d2) where d are the per-read flip costs at the
new variant. The XLA formulation materializes the four [B, W, R] minima and
reads c1/c2 four times; this kernel computes the per-choice deltas from the
raw (allele, qual) columns in VMEM and reads the running costs once —
a ~4× cut in HBM traffic on the dominant array.

Choice encoding (ref: astar_phaser.rs:535-540): a1(c) = c & 1,
a2(c) = 1 - ((c & 1) ^ (c >> 1)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cost_kernel(c1_ref, c2_ref, a_ref, q_ref, out_ref):
    # c1/c2: [1, TW, R]; a/q: [1, 1, R]; out: [1, TW, 4]
    a = a_ref[0, 0, :]
    q = q_ref[0, 0, :]
    c1 = c1_ref[0]
    c2 = c2_ref[0]
    for c in range(4):
        a1 = c & 1
        a2 = 1 - ((c & 1) ^ (c >> 1))
        d1 = jnp.where(a != a1, q, 0)
        d2 = jnp.where(a != a2, q, 0)
        m = jnp.minimum(c1 + d1[None, :], c2 + d2[None, :])
        out_ref[0, :, c] = jnp.sum(m, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def candidate_costs(c1: jax.Array, c2: jax.Array, a_j: jax.Array,
                    q_j: jax.Array, interpret: bool = False) -> jax.Array:
    """[B, W, R] running costs + [B, R] variant column → [B, W, 4] totals.

    All inputs int32 (alleles already widened). W is tiled at ≤128 rows; the
    W axis must divide evenly by the chosen tile.
    """
    B, W, R = c1.shape
    TW = W if W <= 128 else 128
    assert W % TW == 0, f"beam width {W} must be a multiple of {TW}"

    grid = (B, W // TW)
    a_j = a_j.reshape(B, 1, R)
    q_j = q_j.reshape(B, 1, R)
    return pl.pallas_call(
        _cost_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TW, R), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TW, R), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, w: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, w: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TW, 4), lambda b, w: (b, w, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, W, 4), jnp.int32),
        interpret=interpret,
    )(c1, c2, a_j, q_j)


def candidate_costs_xla(c1, c2, a_j, q_j):
    """Reference XLA formulation (used on CPU and for parity tests)."""
    outs = []
    for c in range(4):
        a1 = c & 1
        a2 = 1 - ((c & 1) ^ (c >> 1))
        d1 = jnp.where(a_j != a1, q_j, 0)
        d2 = jnp.where(a_j != a2, q_j, 0)
        outs.append(jnp.sum(
            jnp.minimum(c1 + d1[:, None, :], c2 + d2[:, None, :]),
            axis=-1, dtype=jnp.int32))
    return jnp.stack(outs, axis=-1)
