"""Device-mesh data parallelism for the phasing engine.

The reference's entire parallel story is a shared-memory thread pool over
independent phase blocks (ref: src/main.rs:325-462). The TPU equivalent is
data-parallel sharding of padded block batches over a 1-D `jax.sharding.Mesh`
("data" axis): every chip solves its shard of blocks with the beam engine,
and the only collectives are the result gather plus a `psum`-style reduction
for run statistics — both riding ICI.

Multi-host: the same jit runs under `jax.distributed.initialize`; the block
producer shards the stream by host (DCN) and each host feeds its
addressable shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hiphase_tpu.phasing.beam import beam_solve_batch


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


@functools.partial(jax.jit, static_argnames=("beam_width",))
def _solve_and_summarize(alleles, quals, skip, beam_width: int):
    """The full device step: batched beam solve + global summary reduction.
    Under a sharded `in_shardings` this is pure data parallelism with an
    all-reduce for the summary scalars."""
    h1, h2, cost, hets, pruned = beam_solve_batch(
        alleles, quals, skip, beam_width=beam_width)
    summary = {
        "total_cost": jnp.sum(cost),
        "total_hets": jnp.sum(hets),
        "total_pruned": jnp.sum(pruned),
        "blocks": jnp.asarray(alleles.shape[0], jnp.int32),
    }
    return (h1, h2, cost, hets, pruned), summary


def solve_blocks_sharded(mesh: Mesh, alleles: np.ndarray, quals: np.ndarray,
                         skip: np.ndarray, beam_width: int = 256):
    """Solve a padded batch of blocks data-parallel over the mesh.

    The batch dimension must be divisible by the mesh size (pad with empty
    blocks: all-NoOverlap reads, skip all-true).
    """
    n = mesh.devices.size
    B = alleles.shape[0]
    assert B % n == 0, f"batch {B} not divisible by mesh size {n}"
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    alleles = jax.device_put(jnp.asarray(alleles), data_sharding)
    quals = jax.device_put(jnp.asarray(quals), data_sharding)
    skip = jax.device_put(jnp.asarray(skip), data_sharding)

    with mesh:
        (h1, h2, cost, hets, pruned), summary = _solve_and_summarize(
            alleles, quals, skip, beam_width=beam_width)
    return (np.asarray(h1), np.asarray(h2), np.asarray(cost),
            np.asarray(hets), np.asarray(pruned),
            {k: int(v) for k, v in summary.items()})


def pad_batch(blocks: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
              multiple: int):
    """Stack per-block (alleles, quals, skip) tuples and pad the batch
    dimension up to a multiple of the mesh size with inert blocks."""
    assert blocks
    R, V = blocks[0][0].shape
    B = len(blocks)
    pad = (-B) % multiple
    A = np.full((B + pad, R, V), 3, dtype=np.uint8)
    Q = np.zeros((B + pad, R, V), dtype=np.int32)
    S = np.ones((B + pad, V), dtype=bool)
    for i, (a, q, s) in enumerate(blocks):
        A[i], Q[i], S[i] = a, q, s
    return A, Q, S, B
