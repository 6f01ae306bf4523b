"""Multi-host (pod-slice) execution support.

The reference's distribution story is a single-process thread pool
(SURVEY.md §2.9); the TPU build's counterpart is the JAX multi-host runtime:

  * every host runs the same program under `jax.distributed.initialize`
    (DCN bootstrap);
  * the block stream is deterministically sharded by host — host h takes
    blocks with ``block_index % num_hosts == h`` — so no coordination is
    needed while producing (each host reads the shared BAM/VCF inputs and
    the replicated reference FASTA);
  * each host feeds its addressable devices through the same
    `solve_blocks_sharded` jit (a global array sharded over the full mesh);
    XLA's collectives ride ICI within the slice;
  * per-block results are host-local (data-parallel axis), so the ordered
    writers run on host 0: results from other hosts arrive via
    `jax.experimental.multihost_utils.process_allgather` on the compact
    (h1, h2, cost) arrays, and host 0 replays them into the in-order drain
    (the ordered writers already reorder by block_index).

Single-host multi-chip needs none of this — `parallel.sharding` covers it.
This module provides the bootstrap + host-sharding helpers; it is exercised
in-process in tests (the deterministic sharding math and gather plumbing)
since this environment has one host.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bootstrap the multi-host runtime (no-op when single-process).
    With TPU pod metadata available, bare `jax.distributed.initialize()`
    autodetects everything."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def host_count() -> int:
    return jax.process_count()


def host_index() -> int:
    return jax.process_index()


def blocks_for_host(block_index: int, n_hosts: int | None = None,
                    host: int | None = None) -> bool:
    """Deterministic round-robin block→host assignment."""
    n = n_hosts if n_hosts is not None else jax.process_count()
    h = host if host is not None else jax.process_index()
    return block_index % n == h


def shard_block_stream(block_iterator, n_hosts: int | None = None,
                       host: int | None = None):
    """Yield only this host's blocks from the global (renumbered) stream."""
    for block in block_iterator:
        if blocks_for_host(block.block_index, n_hosts, host):
            yield block
