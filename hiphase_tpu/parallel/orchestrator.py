"""Block-stream orchestration (ref: src/main.rs:325-462).

The reference fans blocks out to a shared-memory thread pool and restores
order in the writers. Here the equivalent is a pipelined producer/consumer:

  producer (host)  — streaming block gen + per-block prepare (VCF/BAM I/O,
                     tensorization), optionally on a thread pool
  device (TPU)     — bucketed, padded batches through the beam engine;
                     buckets keyed by (reads, variants) so the jit cache
                     stays small and utilization high
  consumer (host)  — finalize (block split, haplotag) and feed the ordered
                     writers, which already reorder by block index

Blocks too large for a bucket fall back to the host A* oracle, preserving
output semantics.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from hiphase_tpu.phasing.astar import astar_solver
from hiphase_tpu.phasing.beam import (
    assign_slots, beam_solve_batch, tensorize_block,
)
from hiphase_tpu.phasing.phaser import BlockData, finalize_block
from hiphase_tpu.core.variants import AlleleType, VariantType
from hiphase_tpu.writers.phase_stats import PhaseStats

logger = logging.getLogger(__name__)

AMB = int(AlleleType.AMBIGUOUS)

# bucket ladders: padded (slots, variants) shapes; beyond the last → host A*.
# The slot axis counts *concurrent* reads (interval-packed), so even
# megabase blocks stay within a few hundred slots at WGS coverage.
READ_BUCKETS = (32, 64, 128, 256, 512, 1024)
VAR_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _bucket_of(n: int, ladder: tuple[int, ...]) -> int | None:
    for b in ladder:
        if n <= b:
            return b
    return None


def _stats_from_beam(data: BlockData, h1, h2, cost: int, pruned: int) -> PhaseStats:
    phased = sum(1 for a, b in zip(h1, h2) if a != b)
    phased_snvs = sum(
        1 for i, (a, b) in enumerate(zip(h1, h2))
        if a != b and data.variants[i].variant_type == VariantType.SNV)
    skipped = sum(1 for a, b in zip(h1, h2) if a == b == AMB)
    hom = len(h1) - phased - skipped
    # the beam has no admissible pre-estimate; report the exact cost so
    # cost_ratio stays 1.0 and pruned==0 keeps meaning provably optimal
    return PhaseStats(pruned, cost, cost, phased, phased_snvs, hom, skipped)


@dataclass
class _Pending:
    data: BlockData
    alleles: np.ndarray
    quals: np.ndarray
    skip: np.ndarray
    resets: np.ndarray


class BatchedDeviceSolver:
    """Buckets prepared blocks into fixed-shape padded batches and solves
    them on the accelerator; `drain` yields finalized results."""

    def __init__(self, beam_width: int = 256, batch_size: int = 32,
                 min_queue_size: int = 1000, queue_increment: int = 3):
        self.beam_width = beam_width
        self.batch_size = batch_size
        self.min_queue_size = min_queue_size
        self.queue_increment = queue_increment
        self._buckets: dict[tuple[int, int], list[_Pending]] = {}

    def _batch_size_for(self, rb: int, vb: int) -> int:
        """Shrink the batch for big shapes so per-batch device work stays
        bounded (the jit cache keys on (B, rb, vb, W))."""
        cells = rb * vb
        base_cells = 128 * 64
        return max(1, min(self.batch_size,
                          self.batch_size * base_cells // max(cells, 1)))

    def submit(self, data: BlockData):
        """Queue one prepared block; returns completed results if the
        bucket filled."""
        nv = len(data.variants)
        _slots, n_slots = assign_slots(data.read_segments) \
            if data.read_segments else ([], 1)
        rb = _bucket_of(n_slots, READ_BUCKETS)
        vb = _bucket_of(nv, VAR_BUCKETS)
        if rb is None or vb is None:
            # giant block: host oracle fallback
            result = astar_solver(data.phase_block.block_index, data.variants,
                                  data.read_segments, self.min_queue_size,
                                  self.queue_increment)
            return [finalize_block(data, result.haplotype_1,
                                   result.haplotype_2, result.statistics)]
        alleles, quals, skip, resets = tensorize_block(
            data.read_segments, data.variants, rb, vb, slotted=True)
        bucket = self._buckets.setdefault((rb, vb), [])
        bucket.append(_Pending(data, alleles, quals, skip, resets))
        if len(bucket) >= self._batch_size_for(rb, vb):
            return self._solve_bucket((rb, vb))
        return []

    def _solve_bucket(self, key):
        pending = self._buckets.pop(key, [])
        if not pending:
            return []
        rb, vb = key
        B = self._batch_size_for(rb, vb)
        A = np.full((B, rb, vb), 3, dtype=np.uint8)
        Q = np.zeros((B, rb, vb), dtype=np.int32)
        S = np.ones((B, vb), dtype=bool)
        RS = np.zeros((B, rb, vb), dtype=bool)
        for i, p in enumerate(pending):
            A[i], Q[i], S[i], RS[i] = p.alleles, p.quals, p.skip, p.resets
        h1, h2, cost, _hets, pruned = beam_solve_batch(
            A, Q, S, beam_width=self.beam_width, resets=RS)
        h1 = np.asarray(h1)
        h2 = np.asarray(h2)
        cost = np.asarray(cost)
        pruned = np.asarray(pruned)
        out = []
        for i, p in enumerate(pending):
            nv = len(p.data.variants)
            bh1 = [int(x) for x in h1[i, :nv]]
            bh2 = [int(x) for x in h2[i, :nv]]
            stats = _stats_from_beam(p.data, bh1, bh2, int(cost[i]),
                                     int(pruned[i]))
            out.append(finalize_block(p.data, bh1, bh2, stats))
        return out

    def drain(self):
        out = []
        for key in sorted(self._buckets.keys()):
            out.extend(self._solve_bucket(key))
        return out


def iter_prepared(block_iterator, prepare_fn, unphased_fn, should_solve,
                  threads: int = 1, window: int = 40):
    """Yield ('solve', BlockData) or ('unphased', block) preserving stream
    order, preparing up to ``window × threads`` blocks ahead on a pool
    (the reference's 40×threads in-flight backpressure, ref: main.rs:328)."""
    if threads <= 1:
        for block in block_iterator:
            if should_solve(block):
                yield ("solve", prepare_fn(block))
            else:
                yield ("unphased", block)
        return

    max_inflight = window * threads
    with ThreadPoolExecutor(max_workers=threads) as pool:
        inflight = []  # list of ('solve', future) | ('unphased', block)
        for block in block_iterator:
            if should_solve(block):
                inflight.append(("solve", pool.submit(prepare_fn, block)))
            else:
                inflight.append(("unphased", block))
            while len(inflight) >= max_inflight:
                kind, item = inflight.pop(0)
                yield (kind, item.result() if kind == "solve" else item)
        for kind, item in inflight:
            yield (kind, item.result() if kind == "solve" else item)
