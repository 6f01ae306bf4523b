"""TPU beam-search diplotype solver — the production phasing engine.

TPU-first redesign of the reference's A* search (ref: src/astar_phaser.rs):
instead of a pointer-chasing priority queue, phase blocks become dense
``[reads × variants]`` allele/qual matrices and the search runs as a
*lockstep beam* over variants. Key observation: the reference's A* heuristic
only mediates cross-depth priority; within one depth it is a constant and
cancels, so a fixed-width beam ranked by exact integer MEC cost explores the
same frontier with no heuristic sweep at all. The reference's queue-size
schedule (``min_queue_size + queue_increment·progress``) is itself an
adaptive beam width, so width ≥ that schedule preserves the argmin.

Tie-breaking replicates the reference: (min cost, max num_hets, insertion
order), with expansion order 0|1, 1|0, 0/0, 1/1 and the 1|0 twin suppressed
while a node's haplotypes are identical (symmetry breaking,
ref: astar_phaser.rs:535-560).

Everything is jittable with static shapes; blocks are padded to bucket sizes
and batched, then sharded data-parallel over a device mesh (see
`hiphase_tpu.parallel`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# Invalid-candidate sentinel for ranking keys. Plain Python int (a jnp
# scalar here would live on the default device — the tunneled TPU in this
# environment — and every lowering would fetch it back). Must exceed any
# legitimate block cost: the slotted worst case is
# 1024 slots x 8192 variants x qual 160 ~= 1.34e9, so sit just under the
# int32 ceiling.
BIG = 2_147_000_000

# Extension order: 0|1, 1|0, 0/0, 1/1 (ref: astar_phaser.rs:535-540).
# Encoded arithmetically so no constant tables are embedded in the program:
#   a1(c)  = c & 1                       -> [0, 1, 0, 1]
#   a2(c)  = 1 - ((c & 1) ^ (c >> 1))    -> [1, 0, 0, 1]
#   het(c) = 1 - (c >> 1)                -> [1, 1, 0, 0]
#   identical-preserving(c) = c >> 1     -> [0, 0, 1, 1]
_A1 = np.array([0, 1, 0, 1], dtype=np.int32)
_A2 = np.array([1, 0, 0, 1], dtype=np.int32)


def _choice_a1(c):
    return c & 1


def _choice_a2(c):
    return 1 - ((c & 1) ^ (c >> 1))


@dataclass
class BeamResult:
    h1: np.ndarray        # [B, V] uint8 alleles (0/1; 2 where skipped)
    h2: np.ndarray        # [B, V]
    cost: np.ndarray      # [B] int32 final MEC cost
    num_hets: np.ndarray  # [B] int32
    pruned: np.ndarray    # [B] int32 candidates dropped; 0 ⇒ provably optimal


def _step(state, inputs, beam_width: int):
    """One lockstep beam extension over a single variant column.

    Slot semantics: the R axis indexes read *slots*, not reads. A slot is
    reused by successive non-overlapping reads; ``reset_j`` marks slots whose
    previous read has ended — their running min(c1, c2) is folded into the
    per-node ``frozen`` cost and the slot restarts at zero (the tensorized
    analog of the reference's frozen/fluid split, ref: astar_phaser.rs:89-108).
    """
    c1, c2, frozen, cost, hets, identical, valid = state
    # a_j: [B, R] slot alleles at this variant; q_j: [B, R] int32 quals
    a_j, q_j, skip, reset_j = inputs  # skip: [B] bool; reset_j: [B, R] bool
    B, W, R = c1.shape

    # freeze finished reads before evaluating this column
    fold = jnp.where(reset_j[:, None, :], jnp.minimum(c1, c2), 0)
    frozen = frozen + jnp.sum(fold, axis=-1, dtype=jnp.int32)  # [B, W]
    keep = ~reset_j[:, None, :]
    c1 = jnp.where(keep, c1, 0)
    c2 = jnp.where(keep, c2, 0)

    cand_cost = []
    for c in range(4):
        d1 = jnp.where(a_j != _A1[c], q_j, 0)  # [B, R]; unset alleles have q=0
        d2 = jnp.where(a_j != _A2[c], q_j, 0)
        total = frozen + jnp.sum(
            jnp.minimum(c1 + d1[:, None, :], c2 + d2[:, None, :]),
            axis=-1, dtype=jnp.int32)  # [B, W]
        cand_cost.append(total)
    cand_cost = jnp.stack(cand_cost, axis=-1)  # [B, W, 4]
    # skipped variants extend with Ambiguous/Ambiguous at unchanged cost
    # (recomputed from state so slot freezes this step stay consistent)
    skip_cost = frozen + jnp.sum(jnp.minimum(c1, c2), axis=-1,
                                 dtype=jnp.int32)
    cand_cost = jnp.where(skip[:, None, None], skip_cost[:, :, None],
                          cand_cost)

    choice_ids = jax.lax.broadcasted_iota(jnp.int32, (B, W, 4), 2)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (B, W, 4), 1)

    het_inc = jnp.where(skip[:, None, None], 0, 1 - (choice_ids >> 1))
    cand_hets = hets[:, :, None] + het_inc
    cand_ident = jnp.where(
        skip[:, None, None], identical[:, :, None],
        identical[:, :, None] & (choice_ids >> 1).astype(bool))

    cand_valid = jnp.broadcast_to(valid[:, :, None], (B, W, 4))
    # symmetry breaking: no 1|0 while haplotypes identical
    cand_valid &= ~(identical[:, :, None] & (choice_ids == 1))
    # skipped/pad variants spawn exactly one child
    cand_valid &= (~skip[:, None, None]) | (choice_ids == 0)

    # rank by (cost, -hets, insertion order); invalid → +inf
    order = slot_ids * 4 + choice_ids
    k_cost = jnp.where(cand_valid, cand_cost, BIG).reshape(B, W * 4)
    k_hets = jnp.where(cand_valid, -cand_hets, BIG).reshape(B, W * 4)
    k_order = order.reshape(B, W * 4)
    parent_ids = slot_ids.reshape(B, W * 4)
    choice_flat = choice_ids.reshape(B, W * 4)
    valid_flat = cand_valid.reshape(B, W * 4)
    ident_flat = cand_ident.reshape(B, W * 4)

    (_, _, _, sel_parent, sel_choice, sel_valid, sel_ident) = jax.lax.sort(
        (k_cost, k_hets, k_order, parent_ids, choice_flat,
         valid_flat.astype(jnp.int32), ident_flat.astype(jnp.int32)),
        num_keys=3)
    sel_parent = sel_parent[:, :beam_width]
    sel_choice = sel_choice[:, :beam_width]
    new_valid = sel_valid[:, :beam_width].astype(bool)
    new_ident = sel_ident[:, :beam_width].astype(bool)

    n_valid = jnp.sum(valid_flat, axis=-1, dtype=jnp.int32)
    pruned_now = jnp.maximum(n_valid - beam_width, 0)

    # gather the survivors' per-read costs and roll the deltas in
    bidx = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    pc1 = c1[bidx, sel_parent]  # [B, W, R]
    pc2 = c2[bidx, sel_parent]
    new_frozen = frozen[bidx, sel_parent]
    sa1 = _choice_a1(sel_choice)  # [B, W]
    sa2 = _choice_a2(sel_choice)
    d1 = jnp.where(a_j[:, None, :] != sa1[:, :, None], q_j[:, None, :], 0)
    d2 = jnp.where(a_j[:, None, :] != sa2[:, :, None], q_j[:, None, :], 0)
    nskip = ~skip[:, None, None]
    new_c1 = pc1 + jnp.where(nskip, d1, 0)
    new_c2 = pc2 + jnp.where(nskip, d2, 0)

    new_cost = cand_cost.reshape(B, W * 4)[bidx, sel_parent * 4 + sel_choice]
    new_hets = cand_hets.reshape(B, W * 4)[bidx, sel_parent * 4 + sel_choice]

    new_state = (new_c1, new_c2, new_frozen, new_cost, new_hets, new_ident,
                 new_valid)
    return new_state, (sel_parent, sel_choice, pruned_now)


@functools.partial(jax.jit, static_argnames=("beam_width",))
def beam_solve_batch(alleles: jax.Array, quals: jax.Array, skip: jax.Array,
                     beam_width: int = 256, resets: jax.Array | None = None):
    """Solve a padded batch of phase blocks.

    Args:
      alleles: [B, R, V] uint8 — 0/1 set, 2 ambiguous, 3 no-overlap. The R
        axis is read *slots*: non-overlapping reads may share a slot when
        ``resets`` marks the handoff (see tensorize_block).
      quals:   [B, R, V] int32 — flip costs; 0 wherever allele unset.
      skip:    [B, V] bool — true for ignored variants AND padding columns
        (j >= num_variants of the block).
      beam_width: static beam width.
      resets:  [B, R, V] bool — slot s finishes its previous read before
        column v (fold min cost into frozen, restart slot). None → no reuse.

    Returns (h1, h2, cost, num_hets, pruned) — see BeamResult.
    """
    B, R, V = alleles.shape
    W = beam_width
    if resets is None:
        resets = jnp.zeros((B, R, V), dtype=bool)
    c1 = jnp.zeros((B, W, R), dtype=jnp.int32)
    c2 = jnp.zeros((B, W, R), dtype=jnp.int32)
    frozen = jnp.zeros((B, W), dtype=jnp.int32)
    cost = jnp.zeros((B, W), dtype=jnp.int32)
    hets = jnp.zeros((B, W), dtype=jnp.int32)
    identical = jnp.ones((B, W), dtype=bool)
    valid = jnp.zeros((B, W), dtype=bool).at[:, 0].set(True)

    xs = (jnp.moveaxis(alleles.astype(jnp.int32), 2, 0),   # [V, B, R]
          jnp.moveaxis(quals.astype(jnp.int32), 2, 0),
          jnp.moveaxis(skip, 1, 0),                         # [V, B]
          jnp.moveaxis(resets, 2, 0))                       # [V, B, R]
    step = functools.partial(_step, beam_width=W)
    (c1, c2, frozen, cost, hets, identical, valid), ys = jax.lax.scan(
        step, (c1, c2, frozen, cost, hets, identical, valid), xs)
    parents, choices, pruned_steps = ys  # [V, B, W], [V, B, W], [V, B]

    # backtrace from slot 0 (the sorted argmin) to recover the haplotypes
    def back(slot, inp):
        par_j, cho_j, skip_j = inp  # [B, W], [B, W], [B]
        bidx = jax.lax.broadcasted_iota(jnp.int32, (par_j.shape[0],), 0)
        ch = cho_j[bidx, slot]
        a1 = jnp.where(skip_j, 2, _choice_a1(ch)).astype(jnp.uint8)
        a2 = jnp.where(skip_j, 2, _choice_a2(ch)).astype(jnp.uint8)
        return par_j[bidx, slot], (a1, a2)

    slot0 = jnp.zeros(B, dtype=jnp.int32)
    _, (h1_rev, h2_rev) = jax.lax.scan(
        back, slot0, (parents, choices, jnp.moveaxis(skip, 1, 0)),
        reverse=True)
    h1 = jnp.moveaxis(h1_rev, 0, 1)  # [B, V]
    h2 = jnp.moveaxis(h2_rev, 0, 1)

    return h1, h2, cost[:, 0], hets[:, 0], jnp.sum(pruned_steps, axis=0)


def solve_blocks(alleles: np.ndarray, quals: np.ndarray, skip: np.ndarray,
                 beam_width: int = 256,
                 resets: np.ndarray | None = None) -> BeamResult:
    """Host wrapper: run the jitted batch solver and materialize results."""
    h1, h2, cost, hets, pruned = beam_solve_batch(
        jnp.asarray(alleles), jnp.asarray(quals), jnp.asarray(skip),
        beam_width=beam_width,
        resets=None if resets is None else jnp.asarray(resets))
    return BeamResult(np.asarray(h1), np.asarray(h2), np.asarray(cost),
                      np.asarray(hets), np.asarray(pruned))


def assign_slots(read_segments) -> tuple[list[int], int]:
    """Interval-allocate reads to reusable slots. Returns (slot per read,
    slot count). Reads ordered by start reuse the slot whose previous
    occupant ended earliest (long phase blocks have reads spanning only a
    small variant window, so slots ≪ reads)."""
    import heapq
    order = sorted(range(len(read_segments)),
                   key=lambda i: (read_segments[i].start, read_segments[i].end))
    slots = [0] * len(read_segments)
    free: list[tuple[int, int]] = []  # (end, slot)
    next_slot = 0
    for i in order:
        rs = read_segments[i]
        if free and free[0][0] <= rs.start:
            _, s = heapq.heappop(free)
        else:
            s = next_slot
            next_slot += 1
        slots[i] = s
        heapq.heappush(free, (rs.end, s))
    return slots, max(next_slot, 1)


def tensorize_block(read_segments, variants, num_reads_pad: int,
                    num_variants_pad: int, slotted: bool = False):
    """Pack one block's ReadSegments + Variants into padded arrays for
    `beam_solve_batch`.

    Dense mode (default): one row per read; returns (alleles [R,V] u8,
    quals [R,V] i32, skip [V] bool).

    Slotted mode: rows are reusable slots (``num_reads_pad`` must be ≥ the
    max concurrent reads); additionally returns resets [R,V] bool. This is
    what makes long blocks linear instead of quadratic on device.
    """
    R, V = num_reads_pad, num_variants_pad
    nv = len(variants)
    assert nv <= V
    alleles = np.full((R, V), 3, dtype=np.uint8)
    quals = np.zeros((R, V), dtype=np.int32)
    resets = np.zeros((R, V), dtype=bool)
    if slotted:
        slots, n_slots = assign_slots(read_segments)
        assert n_slots <= R, (n_slots, R)
        last_end = {}
        # iterate in slot-allocation order (by start) so the reset marks the
        # handoff between the slot's consecutive occupants
        order = sorted(range(len(read_segments)),
                       key=lambda i: (read_segments[i].start,
                                      read_segments[i].end))
        for i in order:
            rs = read_segments[i]
            s = slots[i]
            span = slice(rs.start, rs.end)
            alleles[s, span] = rs.alleles
            quals[s, span] = rs.quals
            prev = last_end.get(s)
            if prev is not None:
                assert prev <= rs.start
                resets[s, rs.start] = True  # fold before the new read enters
            last_end[s] = rs.end
    else:
        assert len(read_segments) <= R
        for i, rs in enumerate(read_segments):
            a, q = rs.to_padded(nv)
            alleles[i, :nv] = a
            quals[i, :nv] = q
    skip = np.ones(V, dtype=bool)
    for j, v in enumerate(variants):
        skip[j] = v.is_ignored
    # unset alleles must carry zero qual so they never contribute cost
    quals[(alleles >= 2)] = 0
    return (alleles, quals, skip, resets) if slotted else (alleles, quals, skip)
