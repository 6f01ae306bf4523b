"""Pallas kernel parity tests (interpret mode on CPU; the same kernels run
compiled on TPU — see ops/score_kernel.py microbenchmarks)."""

import jax.numpy as jnp
import numpy as np

from hiphase_tpu.ops.score_kernel import candidate_costs, candidate_costs_xla


def test_candidate_costs_parity():
    rng = np.random.default_rng(0)
    for B, W, R in [(2, 32, 128), (1, 128, 256), (3, 256, 128)]:
        c1 = jnp.asarray(rng.integers(0, 1000, (B, W, R)), jnp.int32)
        c2 = jnp.asarray(rng.integers(0, 1000, (B, W, R)), jnp.int32)
        a = jnp.asarray(rng.integers(0, 4, (B, R)), jnp.int32)
        q = jnp.asarray(rng.integers(0, 60, (B, R)), jnp.int32)
        ref = np.asarray(candidate_costs_xla(c1, c2, a, q))
        got = np.asarray(candidate_costs(c1, c2, a, q, interpret=True))
        assert (ref == got).all()


def test_candidate_costs_matches_beam_semantics():
    """The kernel's choice encoding must match the beam engine's."""
    from hiphase_tpu.phasing.beam import _choice_a1, _choice_a2
    assert [_choice_a1(c) for c in range(4)] == [0, 1, 0, 1]
    assert [_choice_a2(c) for c in range(4)] == [1, 0, 0, 1]
