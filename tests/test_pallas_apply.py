"""Pallas fused sparse-apply kernel vs the jnp reference lowering.

Runs in interpret mode on CPU (tests force jax_platforms=cpu); the
compiled path is exercised on real TPU by tools/kernel_benchmark.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from deeprec_tpu.ops.pallas import sparse_apply as sa


def _mk(C=64, D=16, n=24, seed=0):
    rng = np.random.default_rng(seed)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    accum = jnp.asarray(rng.uniform(0.1, 1.0, size=(C + 1, D)),
                        jnp.float32)
    slots = jnp.asarray(rng.permutation(C)[:n], jnp.int32)
    grads = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    return values, accum, slots, grads


@pytest.mark.parametrize("D", [16, 128])
def test_matches_reference(D):
    values, accum, slots, grads = _mk(D=D)
    v1, a1 = sa.adagrad_apply_rows(values, accum, slots, grads, 0.1,
                                   interpret=True)
    v2, a2 = sa.adagrad_apply_rows_reference(values, accum, slots,
                                             grads, 0.1)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6, atol=1e-7)


def test_untouched_rows_unchanged():
    values, accum, slots, grads = _mk(n=8)
    v1, a1 = sa.adagrad_apply_rows(values, accum, slots, grads, 0.1,
                                   interpret=True)
    touched = set(np.asarray(slots).tolist())
    for r in range(values.shape[0]):
        if r not in touched:
            np.testing.assert_array_equal(np.asarray(v1[r]),
                                          np.asarray(values[r]))


def test_overflow_slots_dropped():
    C, D = 32, 16
    values, accum, slots, grads = _mk(C=C, D=D, n=8)
    slots = slots.at[0].set(C)      # overflow sentinel
    slots = slots.at[1].set(C + 1)  # drop marker
    v1, a1 = sa.adagrad_apply_rows(values, accum, slots, grads, 0.1,
                                   interpret=True)
    v2, a2 = sa.adagrad_apply_rows_reference(values, accum, slots,
                                             grads, 0.1)
    np.testing.assert_allclose(np.asarray(v1[:C]), np.asarray(v2[:C]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1[:C]), np.asarray(a2[:C]),
                               rtol=1e-6, atol=1e-7)


def test_ragged_n_not_multiple_of_tile():
    values, accum, slots, grads = _mk(n=13)
    v1, a1 = sa.adagrad_apply_rows(values, accum, slots, grads, 0.05,
                                   interpret=True)
    v2, a2 = sa.adagrad_apply_rows_reference(values, accum, slots,
                                             grads, 0.05)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6, atol=1e-7)


class TestAdamFused:
    def _mk(self, C=64, D=16, n=24, seed=1):
        rng = np.random.default_rng(seed)
        values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
        m = jnp.asarray(rng.normal(0, 0.1, size=(C + 1, D)), jnp.float32)
        v = jnp.asarray(rng.uniform(0, 0.1, size=(C + 1, D)), jnp.float32)
        slots = jnp.asarray(rng.permutation(C)[:n], jnp.int32)
        grads = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
        return values, m, v, slots, grads

    @pytest.mark.parametrize("D", [16, 128])
    def test_matches_reference(self, D):
        values, m, v, slots, grads = self._mk(D=D)
        C = values.shape[0] - 1
        args = (0.01, 0.9, 0.999, 1e-8)
        o1 = sa.adam_apply_rows(values, m, v, slots, grads, *args,
                                interpret=True)
        o2 = sa.adam_apply_rows_reference(values, m, v, slots, grads,
                                          *args)
        # Row C is the overflow/scratch sentinel — never read through
        # the default path; the kernel's tile-padding lanes may park
        # zero-grad updates there (an Adam step still decays m/v)
        # while the reference drops them, so its content is
        # unspecified. Compare the real rows only.
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a)[:C],
                                       np.asarray(b)[:C],
                                       rtol=1e-5, atol=1e-6)

    def test_drops_and_ragged(self):
        C = 32
        values, m, v, slots, grads = self._mk(C=C, n=13)
        slots = slots.at[0].set(C + 1)
        args = (0.05, 0.9, 0.999, 1e-8)
        o1 = sa.adam_apply_rows(values, m, v, slots, grads, *args,
                                interpret=True)
        o2 = sa.adam_apply_rows_reference(values, m, v, slots, grads,
                                          *args)
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a[:C]),
                                       np.asarray(b[:C]),
                                       rtol=1e-5, atol=1e-6)
