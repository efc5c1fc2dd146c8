"""Tensible tables: growth, admit strategies, blacklist.

Behavior model: ``core/framework/hash_table/hash_table_test.cc`` and
``python/ops/hash_table/*_test.py`` semantics — ids keep their values
across growth; admission gates inserts; blacklisted ids never train.
"""

import numpy as np
import jax.numpy as jnp

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import hash_table as ht
from deeprec_tpu.embedding import tensible as tn
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.utils import keys as keylib


def _cfg(capacity=32, dim=4):
    return cfglib.TableConfig(name="t", dim=dim, capacity=capacity,
                              initializer="zeros")


def _ids(vals):
    hi, lo = keylib.split_ids(np.asarray(vals, np.int64))
    return jnp.asarray(hi), jnp.asarray(lo)


def _train(t, ids, step, grad=1.0):
    hi, lo = _ids(ids)
    lk = t.lookup_train(hi, lo, jnp.ones(len(ids), jnp.int32), step)
    g = jnp.full((len(ids), t.cfg.dim), grad, jnp.float32)
    t.apply_gradients(lk, g, step)
    return lk


class TestGrowth:
    def test_values_survive_growth(self):
        t = tn.TensibleEV(_cfg(capacity=32), sopt.SparseAdagrad(0.1),
                          growth_threshold=0.5)
        ids = list(range(1, 21))
        _train(t, ids, 0)
        hi, lo = _ids(ids)
        before = np.asarray(t.lookup(hi, lo))
        acc_before = {}
        slots = np.asarray(ht.find(t.state.table, hi, lo))
        for i, s in zip(ids, slots):
            acc_before[i] = np.asarray(t.slots["accum"])[s].copy()

        assert t.maybe_grow()
        assert t.capacity == 64 and t.generation == 1
        after = np.asarray(t.lookup(hi, lo))
        np.testing.assert_array_equal(before, after)
        slots2 = np.asarray(ht.find(t.state.table, hi, lo))
        for i, s in zip(ids, slots2):
            assert s < t.capacity
            np.testing.assert_array_equal(
                np.asarray(t.slots["accum"])[s], acc_before[i])

    def test_no_growth_under_threshold(self):
        t = tn.TensibleEV(_cfg(capacity=64), sopt.SparseSGD(),
                          growth_threshold=0.9)
        _train(t, list(range(1, 11)), 0)
        assert not t.maybe_grow()
        assert t.capacity == 64

    def test_max_capacity_cap(self):
        t = tn.TensibleEV(_cfg(capacity=16), sopt.SparseSGD(),
                          growth_threshold=0.25, max_capacity=16)
        _train(t, list(range(1, 9)), 0)
        assert not t.maybe_grow()

    def test_training_continues_after_growth(self):
        t = tn.TensibleEV(_cfg(capacity=16), sopt.SparseSGD(0.5),
                          growth_threshold=0.5)
        _train(t, list(range(1, 11)), 0)
        t.maybe_grow()
        _train(t, list(range(1, 11)), 1)
        hi, lo = _ids([1])
        v = np.asarray(t.lookup(hi, lo))
        # two SGD steps of grad 1.0 at lr 0.5 from zeros => -1.0
        np.testing.assert_allclose(v[0], -1.0, rtol=1e-6)

    def test_scalar_slot_leaves_carry_over(self):
        t = tn.TensibleEV(_cfg(capacity=16), sopt.SparseAdam(),
                          growth_threshold=0.3)
        _train(t, list(range(1, 7)), 0)
        b1p = float(t.slots["beta1_power"])
        assert t.maybe_grow()
        assert float(t.slots["beta1_power"]) == b1p


class TestAdmit:
    def test_read_only_never_inserts(self):
        t = tn.TensibleEV(_cfg(), sopt.SparseSGD(),
                          admit=tn.ReadOnlyAdmit())
        lk = _train(t, [1, 2, 3], 0)
        assert t.live() == 0
        assert not np.asarray(lk.admitted).any()
        # reads are the default value (zeros initializer)
        np.testing.assert_array_equal(np.asarray(lk.rows), 0.0)

    def test_bloom_admit_gates_insert(self):
        t = tn.TensibleEV(_cfg(), sopt.SparseSGD(),
                          admit=tn.BloomAdmit(filter_freq=3))
        _train(t, [7], 0)
        assert t.live() == 0       # count 1 < 3
        _train(t, [7], 1)
        assert t.live() == 0       # count 2 < 3
        _train(t, [7], 2)
        assert t.live() == 1       # count 3 -> inserted

    def test_everything_admits(self):
        t = tn.TensibleEV(_cfg(), sopt.SparseSGD())
        _train(t, [1, 2], 0)
        assert t.live() == 2


class TestBlackList:
    def test_contains(self):
        bl = tn.BlackList(np.array([5, 10, 99], np.int64))
        hi, lo = _ids([5, 6, 10, 98, 99])
        got = np.asarray(bl.contains(hi, lo))
        assert got.tolist() == [True, False, True, False, True]

    def test_empty(self):
        bl = tn.BlackList(np.array([], np.int64))
        hi, lo = _ids([1])
        assert not np.asarray(bl.contains(hi, lo)).any()

    def test_blacklisted_ids_never_train(self):
        bl = tn.BlackList(np.array([13], np.int64))
        t = tn.TensibleEV(_cfg(), sopt.SparseSGD(0.5), blacklist=bl)
        _train(t, [13, 14], 0)
        assert t.live() == 1   # only 14
        hi, lo = _ids([13, 14])
        v = np.asarray(t.lookup(hi, lo))
        np.testing.assert_array_equal(v[0], 0.0)     # default
        np.testing.assert_allclose(v[1], -0.5)       # trained

    def test_large_blacklist(self):
        ids = np.arange(0, 5000, 7, dtype=np.int64)
        bl = tn.BlackList(ids)
        hi, lo = _ids(list(range(100)))
        got = np.asarray(bl.contains(hi, lo))
        want = [(i % 7 == 0) for i in range(100)]
        assert got.tolist() == want
