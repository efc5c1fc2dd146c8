"""Hash table behavior spec.

Ported behaviors (not code) from the reference test surface:
``core/kernels/embedding_variable_ops_test.cc`` and
``python/ops/embedding_variable_ops_test.py`` — insert/find round trips,
duplicate handling, eviction/tombstone reuse, overflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu.embedding import hash_table as ht
from deeprec_tpu.utils import keys as keylib


def _ids(arr):
    hi, lo = keylib.split_ids(np.asarray(arr, np.int64))
    return jnp.asarray(hi), jnp.asarray(lo)


def test_insert_then_find_roundtrip():
    table = ht.create(256)
    ids = np.array([1, 5, 42, 2**40 + 7, -3, 999999999999], np.int64)
    qhi, qlo = _ids(ids)
    table, slots, is_new = ht.find_or_insert(
        table, qhi, qlo, jnp.ones(len(ids), bool))
    assert bool(jnp.all(is_new))
    assert bool(jnp.all(slots < 256))
    assert len(set(np.asarray(slots).tolist())) == len(ids)

    slots2 = ht.find(table, qhi, qlo)
    np.testing.assert_array_equal(np.asarray(slots2), np.asarray(slots))
    assert int(ht.num_live(table)) == len(ids)


def test_find_absent_returns_capacity():
    table = ht.create(128)
    qhi, qlo = _ids([7, 8])
    slots = ht.find(table, qhi, qlo)
    np.testing.assert_array_equal(np.asarray(slots), [128, 128])


def test_duplicate_ids_in_batch_share_slot():
    table = ht.create(128)
    qhi, qlo = _ids([5, 5, 5, 9])
    table, slots, is_new = ht.find_or_insert(
        table, qhi, qlo, jnp.ones(4, bool))
    s = np.asarray(slots)
    assert s[0] == s[1] == s[2]
    assert s[3] != s[0]
    assert int(jnp.sum(is_new[:3])) == 1


def test_lookup_only_does_not_insert():
    table = ht.create(128)
    qhi, qlo = _ids([11, 22])
    table2, slots, is_new = ht.find_or_insert(
        table, qhi, qlo, jnp.zeros(2, bool))
    assert bool(jnp.all(slots == 128))
    assert not bool(jnp.any(is_new))
    assert int(ht.num_live(table2)) == 0


def test_mixed_insert_mask():
    table = ht.create(128)
    qhi, qlo = _ids([1, 2, 3])
    table, slots, _ = ht.find_or_insert(
        table, qhi, qlo, jnp.array([True, False, True]))
    s = np.asarray(slots)
    assert s[0] < 128 and s[2] < 128 and s[1] == 128
    assert int(ht.num_live(table)) == 2


def test_sentinel_padding_ignored():
    table = ht.create(128)
    ids = np.array([42, keylib.EMPTY_ID, keylib.EMPTY_ID], np.int64)
    qhi, qlo = _ids(ids)
    table, slots, is_new = ht.find_or_insert(
        table, qhi, qlo, jnp.ones(3, bool))
    s = np.asarray(slots)
    assert s[0] < 128 and s[1] == 128 and s[2] == 128
    assert int(ht.num_live(table)) == 1


def test_eviction_tombstone_and_reuse():
    table = ht.create(64)
    ids = np.arange(1, 21, dtype=np.int64)
    qhi, qlo = _ids(ids)
    table, slots, _ = ht.find_or_insert(table, qhi, qlo, jnp.ones(20, bool))
    # Evict half the slots.
    mask = np.zeros(64, bool)
    mask[np.asarray(slots)[:10]] = True
    table = ht.remove_slots(table, jnp.asarray(mask))
    assert int(ht.num_live(table)) == 10
    # Evicted ids are gone; survivors still found at the same slot.
    found = np.asarray(ht.find(table, qhi, qlo))
    assert (found[:10] == 64).all()
    np.testing.assert_array_equal(found[10:], np.asarray(slots)[10:])
    # New inserts reuse tombstoned capacity.
    ids2 = np.arange(100, 140, dtype=np.int64)
    q2hi, q2lo = _ids(ids2)
    table, slots2, is_new2 = ht.find_or_insert(
        table, q2hi, q2lo, jnp.ones(40, bool))
    assert bool(jnp.all(slots2 < 64))
    assert int(ht.num_live(table)) == 50


def test_high_load_factor_many_ids():
    cap = 1024
    table = ht.create(cap)
    rng = np.random.default_rng(0)
    ids = rng.choice(2**62, size=768, replace=False).astype(np.int64)
    qhi, qlo = _ids(ids)
    table, slots, is_new = ht.find_or_insert(
        table, qhi, qlo, jnp.ones(len(ids), bool), max_probes=128)
    s = np.asarray(slots)
    assert (s < cap).all(), f"{(s == cap).sum()} overflowed at load 0.75"
    assert len(set(s.tolist())) == len(ids)
    found = np.asarray(ht.find(table, qhi, qlo, max_probes=128))
    np.testing.assert_array_equal(found, s)


def test_incremental_inserts_find_existing():
    table = ht.create(256)
    a = np.array([3, 4, 5], np.int64)
    qhi, qlo = _ids(a)
    table, slots_a, _ = ht.find_or_insert(table, qhi, qlo, jnp.ones(3, bool))
    b = np.array([4, 5, 6], np.int64)
    qhi2, qlo2 = _ids(b)
    table, slots_b, is_new_b = ht.find_or_insert(
        table, qhi2, qlo2, jnp.ones(3, bool))
    np.testing.assert_array_equal(
        np.asarray(slots_b)[:2], np.asarray(slots_a)[1:])
    np.testing.assert_array_equal(np.asarray(is_new_b), [False, False, True])


def test_jit_compatible():
    table = ht.create(128)
    qhi, qlo = _ids([10, 20, 30])

    @jax.jit
    def step(t, hi, lo):
        return ht.find_or_insert(t, hi, lo, jnp.ones(3, bool))

    table, slots, is_new = step(table, qhi, qlo)
    assert bool(jnp.all(slots < 128))
    table, slots2, is_new2 = step(table, qhi, qlo)
    np.testing.assert_array_equal(np.asarray(slots2), np.asarray(slots))
    assert not bool(jnp.any(is_new2))


def test_compact_np_preserves_mapping():
    table = ht.create(64)
    ids = np.arange(1, 31, dtype=np.int64)
    qhi, qlo = _ids(ids)
    table, slots, _ = ht.find_or_insert(table, qhi, qlo, jnp.ones(30, bool))
    mask = np.zeros(64, bool)
    mask[np.asarray(slots)[:15]] = True
    table = ht.remove_slots(table, jnp.asarray(mask))
    new_hi, new_lo, old_to_new = ht.compact_np(
        np.asarray(table.key_hi), np.asarray(table.key_lo))
    table2 = ht.from_arrays(new_hi, new_lo)
    found = np.asarray(ht.find(table2, qhi, qlo))
    old = np.asarray(slots)
    for i in range(30):
        if i < 15:
            assert found[i] == 64
        else:
            assert found[i] == old_to_new[old[i]]
