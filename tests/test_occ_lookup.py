"""Sort-free occurrence lookup (``variable.lookup_train_occ``) must be
semantically identical to the sorted path (``dedup`` + ``lookup_train``)
— same table contents, same per-id values/freqs/versions, same combined
bags — and its unique budget must drop (and count) ids beyond it
without corrupting state.

Spec source: the reference's dedup-before-lookup pipeline
(``core/kernels/unique_ali_op.cc``) feeding ``KvResourceGather``
(``core/kernels/kv_variable_ops.cc:386``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import lookup as lkup
from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.utils import keys as keylib


def _cfg(dim=4, capacity=256, **ev_kw):
    return cfglib.TableConfig(
        name="t", dim=dim, capacity=capacity,
        initializer="truncated_normal", init_scale=0.1,
        ev_option=cfglib.EmbeddingVariableOption(**ev_kw))


def _ids(rng, n, vocab, pad_frac=0.2):
    ids = rng.integers(0, vocab, size=n).astype(np.int64)
    pad = rng.random(n) < pad_frac
    ids[pad] = keylib.EMPTY_ID
    return ids


def _by_key(cfg, state):
    arrs = ev.export_arrays(cfg, state)
    return {int(k): (arrs["values"][i], int(arrs["freqs"][i]),
                     int(arrs["versions"][i]))
            for i, k in enumerate(arrs["keys"])}


def _run_old(cfg, ids_list):
    state = ev.create(cfg)
    outs = []
    for gs, ids in enumerate(ids_list):
        hi, lo = keylib.split_ids(ids)
        dd = lkup.dedup(jnp.asarray(hi), jnp.asarray(lo))
        state, lk = ev.lookup_train(cfg, state, dd.uhi, dd.ulo,
                                    dd.counts, gs)
        outs.append(np.asarray(lk.rows)[np.asarray(dd.inverse)])
    return state, outs


def _run_occ(cfg, ids_list, budget=None):
    state = ev.create(cfg)
    outs, overflows = [], []
    for gs, ids in enumerate(ids_list):
        hi, lo = keylib.split_ids(ids)
        state, occ = ev.lookup_train_occ(
            cfg, state, jnp.asarray(hi), jnp.asarray(lo), gs,
            budget=budget)
        outs.append(np.asarray(occ.lk.rows)[np.asarray(occ.inverse)])
        overflows.append(int(occ.n_overflow))
    return state, outs, overflows


def test_occ_matches_sorted_path_state_and_rows():
    rng = np.random.default_rng(0)
    ids_list = [_ids(rng, 64, vocab=40) for _ in range(4)]
    cfg = _cfg()
    s_old, rows_old = _run_old(cfg, ids_list)
    s_occ, rows_occ, overflows = _run_occ(cfg, ids_list)
    assert overflows == [0] * len(ids_list)
    old = _by_key(cfg, s_old)
    new = _by_key(cfg, s_occ)
    assert set(old) == set(new)
    for k in old:
        np.testing.assert_allclose(old[k][0], new[k][0], rtol=1e-6)
        assert old[k][1:] == new[k][1:]
    for a, b in zip(rows_old, rows_occ):
        real = ~np.isnan(a).any(axis=1)
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_occ_counter_filter_matches():
    rng = np.random.default_rng(1)
    ids_list = [_ids(rng, 48, vocab=16, pad_frac=0.1) for _ in range(5)]
    cfg = _cfg(filter_option=cfglib.CounterFilter(filter_freq=3))
    s_old, rows_old = _run_old(cfg, ids_list)
    s_occ, rows_occ, _ = _run_occ(cfg, ids_list)
    old, new = _by_key(cfg, s_old), _by_key(cfg, s_occ)
    assert set(old) == set(new)
    for k in old:
        np.testing.assert_allclose(old[k][0], new[k][0], rtol=1e-6)
        assert old[k][1:] == new[k][1:]
    for a, b in zip(rows_old, rows_occ):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_occ_duplicate_is_new_exactly_once():
    cfg = _cfg()
    ids = np.asarray([7, 7, 7, 9, 9, keylib.EMPTY_ID], np.int64)
    hi, lo = keylib.split_ids(ids)
    state, occ = ev.lookup_train_occ(
        cfg, ev.create(cfg), jnp.asarray(hi), jnp.asarray(lo), 0)
    is_new = np.asarray(occ.lk.is_new)
    uhi = np.asarray(occ.lk.qhi)
    assert int(is_new.sum()) == 2  # one per distinct id
    # All occurrences of one id map to the same unique row.
    inv = np.asarray(occ.inverse)
    assert inv[0] == inv[1] == inv[2]
    assert inv[3] == inv[4]
    assert inv[5] == occ.lk.rows.shape[0] - 1  # padding -> overflow row


def test_occ_budget_drops_and_counts():
    cfg = _cfg(capacity=512)
    rng = np.random.default_rng(2)
    ids = rng.permutation(200)[:100].astype(np.int64)  # 100 distinct
    hi, lo = keylib.split_ids(ids)
    state, occ = ev.lookup_train_occ(
        cfg, ev.create(cfg), jnp.asarray(hi), jnp.asarray(lo), 0,
        budget=64)
    assert int(occ.n_overflow) == 100 - 64
    assert occ.lk.rows.shape[0] == 65
    inv = np.asarray(occ.inverse)
    assert (inv == 64).sum() == 36  # dropped ids share the overflow row

    # Dropped ids were still inserted (freqs count them) but train later:
    # a second step inside the budget initializes and trains them.
    state2, occ2 = ev.lookup_train_occ(
        cfg, state, jnp.asarray(hi), jnp.asarray(lo), 1, budget=128)
    assert int(occ2.n_overflow) == 0
    # Every id now admitted with finite, initialized rows.
    rows = np.asarray(occ2.lk.rows)[np.asarray(occ2.inverse)]
    assert np.isfinite(rows).all()
    by = _by_key(cfg, state2)
    assert len(by) == 100
    for k, (v, f, vers) in by.items():
        assert f == 2          # both steps counted, reset exactly once
        assert vers == 1


def test_occ_first_trained_touch_reinitializes_after_evict():
    """Tombstone reuse: evicted slot's stale rows must NOT leak into a
    key that reuses the slot (version<0 init trigger)."""
    cfg = _cfg(capacity=64,
               evict_option=cfglib.GlobalStepEvict(steps_to_live=1))
    ids = np.asarray([11, 12, 13], np.int64)
    hi, lo = keylib.split_ids(ids)
    state, occ = ev.lookup_train_occ(
        cfg, ev.create(cfg), jnp.asarray(hi), jnp.asarray(lo), 0)
    # Overwrite values with a marker, then evict everything.
    state = state.replace(values=jnp.full_like(state.values, 123.0))
    state = ev.shrink(cfg, state, global_step=10)
    assert int(ev.num_live(state)) == 0
    # New ids reuse the tombstoned slots; their rows must be fresh
    # initializer draws, not 123.0.
    ids2 = np.asarray([21, 22, 23], np.int64)
    hi2, lo2 = keylib.split_ids(ids2)
    state, occ2 = ev.lookup_train_occ(
        cfg, state, jnp.asarray(hi2), jnp.asarray(lo2), 11)
    rows = np.asarray(occ2.lk.rows[:3])
    assert (np.abs(rows) < 1.0).all()


def test_occ_rejects_cbf():
    cfg = _cfg(filter_option=cfglib.CBFFilter(
        filter_freq=2, num_counters=128, num_hash_func=2))
    hi = jnp.zeros((4,), jnp.int32)
    lo = jnp.arange(4, dtype=jnp.int32)
    with pytest.raises(ValueError):
        ev.lookup_train_occ(cfg, ev.create(cfg), hi, lo, 0)


def test_lightheader_mode_matches_tracked_values():
    """record_freq/record_version=False (the reference's EV default —
    LightHeader layout): per-step metadata scatters are elided, values
    train identically, freqs/versions stay untouched."""
    rng = np.random.default_rng(3)
    ids_list = [_ids(rng, 64, vocab=40) for _ in range(4)]
    light = _cfg()
    light = light.__class__(**{
        **{f.name: getattr(light, f.name)
           for f in __import__("dataclasses").fields(light)},
        "ev_option": cfglib.EmbeddingVariableOption(
            record_freq=False, record_version=False)})
    tracked = _cfg()

    s_l, rows_l, _ = _run_occ(light, ids_list)
    s_t, rows_t, _ = _run_occ(tracked, ids_list)
    # Values per key identical; metadata untouched in light mode.
    kl = {int(k): v for k, v in zip(
        np.asarray(ev.export_arrays(light, s_l)["keys"]),
        np.asarray(ev.export_arrays(light, s_l)["values"]))}
    kt = {int(k): v for k, v in zip(
        np.asarray(ev.export_arrays(tracked, s_t)["keys"]),
        np.asarray(ev.export_arrays(tracked, s_t)["values"]))}
    assert set(kl) == set(kt)
    for k in kl:
        np.testing.assert_allclose(kl[k], kt[k], rtol=1e-6)
    assert int(np.asarray(s_l.freqs).sum()) == 0
    assert (np.asarray(s_l.versions) < 0).all()
    for a, b in zip(rows_l, rows_t):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_lightheader_forced_on_when_subsystem_needs_it():
    evo = cfglib.EmbeddingVariableOption(
        record_freq=False, record_version=False,
        filter_option=cfglib.CounterFilter(filter_freq=2),
        evict_option=cfglib.GlobalStepEvict(steps_to_live=5))
    cfg = _cfg()
    cfg = cfg.__class__(**{
        **{f.name: getattr(cfg, f.name)
           for f in __import__("dataclasses").fields(cfg)},
        "ev_option": evo})
    assert ev._tracking(cfg) == (True, True)


def test_beyond_budget_insert_reads_default_until_trained():
    """ADVICE r3: with version tracking + a unique budget, an id
    inserted while beyond the budget holds an uninitialized values row
    until its first in-budget trained touch; inference ``lookup()``
    must serve the default bank in that window, not the zero row."""
    cfg = cfglib.TableConfig(
        name="t", dim=4, capacity=64, initializer="constant",
        init_scale=0.5,
        ev_option=cfglib.EmbeddingVariableOption(record_version=True))
    state = ev.create(cfg)
    ids = np.asarray([11, 22, 33], np.int64)
    hi, lo = keylib.split_ids(ids)
    # budget=2: id 33 is inserted but beyond the unique budget.
    state, occ = ev.lookup_train_occ(
        cfg, state, jnp.asarray(hi), jnp.asarray(lo), 0, budget=2)
    assert int(occ.n_overflow) == 1
    h3, l3 = keylib.split_ids(np.asarray([33], np.int64))
    got = np.asarray(ev.lookup(cfg, state, jnp.asarray(h3),
                               jnp.asarray(l3)))[0]
    bank = np.asarray(state.default_bank)[0]
    np.testing.assert_allclose(got, bank)
    assert np.abs(bank).sum() > 0  # the bank is NOT the zero row here
    # After an in-budget trained touch the row serves its real value.
    state, occ2 = ev.lookup_train_occ(
        cfg, state, jnp.asarray(h3), jnp.asarray(l3), 1, budget=2)
    got2 = np.asarray(ev.lookup(cfg, state, jnp.asarray(h3),
                                jnp.asarray(l3)))[0]
    np.testing.assert_allclose(got2, np.full(4, 0.5), rtol=1e-6)
