"""EmbeddingVariable behavior spec.

Behavior (not code) mirrored from the reference test surface
``python/ops/embedding_variable_ops_test.py`` (~70 tests: filters,
eviction, optimizers x EV, save/restore) — the contract a DeepRec user
expects from EV semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import hash_table as ht
from deeprec_tpu.embedding import lookup as lkup
from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.utils import keys as keylib


def _q(ids):
    hi, lo = keylib.split_ids(np.asarray(ids, np.int64))
    return jnp.asarray(hi), jnp.asarray(lo)


def _cfg(**kw):
    kw.setdefault("name", "t")
    kw.setdefault("dim", 8)
    kw.setdefault("capacity", 256)
    return cfglib.TableConfig(**kw)


def test_lookup_train_inserts_and_counts():
    cfg = _cfg(initializer="constant", init_scale=2.0)
    state = ev.create(cfg)
    qhi, qlo = _q([1, 2, 3])
    counts = jnp.array([3, 1, 5], jnp.int32)
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, counts, 10)
    assert bool(jnp.all(lk.admitted))
    assert bool(jnp.all(lk.is_new))
    np.testing.assert_allclose(np.asarray(lk.rows), 2.0)
    assert int(ev.num_live(state)) == 3
    s = np.asarray(lk.slots)
    np.testing.assert_array_equal(np.asarray(state.freqs)[s], [3, 1, 5])
    np.testing.assert_array_equal(np.asarray(state.versions)[s], [10, 10, 10])
    # Second touch accumulates freqs, updates versions.
    state, lk2 = ev.lookup_train(cfg, state, qhi, qlo, counts, 11)
    assert not bool(jnp.any(lk2.is_new))
    np.testing.assert_array_equal(np.asarray(state.freqs)[s], [6, 2, 10])
    np.testing.assert_array_equal(np.asarray(lk2.prev_versions), [10, 10, 10])


def test_counter_filter_gates_value_and_update():
    cfg = _cfg(
        initializer="constant", init_scale=1.5,
        ev_option=cfglib.EmbeddingVariableOption(
            filter_option=cfglib.CounterFilter(filter_freq=3)))
    state = ev.create(cfg)
    opt = sopt.SparseAdagrad(learning_rate=0.5)
    slot_state = opt.init(cfg)
    qhi, qlo = _q([42])
    ones = jnp.ones((1,), jnp.int32)

    # Occurrence 1 and 2: not admitted — default (constant bank) value,
    # update dropped.
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 0)
    assert not bool(lk.admitted[0])
    np.testing.assert_allclose(np.asarray(lk.rows), 1.5)  # default bank
    g = jnp.ones((1, cfg.dim))
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 0)
    state = state.replace(values=values)
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 1)
    assert not bool(lk.admitted[0])

    # Occurrence 3: freq reaches threshold — admitted, value is the
    # untouched initializer row.
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 2)
    assert bool(lk.admitted[0])
    np.testing.assert_allclose(np.asarray(lk.rows), 1.5)
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 2)
    state = state.replace(values=values)
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 3)
    assert float(lk.rows[0, 0]) < 1.5  # update applied now


def test_bloom_filter_delays_insertion():
    cfg = _cfg(ev_option=cfglib.EmbeddingVariableOption(
        filter_option=cfglib.CBFFilter(filter_freq=5, num_counters=4096)))
    state = ev.create(cfg)
    qhi, qlo = _q([123])
    two = jnp.full((1,), 2, jnp.int32)
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, two, 0)
    assert int(ev.num_live(state)) == 0 and not bool(lk.admitted[0])
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, two, 1)
    assert int(ev.num_live(state)) == 0
    # count reaches 6 >= 5: inserted
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, two, 2)
    assert int(ev.num_live(state)) == 1 and bool(lk.admitted[0])


def test_global_step_eviction():
    cfg = _cfg(ev_option=cfglib.EmbeddingVariableOption(
        evict_option=cfglib.GlobalStepEvict(steps_to_live=5)))
    state = ev.create(cfg)
    qhi, qlo = _q([1, 2])
    ones = jnp.ones((2,), jnp.int32)
    state, _ = ev.lookup_train(cfg, state, qhi, qlo, ones, 0)
    q2hi, q2lo = _q([2])
    state, _ = ev.lookup_train(cfg, state, q2hi, q2lo,
                               jnp.ones((1,), jnp.int32), 4)
    state = ev.shrink(cfg, state, 6)  # id 1 last touched at 0: 6-0 > 5
    assert int(ev.num_live(state)) == 1
    rows = ev.lookup(cfg, state, qhi, qlo)
    assert not bool(jnp.any(ht.find(state.table, qhi, qlo) ==
                            np.array([256, 256])).item()) or True
    slots = np.asarray(ht.find(state.table, qhi, qlo))
    assert slots[0] == cfg.capacity and slots[1] < cfg.capacity


def test_l2_eviction():
    cfg = _cfg(initializer="constant", init_scale=0.01,
               ev_option=cfglib.EmbeddingVariableOption(
                   evict_option=cfglib.L2WeightEvict(
                       l2_weight_threshold=0.1)))
    state = ev.create(cfg)
    qhi, qlo = _q([7, 8])
    state, lk = ev.lookup_train(cfg, state, qhi, qlo,
                                jnp.ones((2,), jnp.int32), 0)
    # Bump row for id 8 to a large norm.
    big = state.values.at[lk.slots[1]].set(jnp.ones((cfg.dim,)))
    state = state.replace(values=big)
    state = ev.shrink(cfg, state, 1)
    slots = np.asarray(ht.find(state.table, qhi, qlo))
    assert slots[0] == cfg.capacity  # tiny-norm row evicted
    assert slots[1] < cfg.capacity


def test_default_value_dim_bank():
    cfg = _cfg(initializer="zeros",
               ev_option=cfglib.EmbeddingVariableOption(default_value_dim=4))
    state = ev.create(cfg)
    # Distinct bank rows so selection is observable.
    bank = jnp.arange(4, dtype=jnp.float32)[:, None] * jnp.ones((4, cfg.dim))
    state = state.replace(default_bank=bank)
    ids = np.array([0, 1, 2, 3, 5, 6], np.int64)
    qhi, qlo = _q(ids)
    rows = ev.lookup(cfg, state, qhi, qlo)  # nothing inserted: all default
    np.testing.assert_allclose(np.asarray(rows)[:, 0],
                               (ids % 4).astype(np.float32))


def test_export_import_roundtrip():
    cfg = _cfg(initializer="truncated_normal")
    state = ev.create(cfg)
    ids = np.arange(100, 150, dtype=np.int64)
    qhi, qlo = _q(ids)
    counts = jnp.arange(1, 51, dtype=jnp.int32)
    state, _ = ev.lookup_train(cfg, state, qhi, qlo, counts, 3)
    snap = ev.export_arrays(cfg, state)
    assert set(np.asarray(snap["keys"]).tolist()) == set(ids.tolist())

    state2 = ev.import_arrays(cfg, ev.create(cfg), snap)
    rows1 = np.asarray(ev.lookup(cfg, state, qhi, qlo))
    rows2 = np.asarray(ev.lookup(cfg, state2, qhi, qlo))
    np.testing.assert_allclose(rows1, rows2)
    # freq metadata survives
    slots = np.asarray(ht.find(state2.table, qhi, qlo))
    np.testing.assert_array_equal(np.asarray(state2.freqs)[slots],
                                  np.arange(1, 51))


def test_import_resharding_partitions_are_disjoint_and_complete():
    cfg = _cfg()
    state = ev.create(cfg)
    ids = np.arange(1000, 1200, dtype=np.int64)
    qhi, qlo = _q(ids)
    state, _ = ev.lookup_train(
        cfg, state, qhi, qlo, jnp.ones((200,), jnp.int32), 0)
    snap = ev.export_arrays(cfg, state)
    parts = [ev.import_arrays(cfg, ev.create(cfg), snap,
                              partition_id=p, partition_num=4)
             for p in range(4)]
    all_keys = []
    for p in parts:
        all_keys.extend(ev.export_arrays(cfg, p)["keys"].tolist())
    assert sorted(all_keys) == sorted(ids.tolist())
    assert len(set(all_keys)) == len(all_keys)


def test_adagrad_matches_manual():
    cfg = _cfg(dim=4, initializer="constant", init_scale=1.0)
    state = ev.create(cfg)
    opt = sopt.SparseAdagrad(learning_rate=0.1,
                             initial_accumulator_value=0.1)
    slot_state = opt.init(cfg)
    qhi, qlo = _q([9])
    g = jnp.full((1, 4), 0.5)
    w, acc = 1.0, 0.1
    for step in range(3):
        state, lk = ev.lookup_train(cfg, state, qhi, qlo,
                                    jnp.ones((1,), jnp.int32), step)
        np.testing.assert_allclose(float(lk.rows[0, 0]), w, rtol=1e-5)
        slot_state, values = opt.apply(cfg, slot_state, state.values, lk,
                                       g, step)
        state = state.replace(values=values)
        acc = acc + 0.25
        w = w - 0.1 * 0.5 / np.sqrt(acc)


def test_adam_bias_correction_first_step():
    cfg = _cfg(dim=4, initializer="zeros")
    state = ev.create(cfg)
    opt = sopt.SparseAdam(learning_rate=0.1)
    slot_state = opt.init(cfg)
    qhi, qlo = _q([3])
    state, lk = ev.lookup_train(cfg, state, qhi, qlo,
                                jnp.ones((1,), jnp.int32), 0)
    g = jnp.full((1, 4), 0.3)
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 0)
    # First Adam step moves by ~lr regardless of gradient scale.
    got = float(values[int(lk.slots[0]), 0])
    m = 0.1 * 0.3
    v = 0.001 * 0.09
    alpha = 0.1 * np.sqrt(1 - 0.999) / (1 - 0.9)
    expect = -alpha * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_ftrl_l1_zeroes_small_weights():
    cfg = _cfg(dim=4, initializer="zeros")
    state = ev.create(cfg)
    opt = sopt.SparseFtrl(learning_rate=0.1, l1=100.0)
    slot_state = opt.init(cfg)
    qhi, qlo = _q([3])
    state, lk = ev.lookup_train(cfg, state, qhi, qlo,
                                jnp.ones((1,), jnp.int32), 0)
    g = jnp.full((1, 4), 0.3)
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 0)
    np.testing.assert_allclose(np.asarray(values[int(lk.slots[0])]), 0.0)


def test_adagrad_decay_decays_accumulator():
    cfg = _cfg(dim=2, initializer="zeros")
    state = ev.create(cfg)
    opt = sopt.SparseAdagradDecay(learning_rate=0.1, decay_step=10,
                                  decay_rate=0.5,
                                  initial_accumulator_value=1.0)
    slot_state = opt.init(cfg)
    qhi, qlo = _q([3])
    ones = jnp.ones((1,), jnp.int32)
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 0)
    g = jnp.full((1, 2), 1.0)
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 0)
    state = state.replace(values=values)
    acc0 = float(slot_state["accum"][int(lk.slots[0]), 0])  # 1 + 1 = 2
    np.testing.assert_allclose(acc0, 2.0)
    # Next touch 25 steps later: 2 decay periods → acc * 0.25 before add.
    state, lk = ev.lookup_train(cfg, state, qhi, qlo, ones, 25)
    slot_state, values = opt.apply(cfg, slot_state, state.values, lk, g, 25)
    acc1 = float(slot_state["accum"][int(lk.slots[0]), 0])
    np.testing.assert_allclose(acc1, 2.0 * 0.25 + 1.0)


def test_dedup_and_combiners():
    hi, lo = _q([5, 5, 7, keylib.EMPTY_ID, 7, 5])
    dd = lkup.dedup(hi, lo)
    real = np.asarray(dd.counts)
    assert sorted(real[real > 0].tolist()) == [2, 3]
    ids = keylib.join_ids(np.asarray(dd.uhi), np.asarray(dd.ulo))
    mapped = ids[np.asarray(dd.inverse)]
    orig = np.array([5, 5, 7, keylib.EMPTY_ID, 7, 5])
    np.testing.assert_array_equal(mapped, orig)

    rows = jnp.array([[1.0], [2.0], [4.0]])
    inverse = jnp.array([[0, 1], [2, 2]])
    mask = jnp.array([[True, True], [True, False]])
    np.testing.assert_allclose(
        np.asarray(lkup.combine_bags(rows, inverse, mask, "sum")),
        [[3.0], [4.0]])
    np.testing.assert_allclose(
        np.asarray(lkup.combine_bags(rows, inverse, mask, "mean")),
        [[1.5], [4.0]])
    np.testing.assert_allclose(
        np.asarray(lkup.combine_bags(rows, inverse, mask, "sqrtn")),
        [[3.0 / np.sqrt(2)], [4.0]])


def test_end_to_end_regression_learns():
    """Tiny sparse regression: loss decreases through the full
    lookup -> grad -> sparse-apply cycle under jit."""
    cfg = _cfg(dim=4, capacity=64, initializer="zeros", combiner="sum")
    state = ev.create(cfg)
    opt = sopt.SparseAdagrad(learning_rate=0.5)
    slot_state = opt.init(cfg)

    ids = np.array([[1, 2], [3, keylib.EMPTY_ID]], np.int64)
    hi, lo = keylib.split_ids(ids.reshape(-1))
    ids_hi = jnp.asarray(hi).reshape(2, 2)
    ids_lo = jnp.asarray(lo).reshape(2, 2)
    target = jnp.array([1.0, -1.0])

    @jax.jit
    def step(state, slot_state, gs):
        state, bl = lkup.bag_lookup_train(cfg, state, ids_hi, ids_lo, gs)

        def loss_fn(rows):
            emb = lkup.combine_bags(rows, bl.inverse, bl.mask, cfg.combiner)
            pred = jnp.sum(emb, axis=1)
            return jnp.mean((pred - target) ** 2)

        loss, grad_rows = jax.value_and_grad(loss_fn)(bl.lk.rows)
        slot_state2, values = opt.apply(
            cfg, slot_state, state.values, bl.lk, grad_rows, gs)
        return state.replace(values=values), slot_state2, loss

    losses = []
    for gs in range(30):
        state, slot_state, loss = step(state, slot_state, gs)
        losses.append(float(loss))
    assert losses[-1] < 0.05 * losses[0]


def test_initializer_deterministic_per_key_across_restarts():
    """Random initializers are stateless functions of (key, salt):
    inserting the same key into two fresh tables — or before/after a
    checkpoint round-trip — yields the identical row
    (``EVInitializer`` behavior, ``embedding_variable_ops_test.py:1455``;
    restore correctness depends on it for never-admitted keys)."""
    cfg = _cfg(initializer="truncated_normal", init_scale=0.5)
    qhi, qlo = _q([7, 11, 13])
    counts = jnp.ones(3, jnp.int32)

    s1, lk1 = ev.lookup_train(cfg, ev.create(cfg, salt=3), qhi, qlo,
                              counts, 0, salt=3)
    s2, lk2 = ev.lookup_train(cfg, ev.create(cfg, salt=3), qhi, qlo,
                              counts, 0, salt=3)
    np.testing.assert_array_equal(np.asarray(lk1.rows),
                                  np.asarray(lk2.rows))
    assert np.asarray(lk1.rows).std() > 0  # actually random

    # A different salt (another table) decorrelates the rows.
    _, lk3 = ev.lookup_train(cfg, ev.create(cfg, salt=4), qhi, qlo,
                             counts, 0, salt=4)
    assert not np.allclose(np.asarray(lk1.rows), np.asarray(lk3.rows))


def test_shrink_without_policy_is_noop():
    """``testEmbeddingVariableForShrinkNone``: shrink on a table with
    no eviction policy must keep every row."""
    cfg = _cfg()  # no evict_option
    qhi, qlo = _q([1, 2, 3, 4])
    st, _ = ev.lookup_train(cfg, ev.create(cfg), qhi, qlo,
                            jnp.ones(4, jnp.int32), 0)
    st2 = ev.shrink(cfg, st, global_step=10_000)
    a = ev.export_arrays(cfg, st)
    b = ev.export_arrays(cfg, st2)
    np.testing.assert_array_equal(np.sort(a["keys"]), np.sort(b["keys"]))
    assert len(a["keys"]) == 4
