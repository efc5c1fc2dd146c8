"""Group-level adaptive embedding: feature-column surface for
``categorical_column_with_adaptive_embedding`` /
``adaptive_embedding_lookup_sparse``
(``python/feature_column/feature_column_v2.py:2058``,
``python/ops/embedding_ops.py:678-795``, ``docs/Adaptive-Embedding.md``).

Cold ids train a shared static hash-bucket table (a dense param under
``params["adaptive_static"]``); ids crossing the hot threshold get
collision-free EV rows seeded from the static row they trained in.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from deeprec_tpu import config as cfglib
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       SparseIds)
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _mk(hot_threshold=3, buckets=8, **col_kw):
    col = EmbeddingColumn(
        name="c0", dim=4, capacity=1 << 8, initializer="constant",
        init_scale=1.0, combiner="sum",
        adaptive_hot_threshold=hot_threshold,
        adaptive_buckets=buckets, **col_kw)
    group = EmbeddingGroup([col])
    params = {"p": jnp.ones((4,), jnp.float32),
              **group.adaptive_static_params()}
    opt = sopt.SparseAdagrad(learning_rate=0.2)
    tx = optax.adagrad(0.2)
    ts = trainlib.create_train_state(group, params, tx, opt)
    afn = lambda p, e, b: jnp.sum(e["c0"] * p["p"], axis=1)  # noqa: E731
    step = trainlib.make_train_step(
        group, afn,
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx)
    return group, ts, step, afn


def _batch(ids, label=1.0):
    ids = np.asarray(ids, np.int64).reshape(len(ids), 1)
    return {"c0": SparseIds.from_numpy(ids),
            "label": jnp.full((ids.shape[0],), label, jnp.float32)}


def test_cold_ids_train_static_then_migrate_hot():
    group, ts, step, afn = _mk(hot_threshold=3)
    (tname,) = group.adaptive_tables
    static0 = np.asarray(ts.params["adaptive_static"][tname]).copy()
    assert static0.shape == (8, 4)
    np.testing.assert_allclose(static0, 1.0)  # constant init

    b = _batch([5, 9])
    # Steps 1-2: both ids cold -> gradients land on the static table.
    ts, _ = step(ts, b)
    ts, _ = step(ts, b)
    static2 = np.asarray(ts.params["adaptive_static"][tname])
    assert not np.allclose(static2, static0)

    # EV rows exist (freq tracking) but are untouched by cold grads.
    from deeprec_tpu.embedding import variable as ev
    cfg = group.tables[tname]
    sid = SparseIds.from_numpy(np.array([5, 9], np.int64))
    rows = np.asarray(jax.jit(
        lambda s, hi, lo: ev.lookup(cfg, s, hi, lo))(
            ts.ev[tname], sid.hi, sid.lo))
    np.testing.assert_allclose(rows, 1.0, rtol=1e-6)

    # Step 3 crosses the threshold: migration seeds the EV row from
    # the trained static row, then the step's update applies to it.
    static_pre = np.asarray(ts.params["adaptive_static"][tname])
    ts, _ = step(ts, b)
    rows3 = np.asarray(jax.jit(
        lambda s, hi, lo: ev.lookup(cfg, s, hi, lo))(
            ts.ev[tname], sid.hi, sid.lo))
    # The migrated rows continue from the static values (within one
    # optimizer step), NOT from the 1.0 fresh-init value.
    from deeprec_tpu.utils import keys as keylib
    buckets = (keylib.hash_mix(sid.hi.ravel(), sid.lo.ravel(),
                               salt=group.salts[tname] + 13)
               % jnp.uint32(cfg.adaptive_buckets)).astype(np.int32)
    seeds = static_pre[np.asarray(buckets)]
    assert np.abs(rows3 - seeds).max() < np.abs(rows3 - 1.0).max()

    # Step 4: ids are hot -> static table stops receiving their grads.
    static4_pre = np.asarray(ts.params["adaptive_static"][tname])
    ts, _ = step(ts, b)
    np.testing.assert_allclose(
        np.asarray(ts.params["adaptive_static"][tname]), static4_pre,
        rtol=1e-6)
    # ...and the EV rows keep training.
    rows4 = np.asarray(jax.jit(
        lambda s, hi, lo: ev.lookup(cfg, s, hi, lo))(
            ts.ev[tname], sid.hi, sid.lo))
    assert not np.allclose(rows4, rows3)


def test_eval_path_matches_train_forward():
    group, ts, step, afn = _mk(hot_threshold=2)
    b_mixed = _batch([5, 9, 42])
    ts, _ = step(ts, _batch([5, 9]))      # 5, 9 at freq 1 (cold)
    ts, _ = step(ts, _batch([5]))         # 5 hot, 9 cold, 42 unseen

    eval_step = trainlib.make_eval_step(group, afn)
    got = np.asarray(eval_step(ts, b_mixed))

    @jax.jit
    def train_fwd(ts_, b):
        st, gl = group.lookup_train(ts_.ev, b, 10)
        _, gl = group.migrate_adaptive(st, gl, ts_.params)
        embs = group.combine(
            gl, {t: lk.rows for t, lk in gl.lks.items()}, ts_.params)
        return afn(ts_.params, embs, b)

    want = np.asarray(train_fwd(ts, b_mixed))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_capacity_saving_composition_with_cbf():
    """adaptive_hot_threshold=1 + CBF admission: cold ids are counted
    in the Bloom side table WITHOUT consuming EV capacity; admission
    (= hotness) allocates the row and migrates the static value."""
    from deeprec_tpu.embedding import variable as ev

    evo = cfglib.EmbeddingVariableOption(
        filter_option=cfglib.CBFFilter(filter_freq=3))
    group, ts, step, afn = _mk(hot_threshold=1, ev_option=evo)
    (tname,) = group.adaptive_tables
    cfg = group.tables[tname]

    b = _batch([11, 23, 35])
    ts, _ = step(ts, b)
    ts, _ = step(ts, b)
    live = ev.export_arrays(cfg, ts.ev[tname])["keys"]
    assert len(live) == 0, "CBF must keep cold ids out of the EV"

    ts, _ = step(ts, b)  # third sighting: admitted == hot
    live = ev.export_arrays(cfg, ts.ev[tname])["keys"]
    assert len(live) == 3


def test_adaptive_rejects_dyn_dim():
    with pytest.raises(ValueError):
        EmbeddingGroup([EmbeddingColumn(
            name="c0", dim=4, capacity=1 << 8,
            adaptive_hot_threshold=2, adaptive_buckets=8,
            dyn_dim_blocks=2, dyn_dim_thresholds=(3,))])


def test_adaptive_bypasses_coalescing():
    cols = [EmbeddingColumn(name="a", dim=4, capacity=1 << 8,
                            adaptive_hot_threshold=2,
                            adaptive_buckets=8),
            EmbeddingColumn(name="b", dim=4, capacity=1 << 8),
            EmbeddingColumn(name="c", dim=4, capacity=1 << 8)]
    g = EmbeddingGroup(cols, coalesce=True)
    # b and c merge; the adaptive table stays its own physical table.
    assert g.physical_table_of(cols[0]) == "a"
    assert g.physical_table_of(cols[1]) == g.physical_table_of(cols[2])
