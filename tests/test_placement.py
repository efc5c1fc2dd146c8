"""Table-placement planner: replicated vs row-sharded tables.

The RecShard/DreamShard placement role (PAPERS.md): small/hot tables
are REPLICATED across the mesh (union lookup + psum'd row grads — no
all-to-all, no skew overflow), large ones row-sharded as before.

The load-bearing property: a replicated table's union lookup performs
exactly the dedup/insert the single-device path performs on the global
batch, so an all-replicated mesh run must match the single-device run.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deeprec_tpu.data.criteo import SyntheticCriteo
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup)
from deeprec_tpu.models import wdl
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import checkpoint as ckptlib
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _loss_fn(out, batch):
    return losses.bce_with_logits(out, batch["label"])


def _wdl_groups(placement, batch=64, **group_kw):
    cols = wdl.criteo_columns(embedding_dim=8, capacity=1 << 12)
    group = EmbeddingGroup(cols, axis_name="data", num_shards=8,
                           placement=placement, **group_kw)
    single = EmbeddingGroup(cols)
    model = wdl.WDL(hidden=(32, 16))
    data = SyntheticCriteo(batch_size=batch, vocab=500, seed=0)
    b0 = data.next_batch()
    states0 = single.create_state()
    _, gl = single.lookup_train(states0, b0, 0)
    rows = {t: lk.rows for t, lk in gl.lks.items()}
    embs = single.combine(gl, rows)
    params = model.init(jax.random.key(0), embs,
                        single.numeric_features(b0))["params"]
    return cols, group, single, model, data, params


def test_auto_plan_replicates_small_tables():
    cols = [
        EmbeddingColumn("big", dim=16, capacity=1 << 20),
        EmbeddingColumn("small", dim=8, capacity=1 << 10),
    ]
    g = EmbeddingGroup(cols, axis_name="data", num_shards=8,
                       placement="auto", replicate_threshold=1 << 20)
    plan = g.placement_plan()
    assert plan["big"] == "sharded"
    assert plan["small"] == "replicated"
    # Sharded capacity is divided across shards; replicated is not.
    assert g.tables["big"].capacity == (1 << 20) // 8
    assert g.tables["small"].capacity == 1 << 10
    # State layouts: leading shard axis only for the sharded table.
    st = g.create_state()
    assert st["big"].values.shape[0] == 8
    assert st["small"].values.ndim == 2


def test_explicit_dict_and_default():
    cols = [EmbeddingColumn("a", dim=8, capacity=1 << 10),
            EmbeddingColumn("b", dim=8, capacity=1 << 10)]
    g = EmbeddingGroup(cols, axis_name="data", num_shards=8,
                       placement={"a": "replicated"})
    assert g.placement_plan() == {"a": "replicated", "b": "sharded"}
    # No placement -> everything sharded (status quo).
    g2 = EmbeddingGroup(cols, axis_name="data", num_shards=8)
    assert set(g2.placement_plan().values()) == {"sharded"}


def test_replicated_matches_single_device(mesh8):
    """All-replicated mesh training == single-device training: the
    union lookup is the global-batch dedup, psum'd row grads are the
    global-batch row grads."""
    placement = {c: "replicated"
                 for c in [f"C{i+1}" for i in range(26)]
                 + [f"C{i+1}_wide" for i in range(26)]}
    cols, group, single, model, data, params = _wdl_groups(placement)
    assert set(group.placement_plan().values()) == {"replicated"}

    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)

    ts_m = trainlib.create_train_state(group, params, tx, opt)
    step_m = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                      mesh=mesh8, donate=False)
    ts_s = trainlib.create_train_state(single, params, tx, opt)
    step_s = trainlib.make_train_step(single, afn, _loss_fn, opt, tx,
                                      donate=False)

    batches = [data.next_batch() for _ in range(6)]
    lm, ls = [], []
    for b in batches:
        ts_m, mm = step_m(ts_m, b)
        ts_s, ms = step_s(ts_s, b)
        lm.append(float(mm["loss"]))
        ls.append(float(ms["loss"]))
        assert int(mm["n_overflow"]) == 0  # replicated: cannot overflow
    np.testing.assert_allclose(lm, ls, rtol=2e-5)

    # Table state matches the single-device run too (psum'd grads ==
    # global grads). Compare BY KEY: the replicated path inserts in
    # union-sorted order while the single-device occ path inserts in
    # occurrence order, so a hash-colliding id pair may swap SLOTS —
    # same keys, same trained values, different row permutation.
    from deeprec_tpu.embedding import variable as evlib
    for t in group.tables:
        am = evlib.export_arrays(group.tables[t], ts_m.ev[t])
        asg = evlib.export_arrays(single.tables[t], ts_s.ev[t])
        bm = {int(k): v for k, v in zip(am["keys"], am["values"])}
        bs = {int(k): v for k, v in zip(asg["keys"], asg["values"])}
        assert set(bm) == set(bs)
        for k in bm:
            np.testing.assert_allclose(bm[k], bs[k], rtol=2e-5,
                                       atol=1e-6)


def test_mixed_placement_trains_and_evals(mesh8):
    """Half the tables replicated, half sharded, in one model."""
    placement = {f"C{i+1}": "replicated" for i in range(13)}
    cols, group, single, model, data, params = _wdl_groups(placement)
    plan = group.placement_plan()
    assert "replicated" in plan.values() and "sharded" in plan.values()

    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                    mesh=mesh8, donate=False)
    first = None
    for _ in range(10):
        b = data.next_batch()
        ts, m = step(ts, b)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first

    ev_step = trainlib.make_eval_step(group, afn, mesh=mesh8)
    logits = ev_step(ts, data.next_batch())
    assert np.isfinite(np.asarray(logits)).all()


def test_checkpoint_across_placements(tmp_path, mesh8):
    """Save under mixed placement on the mesh; restore into a
    single-device group — logits must match the mesh eval."""
    placement = {f"C{i+1}": "replicated" for i in range(13)}
    cols, group, single, model, data, params = _wdl_groups(placement)
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                    mesh=mesh8, donate=False)
    for _ in range(4):
        ts, _ = step(ts, data.next_batch())

    mgr = ckptlib.CheckpointManager(str(tmp_path), group)
    mgr.save(ts)

    held = data.next_batch()
    ref = np.asarray(trainlib.make_eval_step(group, afn, mesh=mesh8)(
        ts, held))

    single_afn = wdl.apply_fn(model, single)
    ts_s = trainlib.create_train_state(single, params, tx, opt)
    mgr_s = ckptlib.CheckpointManager(str(tmp_path), single)
    ts_s = mgr_s.restore(ts_s)
    got = np.asarray(trainlib.make_eval_step(single, single_afn)(
        ts_s, held))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)
