"""Row-sharded static hash-bucket tables (the reference DEFAULT column
type under PS partitioning: ``categorical_column_with_hash_bucket``
partitioned by ``tf.fixed_size_partitioner`` mod routing,
``python/ops/embedding_ops.py:95-276``).

Load-bearing property: the sharded lookup routes each GLOBAL bucket
slot to shard ``slot % S`` at local row ``slot // S``, initialized
identically to the unsharded table's rows, and owner-side dedup makes
the optimizer see each row once with the summed gradient — so a mesh
run must match the single-device run step for step.
"""

import jax
import numpy as np
import optax

from deeprec_tpu.data.criteo import SyntheticCriteo
from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.models import wdl
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import checkpoint as ckptlib
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _loss_fn(out, batch):
    return losses.bce_with_logits(out, batch["label"])


def _static_groups(batch=64, placement=None, coalesce=True):
    cols = wdl.criteo_columns(embedding_dim=8, capacity=512,
                              static_buckets=True)
    group = EmbeddingGroup(cols, axis_name="data", num_shards=8,
                           coalesce=coalesce, placement=placement)
    single = EmbeddingGroup(cols, coalesce=coalesce)
    model = wdl.WDL(hidden=(32, 16))
    data = SyntheticCriteo(batch_size=batch, vocab=5000, seed=0)
    b0 = data.next_batch()
    states0 = single.create_state()
    _, gl = single.lookup_train(states0, b0, 0)
    rows = {t: lk.rows for t, lk in gl.lks.items()}
    embs = single.combine(gl, rows)
    params = model.init(jax.random.key(0), embs,
                        single.numeric_features(b0))["params"]
    return cols, group, single, model, data, params


def _global_rows(group, tname, stacked_state):
    """Reassemble the global [N, dim] matrix from a stacked static
    shard state (shard s local row r = global slot r*S + s)."""
    vals = np.asarray(stacked_state.values)       # [S, Nloc+1, dim]
    S, nloc1, dim = vals.shape
    body = vals[:, :-1, :]                        # [S, Nloc, dim]
    return body.transpose(1, 0, 2).reshape((nloc1 - 1) * S, dim)


def test_sharded_static_matches_single_device(mesh8):
    cols, group, single, model, data, params = _static_groups()
    assert set(group.placement_plan().values()) == {"sharded"}
    # Per-shard capacity is the ceil-divided global bucket space.
    for t, cfg in group.tables.items():
        total = single.tables[t].capacity
        assert cfg.capacity * 8 >= total

    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)

    ts_m = trainlib.create_train_state(group, params, tx, opt)
    step_m = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                      mesh=mesh8, donate=False)
    ts_s = trainlib.create_train_state(single, params, tx, opt)
    step_s = trainlib.make_train_step(single, afn, _loss_fn, opt, tx,
                                      donate=False)

    lm, ls = [], []
    for _ in range(6):
        b = data.next_batch()
        ts_m, mm = step_m(ts_m, b)
        ts_s, ms = step_s(ts_s, b)
        lm.append(float(mm["loss"]))
        ls.append(float(ms["loss"]))
        assert int(mm["n_overflow"]) == 0  # mod routing: near-uniform
    np.testing.assert_allclose(lm, ls, rtol=2e-5)

    # Trained matrices match row for row on the global slot space.
    for t in group.tables:
        total = single.tables[t].capacity
        gm = _global_rows(group, t, jax.device_get(ts_m.ev[t]))[:total]
        gs = np.asarray(jax.device_get(ts_s.ev[t].values))[:total]
        np.testing.assert_allclose(gm, gs, rtol=2e-5, atol=1e-6)


def test_replicated_static_matches_single_device(mesh8):
    """Replicated placement for static tables: union lookup, invariant
    rows, autodiff-psum'd grads — identical trajectory, zero exchange."""
    cols, group, single, model, data, params = _static_groups(
        placement="auto")  # small static tables -> replicated
    assert set(group.placement_plan().values()) == {"replicated"}
    for t, cfg in group.tables.items():
        assert cfg.capacity == single.tables[t].capacity  # undivided

    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    ts_m = trainlib.create_train_state(group, params, tx, opt)
    step_m = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                      mesh=mesh8, donate=False)
    ts_s = trainlib.create_train_state(single, params, tx, opt)
    step_s = trainlib.make_train_step(single, afn, _loss_fn, opt, tx,
                                      donate=False)
    for _ in range(4):
        b = data.next_batch()
        ts_m, mm = step_m(ts_m, b)
        ts_s, ms = step_s(ts_s, b)
        np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                                   rtol=2e-5)
    for t in group.tables:
        np.testing.assert_allclose(
            np.asarray(ts_m.ev[t].values), np.asarray(ts_s.ev[t].values),
            rtol=2e-5, atol=1e-6)


def test_sharded_static_eval_and_checkpoint_reshard(tmp_path, mesh8):
    """Train sharded on the mesh; mesh eval == single-device eval after
    a cross-shard-count restore (8 -> 1), incl. optimizer slot rows."""
    cols, group, single, model, data, params = _static_groups()
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                    mesh=mesh8, donate=False)
    for _ in range(4):
        ts, _ = step(ts, data.next_batch())

    held = data.next_batch()
    ref = np.asarray(trainlib.make_eval_step(group, afn, mesh=mesh8)(
        ts, held))
    assert np.isfinite(ref).all()

    mgr = ckptlib.CheckpointManager(str(tmp_path), group)
    mgr.save(ts)

    single_afn = wdl.apply_fn(model, single)
    ts_s = trainlib.create_train_state(single, params, tx, opt)
    mgr_s = ckptlib.CheckpointManager(str(tmp_path), single)
    ts_s = mgr_s.restore(ts_s)
    got = np.asarray(trainlib.make_eval_step(single, single_afn)(
        ts_s, held))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-6)

    # And training continues identically after restore on both sides.
    step_s = trainlib.make_train_step(single, single_afn, _loss_fn, opt,
                                      tx, donate=False)
    b = data.next_batch()
    ts2, mm = step(ts, b)
    ts_s2, ms = step_s(ts_s, b)
    np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                               rtol=2e-5)
