"""Fused table combine (``combine_tables`` + ``wdl.apply_fn_fused``):
the model consumes whole-table matrices instead of per-column slices.

Load-bearing property: the fused path's static permutation reproduces
the dict path's sorted-concat feature order exactly, so with the SAME
params both paths give identical outputs and identical training
trajectories.
"""

import jax
import numpy as np
import optax

from deeprec_tpu.data.criteo import SyntheticCriteo
from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.models import wdl
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _loss_fn(out, batch):
    return losses.bce_with_logits(out, batch["label"])


def _build(static=False):
    cols = wdl.criteo_columns(embedding_dim=8, capacity=1 << 10,
                              wide_in_deep=True,
                              static_buckets=static)
    group = EmbeddingGroup(cols, coalesce=True)
    model = wdl.WDL(hidden=(32, 16))
    data = SyntheticCriteo(batch_size=64, vocab=500, seed=0)
    b0 = group.pack_batch(data.next_batch())
    st0 = group.create_state()
    _, gl = group.lookup_train(st0, b0, 0)
    embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
    params = model.init(jax.random.key(0), embs,
                        group.numeric_features(b0))["params"]
    return group, model, data, params


def test_fused_matches_dict_path():
    group, model, data, params = _build()
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    afn_f = wdl.apply_fn_fused(model, group)

    ts_a = trainlib.create_train_state(group, params, tx, opt)
    ts_b = trainlib.create_train_state(group, params, tx, opt)
    step_a = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                      donate=False)
    step_b = trainlib.make_train_step(
        group, afn_f, _loss_fn, opt, tx, donate=False,
        combine_fn=group.combine_tables)
    for _ in range(4):
        b = group.pack_batch(data.next_batch())
        ts_a, ma = step_a(ts_a, b)
        ts_b, mb = step_b(ts_b, b)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)
    for t in group.tables:
        np.testing.assert_allclose(
            np.asarray(ts_a.ev[t].values), np.asarray(ts_b.ev[t].values),
            rtol=1e-6, atol=1e-7)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        ts_a.params, ts_b.params)


def test_fused_matches_dict_path_static():
    group, model, data, params = _build(static=True)
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    afn = wdl.apply_fn(model, group)
    afn_f = wdl.apply_fn_fused(model, group)
    ts_a = trainlib.create_train_state(group, params, tx, opt)
    ts_b = trainlib.create_train_state(group, params, tx, opt)
    step_a = trainlib.make_train_step(group, afn, _loss_fn, opt, tx,
                                      donate=False)
    step_b = trainlib.make_train_step(
        group, afn_f, _loss_fn, opt, tx, donate=False,
        combine_fn=group.combine_tables)
    for _ in range(3):
        b = group.pack_batch(data.next_batch())
        ts_a, ma = step_a(ts_a, b)
        ts_b, mb = step_b(ts_b, b)
        np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                                   rtol=1e-6)


def test_combine_tables_rejects_sequence_and_weighted():
    import pytest

    from deeprec_tpu.feature_column.feature_column import (
        EmbeddingColumn, SequenceEmbeddingColumn, SparseIds)

    cols = [SequenceEmbeddingColumn("s", dim=4, capacity=1 << 8)]
    g = EmbeddingGroup(cols)
    ids = np.random.default_rng(0).integers(0, 50, (8, 5)).astype(
        np.int64)
    b = {"s": SparseIds.from_numpy(ids)}
    st, gl = g.lookup_train(g.create_state(), b, 0)
    with pytest.raises(ValueError, match="width-1"):
        g.combine_tables(gl, {t: lk.rows for t, lk in gl.lks.items()})
