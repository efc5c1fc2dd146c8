"""Weighted categorical columns (``weighted_categorical_column`` +
weighted ``embedding_lookup_sparse`` analog): per-occurrence weights
scale rows before the bag combine; mean divides by sum(w), sqrtn by
sqrt(sum(w^2)).

Reference behavior:
``python/ops/embedding_variable_ops_test.py:608``
(testEmbeddingVariableForWeightedSumFromFeatureColumn) and TF's
``embedding_lookup_sparse(sp_weights=...)`` semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeprec_tpu.embedding import lookup as lkup
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       SparseIds)
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def test_combine_bags_weighted_semantics():
    rows = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    inverse = jnp.asarray([[0, 1, 2], [3, 3, 0]])
    mask = jnp.asarray([[True, True, False], [True, True, False]])
    w = jnp.asarray([[2.0, 0.5, 9.0], [1.0, 3.0, 9.0]])

    r = np.asarray(rows)
    exp_sum = np.stack([2.0 * r[0] + 0.5 * r[1],
                        1.0 * r[3] + 3.0 * r[3]])
    got_sum = np.asarray(lkup.combine_bags(rows, inverse, mask, "sum",
                                           weights=w))
    np.testing.assert_allclose(got_sum, exp_sum, rtol=1e-6)

    got_mean = np.asarray(lkup.combine_bags(rows, inverse, mask, "mean",
                                            weights=w))
    np.testing.assert_allclose(got_mean,
                               exp_sum / np.array([[2.5], [4.0]]),
                               rtol=1e-6)

    got_sq = np.asarray(lkup.combine_bags(rows, inverse, mask, "sqrtn",
                                          weights=w))
    denom = np.sqrt(np.array([[4.0 + 0.25], [1.0 + 9.0]]))
    np.testing.assert_allclose(got_sq, exp_sum / denom, rtol=1e-6)


def test_combine_bags_unweighted_unchanged():
    """weights=None must reproduce the original mean/sqrtn exactly."""
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    inverse = jnp.asarray(rng.integers(0, 8, size=(5, 3)))
    mask = jnp.asarray(rng.random((5, 3)) < 0.7)
    for comb in ("sum", "mean", "sqrtn"):
        got = np.asarray(lkup.combine_bags(rows, inverse, mask, comb))
        per = np.asarray(rows)[np.asarray(inverse)] * \
            np.asarray(mask)[..., None]
        s = per.sum(1)
        cnt = np.asarray(mask).sum(1).astype(np.float32)
        if comb == "mean":
            s = s / np.maximum(cnt, 1.0)[:, None]
        elif comb == "sqrtn":
            s = s / np.sqrt(np.maximum(cnt, 1.0))[:, None]
        np.testing.assert_allclose(got, s, rtol=1e-5, atol=1e-6)


def _group(combiner, weight_name="w0"):
    return EmbeddingGroup([EmbeddingColumn(
        name="c0", dim=4, capacity=1 << 8, initializer="constant",
        init_scale=2.0, combiner=combiner, weight_name=weight_name)])


def test_weighted_column_through_group_lookup():
    """Constant-initialized rows make the weighted denominators exactly
    checkable through the full group lookup_train -> combine path."""
    ids = np.array([[3, 4], [5, 6]], np.int64)
    w = np.array([[2.0, 6.0], [0.5, 0.25]], np.float32)
    batch = {"c0": SparseIds.from_numpy(ids), "w0": jnp.asarray(w)}

    for comb, expect in (
            ("sum", 2.0 * w.sum(1)),               # rows all == 2.0
            ("mean", np.full(2, 2.0)),             # sum(w*2)/sum(w)
            ("sqrtn", 2.0 * w.sum(1) / np.sqrt((w * w).sum(1)))):
        group = _group(comb)

        @jax.jit
        def go(states, b):
            st, gl = group.lookup_train(states, b, 0)
            return group.combine(
                gl, {t: lk.rows for t, lk in gl.lks.items()})

        out = np.asarray(go(group.create_state(), batch)["c0"])
        np.testing.assert_allclose(out, np.repeat(expect[:, None], 4, 1),
                                    rtol=1e-6)


def test_weighted_column_trains_and_weights_scale_grads():
    """Gradients onto embedding rows must scale with the weights: a
    row seen only with weight 0 must not move."""
    group = _group("sum")
    ids = np.array([[1, 2]], np.int64)
    w = np.array([[1.0, 0.0]], np.float32)
    batch = {"c0": SparseIds.from_numpy(ids), "w0": jnp.asarray(w),
             "label": jnp.asarray([1.0])}

    opt = sopt.SparseAdagrad(learning_rate=0.5)
    tx = optax.adagrad(0.5)
    params = {"p": jnp.ones((4,), jnp.float32)}
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(
        group, lambda p, e, b: jnp.sum(e["c0"] * p["p"], axis=1),
        lambda out, b: losses.bce_with_logits(out, b["label"]), opt, tx)
    ts2, _ = step(ts, batch)

    from deeprec_tpu.embedding import variable as ev
    cfg = group.tables[group.physical_table_of(group.embedding[0])]
    tname = cfg.name
    s_after = ts2.ev[tname]
    sid = SparseIds.from_numpy(ids.reshape(-1))
    rows_after = np.asarray(jax.jit(
        lambda s, hi, lo: ev.lookup(cfg, s, hi, lo))(
            s_after, sid.hi, sid.lo))
    # id 1 (weight 1) moved away from the 2.0 init; id 2 (weight 0)
    # did not.
    assert not np.allclose(rows_after[0], 2.0)
    np.testing.assert_allclose(rows_after[1], 2.0, rtol=1e-6)


def test_weighted_column_eval_path_matches_train_combine():
    group = _group("mean")
    ids = np.array([[7, 9], [7, 11]], np.int64)
    w = np.array([[3.0, 1.0], [0.5, 0.5]], np.float32)
    batch = {"c0": SparseIds.from_numpy(ids), "w0": jnp.asarray(w),
             "label": jnp.asarray([1.0, 0.0])}

    opt = sopt.SparseAdagrad(learning_rate=0.1)
    tx = optax.adagrad(0.1)
    params = {"p": jnp.ones((4,), jnp.float32)}
    ts = trainlib.create_train_state(group, params, tx, opt)
    apply_fn = lambda p, e, b: jnp.sum(e["c0"] * p["p"], axis=1)  # noqa: E731
    step = trainlib.make_train_step(
        group, apply_fn,
        lambda out, b: losses.bce_with_logits(out, b["label"]), opt, tx)
    ts, _ = step(ts, batch)

    eval_step = trainlib.make_eval_step(group, apply_fn)
    got = np.asarray(eval_step(ts, batch))

    @jax.jit
    def via_combine(ts_, b):
        _, gl = group.lookup_train(ts_.ev, b, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        return apply_fn(ts_.params, embs, b)

    np.testing.assert_allclose(got, np.asarray(via_combine(ts, batch)),
                               rtol=1e-5)
