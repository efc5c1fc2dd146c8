"""Training features: micro-batch gradient accumulation equivalence and
BF16 mixed-precision mode (reference: ``docs/Auto-Micro-Batch.md``,
``docs/BFloat16.md``)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprec_tpu.data.criteo import SyntheticCriteo
from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.models import wdl
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _setup(dtype=jnp.float32):
    cols = wdl.criteo_columns(embedding_dim=8, capacity=1 << 10)
    group = EmbeddingGroup(cols)
    model = wdl.WDL(hidden=(16, 8), dtype=dtype)
    data = SyntheticCriteo(batch_size=32, vocab=200, seed=0)
    b0 = data.next_batch()
    st0 = group.create_state()
    _, gl = group.lookup_train(st0, b0, 0)
    embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
    params = model.init(jax.random.key(0), embs,
                        group.numeric_features(b0))["params"]
    afn = wdl.apply_fn(model, group)
    lfn = lambda o, b: losses.bce_with_logits(o, b["label"])
    return group, params, afn, lfn, data


def test_micro_batch_matches_full_batch():
    group, params, afn, lfn, data = _setup()
    opt = sopt.SparseAdagrad(learning_rate=0.1)
    tx = optax.adagrad(0.05)

    ts1 = trainlib.create_train_state(group, params, tx, opt)
    ts2 = trainlib.create_train_state(group, params, tx, opt)
    step1 = trainlib.make_train_step(group, afn, lfn, opt, tx,
                                     donate=False)
    step4 = trainlib.make_train_step(group, afn, lfn, opt, tx,
                                     donate=False, micro_batch_num=4)
    for i in range(3):
        b = data.next_batch()
        ts1, m1 = step1(ts1, b)
        ts2, m2 = step4(ts2, b)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
    # Identical final dense params and table values.
    for a, b in zip(jax.tree.leaves(ts1.params),
                    jax.tree.leaves(ts2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ts1.ev["C1"].values), np.asarray(ts2.ev["C1"].values),
        rtol=1e-4, atol=1e-6)


def test_bf16_mode_trains_without_nan():
    group, params, afn, lfn, data = _setup(dtype=jnp.bfloat16)
    # Params stay fp32 (keep-weights), activations bf16.
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(group, afn, lfn, opt, tx)
    losses_seen = []
    for i in range(20):
        ts, m = step(ts, data.next_batch())
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert np.mean(losses_seen[-5:]) < np.mean(losses_seen[:5])
