"""Sharded adaptive embedding: the EV half row-shards via the standard
id exchange with hotness/migration computed on the owner shard; the
static bucket half stays a replicated dense param whose cold-id
gradients arrive psum'd through shard_map autodiff.

Reference analog: ``adaptive_embedding_lookup_sparse`` over partitioned
EVs (``python/ops/embedding_ops.py:678-795``,
``feature_column_v2.py:2058``).

Load-bearing property: owner-side counts equal the global-batch counts
(the exchange sums per-device counts), so hot-threshold crossings,
migration steps and both halves' updates happen on the mesh exactly
when they happen single-device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       SparseIds)
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _mk(num_shards, hot_threshold=2, buckets=16, mesh=None):
    col = EmbeddingColumn(
        name="c0", dim=4, capacity=1 << 8, initializer="constant",
        init_scale=1.0, combiner="sum",
        adaptive_hot_threshold=hot_threshold, adaptive_buckets=buckets)
    kw = (dict(axis_name="data", num_shards=num_shards)
          if num_shards > 1 else {})
    group = EmbeddingGroup([col], **kw)
    params = {"p": jnp.ones((4,), jnp.float32),
              **group.adaptive_static_params()}
    opt = sopt.SparseAdagrad(learning_rate=0.2)
    tx = optax.adagrad(0.2)
    ts = trainlib.create_train_state(group, params, tx, opt)
    afn = lambda p, e, b: jnp.sum(e["c0"] * p["p"], axis=1)  # noqa: E731
    step = trainlib.make_train_step(
        group, afn,
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx, mesh=mesh, donate=False)
    return group, ts, step, afn


def _batch(rng, B=64, vocab=40):
    ids = rng.integers(0, vocab, (B, 1)).astype(np.int64)
    return {"c0": SparseIds.from_numpy(ids),
            "label": jnp.asarray((ids[:, 0] % 3 == 0).astype(np.float32))}


def _by_key(cfg, state):
    a = ev.export_arrays(cfg, state)
    return {int(k): v for k, v in zip(a["keys"], a["values"])}


def test_sharded_adaptive_matches_single_device(mesh8):
    gm, tsm, stepm, afn = _mk(8, mesh=mesh8)
    gs, tss, steps, _ = _mk(1)
    (tname,) = gm.adaptive_tables
    assert gm.placement_plan()[tname] == "sharded"
    assert gm.tables[tname].capacity == (1 << 8) // 8

    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(8)]
    for b in batches:
        tsm, mm = stepm(tsm, b)
        tss, ms = steps(tss, b)
        np.testing.assert_allclose(float(mm["loss"]), float(ms["loss"]),
                                   rtol=2e-5)
        assert int(mm["n_overflow"]) == 0

    # Static halves match exactly (psum'd cold grads == global grads).
    np.testing.assert_allclose(
        np.asarray(tsm.params["adaptive_static"][tname]),
        np.asarray(tss.params["adaptive_static"][tname]),
        rtol=2e-5, atol=1e-6)

    # EV halves match BY KEY (slot permutations differ across layouts).
    shards = jax.device_get(tsm.ev[tname])
    merged = {}
    cfg_m = gm.tables[tname]
    for s in range(8):
        merged.update(_by_key(cfg_m, jax.tree.map(lambda x: x[s],
                                                  shards)))
    single = _by_key(gs.tables[tname], jax.device_get(tss.ev[tname]))
    assert set(merged) == set(single)
    for k in merged:
        np.testing.assert_allclose(merged[k], single[k], rtol=2e-5,
                                   atol=1e-6)


def test_sharded_adaptive_eval_matches_single(mesh8):
    gm, tsm, stepm, afn = _mk(8, mesh=mesh8)
    gs, tss, steps, _ = _mk(1)
    rng = np.random.default_rng(1)
    for _ in range(5):
        b = _batch(rng)
        tsm, _ = stepm(tsm, b)
        tss, _ = steps(tss, b)
    held = _batch(rng)
    got = np.asarray(trainlib.make_eval_step(gm, afn, mesh=mesh8)(
        tsm, held))
    want = np.asarray(trainlib.make_eval_step(gs, afn)(tss, held))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
