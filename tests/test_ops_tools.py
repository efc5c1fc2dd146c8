"""Fused ops, low-precision tool, StructuredModel, feature store."""

import numpy as np
import jax
import jax.numpy as jnp

from deeprec_tpu.ops import fused
from deeprec_tpu.tools import low_precision as lp
from deeprec_tpu.models.structured import StructuredModel, structured_score, dot_join


class TestFusedL2Normalize:
    def test_forward_matches_reference_formula(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 16)),
                        jnp.float32)
        y = fused.fused_l2_normalize(x)
        want = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(y * y, axis=-1)), 1.0, rtol=1e-5)

    def test_gradient_matches_autodiff(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 8)),
                        jnp.float32)

        def ref(x):
            return x * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(x * x, -1, keepdims=True), 1e-12))

        f = lambda x: jnp.sum(jnp.sin(fused.fused_l2_normalize(x)))
        g = lambda x: jnp.sum(jnp.sin(ref(x)))
        np.testing.assert_allclose(np.asarray(jax.grad(f)(x)),
                                   np.asarray(jax.grad(g)(x)), rtol=1e-5)

    def test_zero_row_safe(self):
        x = jnp.zeros((2, 4), jnp.float32)
        y = fused.fused_l2_normalize(x)
        assert np.isfinite(np.asarray(y)).all()
        g = jax.grad(lambda x: jnp.sum(fused.fused_l2_normalize(x)))(x)
        assert np.isfinite(np.asarray(g)).all()


class TestSegmentOps:
    def test_sum_mean_sqrtn(self):
        data = jnp.asarray([[1.0], [2.0], [4.0]])
        indices = jnp.asarray([0, 1, 2, 2])
        seg = jnp.asarray([0, 0, 1, 1])
        s = fused.sparse_segment_sum(data, indices, seg, 2)
        np.testing.assert_allclose(np.asarray(s), [[3.0], [8.0]])
        m = fused.sparse_segment_mean(data, indices, seg, 2)
        np.testing.assert_allclose(np.asarray(m), [[1.5], [4.0]])
        q = fused.sparse_segment_sqrtn(data, indices, seg, 2)
        np.testing.assert_allclose(
            np.asarray(q), [[3.0 / np.sqrt(2)], [8.0 / np.sqrt(2)]],
            rtol=1e-6)

    def test_empty_segment_is_zero(self):
        out = fused.sparse_segment_mean(
            jnp.ones((3, 2)), jnp.asarray([0]), jnp.asarray([2]), 4)
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[2]), 1.0)


class TestLowPrecision:
    def test_to_bf16_kernels_only(self):
        params = {"dense": {"kernel": jnp.ones((4, 4)),
                            "bias": jnp.ones((4,))}}
        out = lp.to_bf16(params)
        assert out["dense"]["kernel"].dtype == jnp.bfloat16
        assert out["dense"]["bias"].dtype == jnp.float32

    def test_int8_roundtrip_error_bounded(self):
        w = jnp.asarray(np.random.default_rng(0).normal(size=(32, 16)),
                        jnp.float32)
        q = lp.quantize_tensor_int8(w)
        assert q.q.dtype == jnp.int8
        back = q.dequantize()
        err = np.abs(np.asarray(back - w))
        col_amax = np.abs(np.asarray(w)).max(0)
        assert (err <= col_amax / 127.0 * 0.5 + 1e-7).all()

    def test_quantize_dense_tree(self):
        params = {"a": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)}}
        qp = lp.quantize_dense_int8(params)
        assert isinstance(qp["a"]["kernel"], lp.QuantizedTensor)
        dq = lp.dequantize_dense(qp)
        np.testing.assert_allclose(np.asarray(dq["a"]["kernel"]),
                                   np.ones((4, 4)), rtol=1e-2)

    def test_ev_per_row_quant_and_gather(self):
        rng = np.random.default_rng(2)
        vals = jnp.asarray(rng.normal(size=(9, 8)) *
                           rng.uniform(0.1, 10, size=(9, 1)), jnp.float32)
        qv = lp.quantize_ev_values(vals)
        rows = lp.gather_quantized(qv, jnp.asarray([0, 5, 8]))
        want = np.asarray(vals)[[0, 5, 8]]
        scale = np.abs(want).max(1, keepdims=True) / 127.0
        assert (np.abs(np.asarray(rows) - want) <= scale * 0.5 + 1e-7).all()

    def test_calibrator(self):
        c = lp.Calibrator()
        c.observe("x", jnp.asarray([1.0, -3.0]))
        c.observe("x", jnp.asarray([2.0]))
        c.observe("y", jnp.asarray([0.5]))
        s = c.scales()
        np.testing.assert_allclose(s["x"], 3.0 / 127.0, rtol=1e-6)
        np.testing.assert_allclose(s["y"], 0.5 / 127.0, rtol=1e-6)

    def test_accuracy_delta(self):
        batches = [{"label": np.array([0.0, 1.0]),
                    "x": np.array([0.2, 0.8])}]
        m = lp.accuracy_delta(
            lambda b: b["x"], lambda b: b["x"] * 0.99, batches,
            metric=lambda y, p: float(np.mean((p > 0.5) == (y > 0.5))))
        assert m["fp32"] == 1.0 and m["lp"] == 1.0 and m["delta"] == 0.0


class TestStructuredModel:
    def test_matches_naive_recompute(self):
        rng = np.random.default_rng(3)
        W_u = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
        W_i = jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)
        user = jnp.asarray(rng.normal(size=(3, 6)), jnp.float32)
        items = jnp.asarray(rng.normal(size=(3, 7, 5)), jnp.float32)

        score = structured_score(
            lambda u: u @ W_u, lambda it: it @ W_i, dot_join, user, items)
        assert score.shape == (3, 7)
        naive = jnp.einsum("bd,bnd->bn", user @ W_u, items @ W_i)
        np.testing.assert_allclose(np.asarray(score), np.asarray(naive),
                                   rtol=1e-5)

    def test_wrapper_and_grads(self):
        params = {"wu": jnp.ones((2, 3)), "wi": jnp.ones((2, 3))}
        m = StructuredModel(
            user_fn=lambda p, u: u @ p["wu"],
            item_fn=lambda p, it: it @ p["wi"])
        u = jnp.ones((1, 2))
        it = jnp.ones((1, 4, 2))

        def loss(p):
            return jnp.sum(m.apply(p, u, it))

        g = jax.grad(loss)(params)
        assert np.isfinite(np.asarray(g["wu"])).all()
        assert (np.asarray(g["wu"]) != 0).any()


class TestFeatureStore:
    def _group(self):
        from deeprec_tpu.feature_column.feature_column import (
            EmbeddingColumn, EmbeddingGroup)
        cols = [EmbeddingColumn(name="f", dim=4, capacity=64,
                                initializer="zeros")]
        return EmbeddingGroup(cols)

    def test_inmemory_roundtrip(self):
        from deeprec_tpu.serving.feature_store import InMemoryFeatureStore
        st = InMemoryFeatureStore()
        ids = np.array([1, 2, 3], np.int64)
        rows = np.arange(12, dtype=np.float32).reshape(3, 4)
        st.put_batch("t", ids, rows)
        found, got = st.get_batch("t", np.array([2, 9], np.int64), 4)
        assert found.tolist() == [True, False]
        np.testing.assert_array_equal(got[0], rows[1])
        np.testing.assert_array_equal(got[1], 0.0)

    def test_publish_and_remote_predict(self):
        import optax
        from deeprec_tpu.optimizers import sparse as sopt
        from deeprec_tpu.serving.feature_store import (
            InMemoryFeatureStore, RemoteServingModel, publish_sparse)
        from deeprec_tpu.train import loop as trainlib
        from deeprec_tpu.feature_column.feature_column import SparseIds
        from deeprec_tpu.utils import keys as keylib

        group = self._group()
        opt = sopt.SparseSGD(0.5)
        tx = optax.sgd(0.1)

        def afn(params, embs, batch):
            return jnp.sum(embs["f"] * params["w"], axis=1)

        params = {"w": jnp.ones((4,))}
        ts = trainlib.create_train_state(group, params, tx, opt)
        ids = np.array([[11, 12], [13, keylib.EMPTY_ID]], np.int64)
        batch = {"f": SparseIds.from_numpy(ids),
                 "label": jnp.asarray([1.0, 0.0])}
        step = trainlib.make_train_step(
            group, afn, lambda out, b: (out - b["label"]) ** 2, opt, tx)
        ts, _ = step(ts, batch)

        store = InMemoryFeatureStore()
        written = publish_sparse(ts, group, store)
        assert written["f"] == 3

        remote = RemoteServingModel(group, afn, ts.params, store)
        out = np.asarray(remote.predict(batch))
        # Compare against local eval path.
        local = trainlib.make_eval_step(group, afn)(ts, batch)
        np.testing.assert_allclose(out, np.asarray(local), rtol=1e-5)

    def test_remote_cache_fills(self):
        from deeprec_tpu.serving.feature_store import (
            InMemoryFeatureStore, RemoteServingModel)
        from deeprec_tpu.feature_column.feature_column import SparseIds

        group = self._group()
        store = InMemoryFeatureStore()
        cache = InMemoryFeatureStore()
        store.put_batch("f", np.array([5], np.int64),
                        np.ones((1, 4), np.float32))

        def afn(params, embs, batch):
            return jnp.sum(embs["f"], axis=1)

        remote = RemoteServingModel(group, afn, {}, store, cache=cache)
        batch = {"f": SparseIds.from_numpy(np.array([[5]], np.int64))}
        out1 = np.asarray(remote.predict(batch))
        assert cache.num_rows("f") == 1
        out2 = np.asarray(remote.predict(batch))
        np.testing.assert_allclose(out1, out2)
        np.testing.assert_allclose(out1, [4.0])

    def test_publish_delta_only(self):
        import optax
        from deeprec_tpu.optimizers import sparse as sopt
        from deeprec_tpu.serving.feature_store import (
            InMemoryFeatureStore, publish_sparse)
        from deeprec_tpu.train import loop as trainlib
        from deeprec_tpu.feature_column.feature_column import SparseIds

        group = self._group()
        opt = sopt.SparseSGD(0.5)
        tx = optax.sgd(0.1)

        def afn(params, embs, batch):
            return jnp.sum(embs["f"] * params["w"], axis=1)

        ts = trainlib.create_train_state(group, {"w": jnp.ones((4,))},
                                         tx, opt)
        step = trainlib.make_train_step(
            group, afn, lambda out, b: (out - b["label"]) ** 2, opt, tx)
        b1 = {"f": SparseIds.from_numpy(np.array([[1], [2]], np.int64)),
              "label": jnp.asarray([1.0, 0.0])}
        ts, _ = step(ts, b1)
        b2 = {"f": SparseIds.from_numpy(np.array([[3], [3]], np.int64)),
              "label": jnp.asarray([1.0, 0.0])}
        ts, _ = step(ts, b2)

        store = InMemoryFeatureStore()
        written = publish_sparse(ts, group, store, min_version=1)
        assert written["f"] == 1   # only id 3 touched at step >= 1
        found, _ = store.get_batch("f", np.array([3], np.int64), 4)
        assert found[0]


def test_env_collect():
    """tools/env_collect.py gathers a bug-report doc (tf_env_collect
    analog) without touching the device."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import env_collect
    info = env_collect.collect(touch_device=False)
    assert info["python"] and info["jax"] and info["cpu_count"] >= 1
    assert "commit" in info["repo"]
    assert "devices" not in info
