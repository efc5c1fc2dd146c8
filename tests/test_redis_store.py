"""Redis feature-store path, EXECUTED end-to-end against an in-process
RESP2 server (``serving/resp.py`` MiniRedisServer — the MiniKafkaBroker
pattern; reference tests: ``serving/processor/storage/redis_test.cc``,
``redis_feature_store.cc``).

Covers: wire protocol (binary-safe bulk strings, MGET, pipeline, SCAN),
publish_sparse -> RedisFeatureStore -> RemoteServingModel scoring match
vs local eval, delta publish (min_version), and the cache tier.
"""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       SparseIds)
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.serving.feature_store import (InMemoryFeatureStore,
                                               RedisFeatureStore,
                                               RemoteServingModel,
                                               publish_sparse)
from deeprec_tpu.serving.resp import MiniRedisServer, RespClient
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


@pytest.fixture(scope="module")
def redis_server():
    with MiniRedisServer() as srv:
        yield srv


def test_resp_client_protocol(redis_server):
    c = RespClient.from_url(redis_server.url)
    assert c.ping()
    assert c.set("k1", b"\x00\x01binary\xff")   # binary-safe
    assert c.get("k1") == b"\x00\x01binary\xff"
    assert c.get("missing") is None
    assert c.mget(["k1", "missing"]) == [b"\x00\x01binary\xff", None]
    p = c.pipeline()
    for i in range(5):
        p.set(f"t/a/{i}", bytes([i]))
    assert p.execute() == [b"OK"] * 5
    keys = sorted(c.scan_iter("t/a/*"))
    assert keys == [f"t/a/{i}".encode() for i in range(5)]
    assert c.delete("t/a/0", "t/a/1") == 2
    assert c.get("t/a/0") is None
    # SELECT isolates databases.
    c2 = RespClient.from_url(redis_server.url.replace("/0", "/3"))
    assert c2.get("k1") is None
    c.close()
    c2.close()


def _build():
    cols = [EmbeddingColumn("c0", dim=4, capacity=1 << 8),
            EmbeddingColumn("c1", dim=4, capacity=1 << 8,
                            static_bucket=True, num_buckets=64)]
    group = EmbeddingGroup(cols)
    params = {"w": jnp.ones((8,), jnp.float32)}
    afn = lambda p, e, b: jnp.sum(  # noqa: E731
        jnp.concatenate([e["c0"], e["c1"]], axis=1) * p["w"], axis=1)
    opt = sopt.SparseSGD(0.5)
    tx = optax.sgd(0.2)
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(
        group, afn, lambda out, b: losses.bce_with_logits(
            out, b["label"]), opt, tx)
    return group, ts, step, afn


def _batch(rng, B=32):
    ids = rng.integers(0, 500, (B, 1)).astype(np.int64)
    return {"c0": SparseIds.from_numpy(ids),
            "c1": SparseIds.from_numpy(ids * 7 + 1),
            "label": jnp.asarray((ids[:, 0] % 2).astype(np.float32))}


def test_publish_remote_score_roundtrip(redis_server):
    group, ts, step, afn = _build()
    rng = np.random.default_rng(0)
    b = _batch(rng)
    ts, _ = step(ts, b)

    store = RedisFeatureStore(redis_server.url, prefix="t1")
    counts = publish_sparse(ts, group, store)
    assert counts["c0"] > 0 and counts["c1"] == 64  # static: all rows

    remote = RemoteServingModel(group, afn, ts.params, store)
    got = np.asarray(remote.predict(b))
    want = np.asarray(trainlib.make_eval_step(group, afn)(ts, b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_delta_publish_and_cache(redis_server):
    group, ts, step, afn = _build()
    rng = np.random.default_rng(1)
    ts, _ = step(ts, _batch(rng))
    store = RedisFeatureStore(redis_server.url, prefix="t2")
    publish_sparse(ts, group, store)

    # Step again, delta-publish only rows touched since step 1 (the
    # incremental model-update path, model_instance.h:41-43).
    b2 = _batch(rng)
    ts, _ = step(ts, b2)
    n_delta = publish_sparse(ts, group, store, min_version=1)["c0"]
    from deeprec_tpu.embedding import variable as ev
    n_all = len(ev.export_arrays(group.tables["c0"],
                                 ts.ev["c0"])["keys"])
    assert 0 < n_delta <= n_all

    cache = InMemoryFeatureStore()
    remote = RemoteServingModel(group, afn, ts.params, store,
                                cache=cache)
    got1 = np.asarray(remote.predict(b2))
    assert cache.num_rows("c0") > 0          # misses filled the cache
    got2 = np.asarray(remote.predict(b2))    # second hit: cache path
    np.testing.assert_allclose(got1, got2, rtol=1e-6)
    want = np.asarray(trainlib.make_eval_step(group, afn)(ts, b2))
    np.testing.assert_allclose(got1, want, rtol=1e-5, atol=1e-6)
