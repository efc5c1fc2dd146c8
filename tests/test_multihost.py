"""Multi-host helpers on the virtual 8-device mesh (single process:
process_count == 1, so the helpers' single-host paths + global batch
assembly are what's exercised; real DCN runs use the same code)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeprec_tpu.parallel import multihost


def test_initialize_singleprocess_noop():
    multihost.initialize()  # must not raise


def test_process_shard_partitions():
    items = list(range(10))
    shards = [multihost.process_shard(items, process_index=i,
                                      process_count=3)
              for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)


def test_shard_iterator():
    out = list(multihost.shard_iterator(
        [1, 2, 3, 4], lambda x: iter([x * 10, x * 10 + 1]),
        process_index=1, process_count=2))
    assert out == [20, 21, 40, 41]


def test_host_local_to_global_and_train(mesh8):
    """Global batch assembly feeds the sharded train step."""
    from deeprec_tpu.feature_column.feature_column import (
        EmbeddingColumn, EmbeddingGroup, SparseIds)
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses

    group = EmbeddingGroup(
        [EmbeddingColumn(name="f", dim=4, capacity=1 << 9,
                         initializer="zeros", combiner="sum")],
        axis_name="data", num_shards=8)
    opt = sopt.SparseSGD(0.5)
    tx = optax.sgd(0.1)
    ts = trainlib.create_train_state(group, {"w": jnp.ones((4,))}, tx,
                                     opt)
    step = trainlib.make_train_step(
        group, lambda p, e, b: jnp.sum(e["f"] * p["w"], axis=1),
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx, mesh=mesh8)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 100, size=(16, 2)).astype(np.int64)
    host_batch = {"f": SparseIds.from_numpy(ids),
                  "label": (ids.sum(1) % 2).astype(np.float32)}
    gb = multihost.host_local_to_global(mesh8, host_batch)
    assert gb["label"].sharding.spec == jax.sharding.PartitionSpec(
        "data")
    ts, m = step(ts, gb)
    assert np.isfinite(float(m["loss"]))
