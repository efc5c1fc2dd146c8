"""Shared model/batch builders for the 2-process distributed test.

Both the subprocess driver (``_twoprocess_driver.py``) and the
single-process reference (``test_twoprocess.py``) build EXACTLY this
model and batch stream, so their losses are comparable step for step.
This is the analog of the reference's in-process multi-task server
harness (``distributed_runtime/rpc/grpc_testlib.h``) — the smallest
real multi-process cluster that exercises DCN-style collectives.
"""

from __future__ import annotations

import numpy as np

N_STEPS = 3
B_GLOBAL = 16
L = 2
DIM = 4
SHARDS = 8


def build_group_and_step(mesh):
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.feature_column.feature_column import (
        EmbeddingColumn, EmbeddingGroup)
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses

    group = EmbeddingGroup(
        [EmbeddingColumn(name="f", dim=DIM, capacity=1 << 9,
                         initializer="zeros", combiner="sum")],
        axis_name="data", num_shards=SHARDS)
    opt = sopt.SparseAdagrad(0.3)
    tx = optax.sgd(0.1)
    ts = trainlib.create_train_state(group, {"w": jnp.ones((DIM,))}, tx,
                                     opt)
    step = trainlib.make_train_step(
        group, lambda p, e, b: jnp.sum(e["f"] * p["w"], axis=1),
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx, mesh=mesh, donate=False)
    return group, ts, step


def global_batch_np(step_idx: int):
    """Deterministic global batch (both processes generate the same)."""
    rng = np.random.default_rng(1000 + step_idx)
    ids = rng.integers(1, 500, size=(B_GLOBAL, L)).astype(np.int64)
    label = (ids.sum(1) % 2).astype(np.float32)
    return ids, label
