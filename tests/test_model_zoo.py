"""Every zoo model trains: build from the registry, run a handful of
steps single-device, require finite decreasing loss (the reference's
modelzoo CI role, ``cibuild/model-test.sh``)."""

import jax
import numpy as np
import optax
import pytest

from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.models.registry import ZOO
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib

SMALL = dict(embedding_dim=8, capacity=1 << 10)


def _module_kwargs(name):
    return {
        "wdl": dict(hidden=(32, 16)),
        "deepfm": dict(hidden=(32, 16)),
        "dlrm": dict(embedding_dim=8, bottom=(16,), top=(32, 16)),
        "din": dict(hidden=(32, 16), att_hidden=(16,)),
        "dien": dict(gru_hidden=8, hidden=(32, 16)),
        "bst": dict(hidden=(32, 16), num_blocks=1, num_heads=2),
        "dssm": dict(tower=(32, 8)),
        "esmm": dict(tower=(32, 16)),
        "mmoe": dict(num_experts=2, expert=(16,), tower=(8,)),
        "dbmtl": dict(bottom=(16,), tower=(8,)),
        "simple_multitask": dict(tower=(32, 16)),
    }[name]


def _data_kwargs(name):
    if name in ("din", "dien", "bst", "dssm"):
        return dict(batch_size=32, num_items=200, seq_len=8)
    return dict(batch_size=32, vocab=300)


@pytest.mark.parametrize("name", sorted(ZOO))
def test_model_trains(name):
    entry = ZOO[name]
    cols = entry.columns(**SMALL)
    group = EmbeddingGroup(cols)
    module = entry.make_module(**_module_kwargs(name))
    data = entry.make_data(seed=0, **_data_kwargs(name))

    b0 = data.next_batch()
    states0 = group.create_state()

    # One jitted program for the lookup+combine init instead of
    # hundreds of eager one-off compilations per model (the eager
    # version's cumulative LLVM JIT state segfaulted the suite).
    @jax.jit
    def _init_embs(states, b):
        _, gl = group.lookup_train(states, b, 0)
        return group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})

    embs = _init_embs(states0, b0)
    numeric = group.numeric_features(b0)
    if name in ("din", "dien", "bst", "dssm"):
        variables = module.init(jax.random.key(0), embs)
    else:
        variables = module.init(jax.random.key(0), embs, numeric)
    params = variables["params"]

    opt = sopt.SparseAdagrad(learning_rate=0.1)
    tx = optax.adagrad(0.05)
    ts = trainlib.create_train_state(group, params, tx, opt)
    afn = entry.make_apply(module, group)
    step = trainlib.make_train_step(group, afn, entry.loss, opt, tx)

    losses = []
    # Sequence/multi-task losses are noisier on tiny batches; verified
    # to separate head/tail by step 40 (deterministic seeds).
    n_steps = 48 if name in ("din", "dien", "bst", "esmm", "dbmtl",
                         "mmoe", "simple_multitask") else 24
    for i in range(n_steps):
        ts, m = step(ts, data.next_batch())
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), (name, losses)
    head = np.mean(losses[:6])
    tail = np.mean(losses[-6:])
    assert tail < head, (name, head, tail, losses)
