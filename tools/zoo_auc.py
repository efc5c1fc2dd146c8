"""End-to-end accuracy evidence for any zoo model — the AUC half of
the reference's modelzoo README tables, generalized from
``tools/train_wdl.py`` to the whole registry.

Trains with the single-dispatch epoch-scan loop
(``make_epoch_step(n_epochs=E)``) and reports held-out streaming AUC
for models with a single binary logit head, plus the per-epoch loss
curve for all models (multi-task heads report loss descent only).

Usage: python tools/zoo_auc.py MODEL [steps] [--fp32] [--cpu]
           [--batch N] [--pool K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax


def _arg(flag, default, cast=int):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


SMALL = dict(embedding_dim=16, capacity=1 << 18)

MODULE_KWARGS = {
    "wdl": dict(hidden=(256, 128, 64)),
    "deepfm": dict(hidden=(256, 128, 32)),
    "dlrm": dict(embedding_dim=16, bottom=(128, 64, 16),
                 top=(256, 128, 64)),
    "din": dict(hidden=(200, 80), att_hidden=(80, 40)),
    "dien": dict(gru_hidden=36, hidden=(200, 80)),
    "bst": dict(hidden=(256, 128, 64), num_blocks=1, num_heads=8),
    "dssm": dict(tower=(256, 128, 64)),
    "esmm": dict(tower=(256, 128)),
    "mmoe": dict(num_experts=4, expert=(256,), tower=(128,)),
    "dbmtl": dict(bottom=(256, 128), tower=(128,)),
    "simple_multitask": dict(tower=(256, 128)),
}


def run(name: str, steps: int = 288, bf16: bool = True,
        batch: int = 4096, pool: int = 48):
    from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
    from deeprec_tpu.models.registry import ZOO
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import metrics as metricslib

    entry = ZOO[name]
    is_seq = name in ("din", "dien", "bst", "dssm")
    group = EmbeddingGroup(entry.columns(**SMALL), coalesce=True)
    mk = dict(MODULE_KWARGS[name])
    if bf16:
        mk["dtype"] = jnp.bfloat16
    module = entry.make_module(**mk)
    dk = dict(batch_size=batch, num_items=100_000, seq_len=50) if is_seq \
        else dict(batch_size=batch, vocab=100_000)
    data = entry.make_data(seed=0, **dk)

    b0 = group.pack_batch(data.next_batch())

    @jax.jit
    def _init(states, b, key):
        _, gl = group.lookup_train(states, b, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        if is_seq:
            return module.init(key, embs)
        return module.init(key, embs, group.numeric_features(b))

    variables = _init(group.create_state(), b0, jax.random.key(0))
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    ts = trainlib.create_train_state(group, variables["params"], tx, opt)
    afn = entry.make_apply(module, group)

    n_epochs = max(1, -(-steps // pool))
    steps = n_epochs * pool
    stacked = trainlib.stack_batches(
        [group.pack_batch(data.next_batch()) for _ in range(pool)])
    eval_stacked = trainlib.stack_batches(
        [group.pack_batch(data.next_batch()) for _ in range(10)])

    run_all = trainlib.make_epoch_step(group, afn, entry.loss, opt, tx,
                                       n_epochs=n_epochs)
    eval_step = trainlib.make_eval_step(group, afn)

    t0 = time.perf_counter()
    ts, ls = run_all(ts, stacked)
    jax.block_until_ready(ls)
    train_s = time.perf_counter() - t0

    out = {"metric": f"{name}_synthetic_accuracy",
           "mode": "bf16" if bf16 else "fp32",
           "backend": jax.default_backend(),
           "steps": steps, "batch": batch,
           "train_s_incl_compile": round(train_s, 1)}

    ls = np.asarray(jax.device_get(ls)).reshape(n_epochs, pool)
    out["loss_epoch_means"] = [round(float(m), 4) for m in ls.mean(1)]
    out["loss_drops"] = bool(ls.mean(1)[-1] < ls.mean(1)[0])

    # Streaming AUC for single-binary-logit models.
    probe = eval_step(ts, jax.tree.map(lambda x: x[0], eval_stacked))
    if hasattr(probe, "ndim") and probe.ndim == 1:
        @jax.jit
        def eval_all(ts_, se):
            def body(auc, b):
                logits = eval_step(ts_, b)
                return metricslib.auc_update(auc, logits,
                                             b["label"]), None
            auc, _ = jax.lax.scan(body, metricslib.auc_init(), se)
            return auc

        auc = eval_all(ts, eval_stacked)
        jax.block_until_ready(auc)
        out["auc"] = round(float(metricslib.auc_result(auc)), 4)
    return out


if __name__ == "__main__":
    name = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 and \
        sys.argv[2].isdigit() else 288
    print(json.dumps(run(
        name, steps, bf16="--fp32" not in sys.argv,
        batch=_arg("--batch", 4096), pool=_arg("--pool", 48))),
        flush=True)
