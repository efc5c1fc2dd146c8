"""On-TPU accuracy evidence — closes the round-1 gap "no on-TPU
loss/AUC evidence" (all other accuracy runs use the CPU XLA backend,
which compiles the identical HLO but does not exercise the TPU numeric
path: bf16 MXU accumulation, TPU transcendentals, HBM layouts).

Shape constraints (PARITY.md "Known gaps", hard-won on the tunneled
runtime): device->host reads after scan-of-steps programs or large
donated programs crash the TPU worker, but SINGLE-STEP programs + a
small D2H are reliable up to ~2^20-row dim-16 tables. So this runner
uses per-step dispatch of ``make_train_step`` (no epoch scan) on a
small WDL and fetches only scalars: per-epoch mean loss and the final
AUC accumulator counts.

The check is the reference's BF16 bar (``modelzoo/WDL/README.md``
FP32-vs-BF16 AUC within ~0.002): the SAME run on the CPU backend must
match the TPU run's AUC closely — any larger gap would indicate a TPU
numeric-path defect, not dataset noise (identical batches, identical
init, same HLO modulo backend codegen).

Usage: python tools/tpu_auc.py [steps] [--cpu] [--batch N] [--fp32]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
import optax


def _arg(flag, default, cast=int):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def run(steps: int = 192, batch: int = 2048, bf16: bool = True):
    from deeprec_tpu.data.criteo import SyntheticCriteo
    from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
    from deeprec_tpu.models import wdl
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import metrics as metricslib
    from deeprec_tpu.train.losses import bce_with_logits

    def loss_fn(out, batch):
        return bce_with_logits(out, batch["label"])

    # Tiny reference-family WDL: dim 16, 2^16-row tables, small towers
    # — well inside the single-step + D2H reliability envelope.
    group = EmbeddingGroup(
        wdl.criteo_columns(embedding_dim=16, capacity=1 << 16),
        coalesce=True)
    model = wdl.WDL(hidden=(256, 128),
                    dtype=jnp.bfloat16 if bf16 else jnp.float32)
    afn = wdl.apply_fn(model, group)
    data = SyntheticCriteo(batch, vocab=20_000, seed=0)

    b0 = group.pack_batch(data.next_batch())

    @jax.jit
    def _init(states, b, key):
        _, gl = group.lookup_train(states, b, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        return model.init(key, embs, group.numeric_features(b))

    variables = _init(group.create_state(), b0, jax.random.key(0))
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    ts = trainlib.create_train_state(group, variables["params"], tx, opt)
    step = trainlib.make_train_step(group, afn, loss_fn, opt, tx)
    eval_step = trainlib.make_eval_step(group, afn)

    @jax.jit
    def eval_auc(auc, ts_, b):
        return metricslib.auc_update(auc, eval_step(ts_, b), b["label"])

    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        ts, m = step(ts, group.pack_batch(data.next_batch()))
        if (i + 1) % 48 == 0:
            # Small scalar D2H: fences the queue (the only real sync on
            # the tunnel) and gives the per-epoch loss curve.
            losses.append(float(jax.device_get(m["loss"])))
    train_s = time.perf_counter() - t0

    auc = metricslib.auc_init()
    for _ in range(10):
        auc = eval_auc(auc, ts, group.pack_batch(data.next_batch()))
    auc_v = float(metricslib.auc_result(jax.device_get(auc)))

    return {
        "metric": "wdl_tpu_numeric_path_auc",
        "backend": jax.default_backend(),
        "device_kind": jax.devices()[0].device_kind,
        "mode": "bf16" if bf16 else "fp32",
        "steps": steps, "batch": batch,
        "loss_every_48": [round(l, 4) for l in losses],
        "auc": round(auc_v, 4),
        "train_s_incl_compile": round(train_s, 1),
    }


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 and \
        sys.argv[1].isdigit() else 192
    print(json.dumps(run(steps, batch=_arg("--batch", 2048),
                         bf16="--fp32" not in sys.argv)), flush=True)
