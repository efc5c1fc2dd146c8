"""Model-zoo benchmark harness — ``tests/model_benchmark`` analog.

Runs every zoo model at production-ish size on the available device,
measuring samples/s between WARMUP and WARMUP+MEASURE steps (the
reference measures steps 100..110, ``tests/model_benchmark/config.yaml``
via START/STOP_STATISTIC_STEP).  Prints one JSON line per model with
``vs_baseline`` against the reference's best published number
(BASELINE.md) where one exists.

Usage:  python tools/model_benchmark.py [model ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")  # repo root

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.models.registry import ZOO
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib

WARMUP = 100
MEASURE = 10

# DeepRec's best published samples/s per model (BASELINE.md; FP32+BF16
# where published, else FP32).
BASELINES = {
    "wdl": 22788.93,
    "dlrm": 60907.11,
    "deepfm": 34627.46,
    "dssm": 129099.08,
    "din": 22299.68,
    "dien": 3862.06,
}

FULL = dict(embedding_dim=16, capacity=1 << 20)

MODULE_KWARGS = {
    "wdl": dict(hidden=(1024, 512, 256), dtype=jnp.bfloat16),
    "deepfm": dict(hidden=(1024, 256, 32), dtype=jnp.bfloat16),
    "dlrm": dict(embedding_dim=16, bottom=(512, 256, 16),
                 top=(1024, 1024, 512, 256), dtype=jnp.bfloat16),
    "din": dict(hidden=(200, 80), att_hidden=(80, 40),
                dtype=jnp.bfloat16),
    "dien": dict(gru_hidden=36, hidden=(200, 80), dtype=jnp.bfloat16),
    "bst": dict(hidden=(1024, 512, 256), num_blocks=1, num_heads=8,
                dtype=jnp.bfloat16),
    "dssm": dict(tower=(256, 128, 64), dtype=jnp.bfloat16),
    "esmm": dict(tower=(256, 128), dtype=jnp.bfloat16),
    "mmoe": dict(num_experts=4, expert=(256,), tower=(128,),
                 dtype=jnp.bfloat16),
    "dbmtl": dict(bottom=(512, 256), tower=(128,), dtype=jnp.bfloat16),
    "simple_multitask": dict(tower=(256, 128), dtype=jnp.bfloat16),
}


def data_kwargs(name: str, batch: int):
    if name in ("din", "dien", "bst", "dssm"):
        return dict(batch_size=batch, num_items=200_000, seq_len=50)
    return dict(batch_size=batch, vocab=200_000)


def bench_model(name: str, batch: int = 16384) -> dict:
    if name in ("din", "dien", "bst", "dssm"):
        batch = min(batch, 4096)  # sequence models: [B, T] activations
    entry = ZOO[name]
    cols = entry.columns(**FULL)
    group = EmbeddingGroup(cols, coalesce=True)
    module = entry.make_module(**MODULE_KWARGS[name])
    data = entry.make_data(seed=0, **data_kwargs(name, batch))

    b0 = data.next_batch()
    states0 = group.create_state()

    # Keep init off the eager path: on a tunneled device every eager op
    # is a host round trip, so the whole init pipeline is one jitted
    # program (lookup -> combine -> flax init).
    is_seq = name in ("din", "dien", "bst", "dssm")

    @jax.jit
    def _init(states, b, key):
        _, gl = group.lookup_train(states, b, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        if is_seq:
            return module.init(key, embs)
        return module.init(key, embs, group.numeric_features(b))

    variables = _init(states0, b0, jax.random.key(0))

    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)
    ts = trainlib.create_train_state(group, variables["params"], tx, opt)
    afn = entry.make_apply(module, group)
    step = trainlib.make_train_step(group, afn, entry.loss, opt, tx)

    batches = [data.next_batch() for _ in range(8)]
    for i in range(WARMUP):
        ts, m = step(ts, batches[i % len(batches)])
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for i in range(MEASURE):
        ts, m = step(ts, batches[i % len(batches)])
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    sps = batch * MEASURE / dt
    out = {"metric": f"{name}_samples_per_sec", "value": round(sps, 2),
           "unit": "samples/s", "batch": batch,
           "loss": round(float(m["loss"]), 4)}
    if name in BASELINES:
        out["vs_baseline"] = round(sps / BASELINES[name], 3)
    return out


def main():
    names = sys.argv[1:] or sorted(ZOO)
    if len(names) > 1:
        # One subprocess per model: each model's tables are several GB
        # of HBM, and leaked executable/buffer references across models
        # push the device into host-spill mode (~1.5 s/step for
        # everything after the second model). A fresh process per
        # model guarantees a clean device.
        import subprocess
        for name in names:
            r = subprocess.run([sys.executable, sys.argv[0], name],
                               capture_output=True, text=True,
                               timeout=1200)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
            if r.returncode != 0:
                print(json.dumps({
                    "metric": f"{name}_samples_per_sec",
                    "error": (r.stderr.strip() or "nonzero exit")[-300:],
                }), flush=True)
        return
    name = names[0]
    try:
        print(json.dumps(bench_model(name)), flush=True)
    except Exception as e:  # noqa: BLE001 — report and continue
        print(json.dumps({"metric": f"{name}_samples_per_sec",
                          "error": f"{type(e).__name__}: {e}"}),
              flush=True)


if __name__ == "__main__":
    main()
