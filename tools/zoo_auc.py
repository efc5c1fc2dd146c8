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

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

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


# Reference-shaped configs (VERDICT r1 item 1): per-column Criteo
# cardinalities/dims from modelzoo/WDL/train.py:40-96 (reference_shapes
# in each columns()), reference tower sizes, reference embedding dims
# (DLRM/DeepFM 16, DIN/DIEN 18, BST/DSSM 16). ``capacity`` is a
# per-column ceiling for the CPU accuracy runs.
COLUMN_KWARGS = {
    "wdl": dict(reference_shapes=True, capacity=1 << 18),
    "deepfm": dict(embedding_dim=16, reference_shapes=True,
                   capacity=1 << 18),
    "dlrm": dict(embedding_dim=16, reference_shapes=True,
                 capacity=1 << 18),
    "esmm": dict(embedding_dim=16, reference_shapes=True,
                 capacity=1 << 18),
    "mmoe": dict(embedding_dim=16, reference_shapes=True,
                 capacity=1 << 18),
    "dbmtl": dict(embedding_dim=16, reference_shapes=True,
                  capacity=1 << 18),
    "simple_multitask": dict(embedding_dim=16, reference_shapes=True,
                             capacity=1 << 18),
    "din": dict(embedding_dim=18, capacity=1 << 18),
    "dien": dict(embedding_dim=18, capacity=1 << 18),
    "bst": dict(embedding_dim=16, capacity=1 << 18),
    "dssm": dict(embedding_dim=16, capacity=1 << 18),
}

MODULE_KWARGS = {
    "wdl": dict(hidden=(1024, 512, 256)),
    "deepfm": dict(hidden=(1024, 512, 256)),
    "dlrm": dict(embedding_dim=16, bottom=(512, 256),
                 top=(1024, 1024, 512, 256)),
    "din": dict(hidden=(200, 80), att_hidden=(80, 40)),
    "dien": dict(gru_hidden=36, hidden=(200, 80)),
    "bst": dict(hidden=(256, 128, 64), num_blocks=1, num_heads=8),
    "dssm": dict(tower=(256, 128, 64)),
    "esmm": dict(tower=(256, 128)),
    "mmoe": dict(num_experts=4, expert=(256,), tower=(128,)),
    "dbmtl": dict(bottom=(256, 128), tower=(128,)),
    "simple_multitask": dict(tower=(256, 128)),
}


# Per-model campaign settings. Rationale: interaction-only (DLRM) and
# sequence-attention/GRU (DIN/DIEN/BST) heads learn per-id structure
# slower than linear/FM heads, so they get more steps; sequence smokes
# use a 20k-item space so head items recur enough in a short run (the
# reference's Amazon-Books runs are many epochs over 367k items —
# equivalent recurrence, scaled to a smoke budget).
# Recipe (settled by round-2 probes): sparse Adagrad lr 0.3 on
# embeddings + Adam 2e-3 on dense towers — flat low-lr Adagrad
# underfits both the per-id tables and the interaction stacks on a
# 300-600-step budget (DeepFM 0.634 -> 0.675 at 288 steps from this
# change alone).
CAMPAIGN = {
    "wdl": dict(steps=384, lr=0.3, dense="adam"),
    "deepfm": dict(steps=384, lr=0.3, dense="adam"),
    "dlrm": dict(steps=576, lr=0.3, dense="adam"),
    "esmm": dict(steps=384, lr=0.3, dense="adam"),
    "mmoe": dict(steps=384, lr=0.3, dense="adam"),
    "dbmtl": dict(steps=384, lr=0.3, dense="adam"),
    "simple_multitask": dict(steps=384, lr=0.3, dense="adam"),
    "din": dict(steps=384, lr=0.3, items=20_000),
    "dien": dict(steps=288, lr=0.3, dense="adam", items=20_000),
    "bst": dict(steps=384, lr=0.3, dense="adam", items=20_000),
    "dssm": dict(steps=288, lr=0.1, items=20_000),
}


def run(name: str, steps: int = 288, bf16: bool = True,
        batch: int = 4096, pool: int = 48, seed: int = 0):
    from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
    from deeprec_tpu.models.registry import ZOO
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import metrics as metricslib

    from deeprec_tpu.data.criteo import CRITEO_HASH_BUCKETS

    metric_name = name
    if name == "dlrm_cat":          # the reference's --interaction_op
        name = "dlrm"               # cat variant as its own campaign row
        sys.argv.append("--cat")
    entry = ZOO[name]
    is_seq = name in ("din", "dien", "bst", "dssm")
    group = EmbeddingGroup(entry.columns(**COLUMN_KWARGS[name]),
                           coalesce=True)
    mk = dict(MODULE_KWARGS[name])
    if name == "dlrm" and "--cat" in sys.argv:
        # The reference's --interaction_op cat (train.py:190-201).
        mk["interaction_op"] = "cat"
    if bf16:
        mk["dtype"] = jnp.bfloat16
    module = entry.make_module(**mk)
    dk = dict(batch_size=batch, num_items=_arg("--items", 100_000),
              num_cats=1000, seq_len=50) if is_seq \
        else dict(batch_size=batch, vocab=CRITEO_HASH_BUCKETS)
    data = entry.make_data(seed=seed, **dk)

    b0 = group.pack_batch(data.next_batch())

    @jax.jit
    def _init(states, b, key):
        _, gl = group.lookup_train(states, b, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        if is_seq:
            return module.init(key, embs)
        return module.init(key, embs, group.numeric_features(b))

    variables = _init(group.create_state(), b0, jax.random.key(seed))
    lr = _arg("--lr", 0.05, float)
    opt = sopt.SparseAdagrad(learning_rate=lr)
    # Dense towers may use Adam while embeddings stay on sparse
    # Adagrad (the standard recsys split; the reference modelzoo
    # likewise pairs adagrad embeddings with adam towers in several
    # models). --dense adam[:lr]
    dense = _arg("--dense", "adagrad", str)
    if dense.startswith("adam"):
        dlr = float(dense.split(":", 1)[1]) if ":" in dense else 2e-3
        tx = optax.adam(dlr)
    else:
        tx = optax.adagrad(lr)
    ts = trainlib.create_train_state(group, variables["params"], tx, opt)
    afn = entry.make_apply(module, group)

    n_epochs = max(1, -(-steps // pool))
    steps = n_epochs * pool
    eval_stacked = trainlib.stack_batches(
        [group.pack_batch(data.next_batch()) for _ in range(10)])

    # One compiled pool-sized scan, fed FRESH batches every epoch — the
    # stream is infinite; recycling a fixed pool lets per-id embeddings
    # memorize it (loss drops, held-out AUC stays at chance).
    run_pool = trainlib.make_epoch_step(group, afn, entry.loss, opt, tx,
                                        n_epochs=1)
    t0 = time.perf_counter()
    epoch_losses = []
    for _ in range(n_epochs):
        stacked = trainlib.stack_batches(
            [group.pack_batch(data.next_batch()) for _ in range(pool)])
        ts, ls = run_pool(ts, stacked)
        epoch_losses.append(np.asarray(jax.device_get(ls)).reshape(-1))
    ls = jnp.asarray(np.concatenate(epoch_losses))
    train_s = time.perf_counter() - t0

    out = {"metric": f"{metric_name}_synthetic_accuracy",
           "mode": "bf16" if bf16 else "fp32",
           "backend": jax.default_backend(),
           "steps": steps, "batch": batch, "seed": seed,
           "train_s_incl_compile": round(train_s, 1)}

    eval_step = trainlib.make_eval_step(group, afn)
    ls = np.asarray(jax.device_get(ls)).reshape(n_epochs, pool)
    out["loss_epoch_means"] = [round(float(m), 4) for m in ls.mean(1)]
    out["loss_drops"] = bool(ls.mean(1)[-1] < ls.mean(1)[0])

    # Streaming AUC: single-logit models score directly; multitask
    # models score their CTR head against the click label; DSSM scores
    # the user·item tower dot-product against the click label (its
    # in-batch-softmax training signal is ranking, the AUC checks it
    # transfers to pointwise click discrimination).
    probe = eval_step(ts, jax.tree.map(lambda x: x[0], eval_stacked))

    def score_and_label(o, b):
        if isinstance(o, dict) and "ctr" in o:
            return o["ctr"], b["click"]
        if isinstance(o, tuple) and len(o) == 2:
            u, v = o
            if getattr(u, "ndim", 0) == 2 and getattr(v, "ndim", 0) == 2:
                return jnp.sum(u * v, axis=1), b["label"]  # DSSM towers
            return jnp.reshape(u, (-1,)), b["label"]  # (logits, aux) pair
        return o, b["label"]

    if (hasattr(probe, "ndim") and probe.ndim == 1) or \
            isinstance(probe, (dict, tuple)):
        @jax.jit
        def eval_all(ts_, se):
            def body(auc, b):
                logits, labels = score_and_label(eval_step(ts_, b), b)
                return metricslib.auc_update(auc, logits, labels), None
            auc, _ = jax.lax.scan(body, metricslib.auc_init(), se)
            return auc

        auc = eval_all(ts, eval_stacked)
        jax.block_until_ready(auc)
        out["auc"] = round(float(metricslib.auc_result(auc)), 4)
    return out


def _campaign(names, steps, argv_tail):
    """One subprocess per model (clean device/memory per run); collect
    rows into ZOO_AUC.json at the repo root."""
    import os
    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # fp32 campaign (the bf16-vs-fp32 parity twin) keeps its own file;
    # tools/zoo_delta.py merges the per-model deltas into ZOO_AUC.json.
    fname = "ZOO_AUC_FP32.json" if "--fp32" in argv_tail else "ZOO_AUC.json"
    out_path = os.path.join(here, fname)
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f)
        rows = [r for r in old.get("models", [])
                if r.get("metric", "").rsplit("_synthetic", 1)[0]
                not in names]
    # --seeds a,b,c : run every model once per seed and aggregate into
    # one row (auc = seed mean, plus per-seed detail) — the VERDICT-r4
    # "nothing is seed-averaged" fix.
    seeds = [0]
    if "--seeds" in argv_tail:
        i = argv_tail.index("--seeds")
        seeds = [int(s) for s in argv_tail[i + 1].split(",")]
        argv_tail = argv_tail[:i] + argv_tail[i + 2:]
    for name in names:
        cfg = CAMPAIGN.get("dlrm" if name == "dlrm_cat" else name, {})
        n_steps = cfg.get("steps", steps)
        cmd = [sys.executable, os.path.abspath(__file__), name,
               str(n_steps)] + argv_tail
        if "lr" in cfg and "--lr" not in argv_tail:
            cmd += ["--lr", str(cfg["lr"])]
        if "items" in cfg and "--items" not in argv_tail:
            cmd += ["--items", str(cfg["items"])]
        if "dense" in cfg and "--dense" not in argv_tail:
            cmd += ["--dense", str(cfg["dense"])]
        per_seed = []
        for seed in seeds:
            r = subprocess.run(cmd + ["--seed", str(seed)],
                               capture_output=True, text=True,
                               timeout=7200)
            lines = [l for l in r.stdout.splitlines()
                     if l.startswith("{")]
            per_seed.append(
                json.loads(lines[-1]) if lines else
                {"metric": f"{name}_synthetic_accuracy",
                 "error": (r.stderr.strip() or "no output")[-400:]})
        row = dict(per_seed[0])
        aucs = [r.get("auc") for r in per_seed
                if r.get("auc") is not None]
        if len(per_seed) > 1:
            row["n_seeds"] = len(per_seed)
            row["seeds"] = seeds
            if aucs:
                row["auc_seeds"] = aucs
                row["auc"] = round(float(np.mean(aucs)), 4)
                row["auc_spread"] = round(max(aucs) - min(aucs), 4)
            row["loss_drops"] = all(r.get("loss_drops")
                                    for r in per_seed
                                    if "loss_drops" in r)
            row.pop("seed", None)
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump({
                "note": ("Per-model end-to-end accuracy (tools/"
                         "zoo_auc.py): interaction/sequence-structured "
                         "synthetic streams (data/criteo.py, data/"
                         "behavior.py docstrings), reference-shaped "
                         "configs, fresh batches every epoch, held-out "
                         "streaming AUC. CPU backend = identical XLA "
                         "program as TPU (PARITY.md quirk note). "
                         "Synthetic Bayes-optimal AUC is ~0.85 "
                         "(criteo-like) — absolute numbers are "
                         "dataset-specific; the bar is clear lift over "
                         "chance on every architecture family."),
                "models": rows}, f, indent=1)


if __name__ == "__main__":
    name = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 and \
        sys.argv[2].isdigit() else 288
    # Drop only the steps positional — numeric FLAG VALUES must stay
    # paired with their flags.
    tail, skip = [], False
    for i, a in enumerate(sys.argv[2:]):
        if skip:
            tail.append(a)
            skip = False
        elif a.startswith("--"):
            tail.append(a)
            skip = i + 2 + 1 < len(sys.argv) and \
                not sys.argv[i + 3].startswith("--")
        elif not (i == 0 and a.isdigit()):
            tail.append(a)
    if name == "all":
        from deeprec_tpu.models.registry import ZOO
        _campaign(sorted(ZOO) + ["dlrm_cat"], steps, tail)
    elif "," in name:
        _campaign(name.split(","), steps, tail)
    else:
        print(json.dumps(run(
            name, steps, bf16="--fp32" not in sys.argv,
            batch=_arg("--batch", 4096), pool=_arg("--pool", 48),
            seed=_arg("--seed", 0))),
            flush=True)
