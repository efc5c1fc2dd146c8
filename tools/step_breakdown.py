"""Per-phase timing of the headline WDL train step — where does the
step budget actually go on this chip?

Times each phase of the embedding/train pipeline as its OWN device
program with the honest D2H fence (``block_until_ready`` acks on
enqueue through the tunneled runtime — PARITY.md), at the same shapes
the headline bench runs (B=16384, coalesced reference-shaped WDL:
~426k ids/step through one physical table):

  dedup      sort-based unique of the packed batch ids
  probe      hash-table find_or_insert on the uniques
  gather     row fetch values[slots]
  dense      forward + backward of the MLP towers (matmul-bound)
  apply      sparse optimizer row update (gather slots -> scatter rows)
  full       the production train step (cross-check: phases ~sum to it)

This is the measurement behind the "remaining step cost" claims in
PARITY.md — the reference's analog is its timeline/cost-model tooling
(``docs/Executor-Optimization.md``).

Usage: python tools/step_breakdown.py [--cpu] [--batch N] [--steps N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np


def _arg(flag, default, cast=int):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def timeit(fn, *args, n=20, warm=3):
    def fence(o):
        np.asarray(jax.device_get(jax.tree.leaves(o)[0].ravel()[0:1]))
    for _ in range(warm):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def main():
    import optax

    from deeprec_tpu.data.criteo import (CRITEO_HASH_BUCKETS,
                                         SyntheticCriteo)
    from deeprec_tpu.embedding import hash_table as ht
    from deeprec_tpu.embedding import lookup as lkup
    from deeprec_tpu.embedding import variable as ev
    from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
    from deeprec_tpu.models import wdl
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses
    from deeprec_tpu.utils import keys as keylib

    batch = _arg("--batch", 16384)
    steps = _arg("--steps", 20)

    cols = wdl.criteo_columns(embedding_dim=16, capacity=1 << 20,
                              reference_shapes=True, wide_in_deep=True)
    group = EmbeddingGroup(cols, coalesce=True)
    model = wdl.WDL(hidden=(1024, 512, 256), dtype=jnp.bfloat16)
    data = SyntheticCriteo(batch_size=batch, vocab=CRITEO_HASH_BUCKETS,
                           seed=0)
    afn = wdl.apply_fn(model, group)
    loss_fn = lambda out, b: losses.bce_with_logits(out, b["label"])
    opt = sopt.SparseAdagrad(learning_rate=0.05)
    tx = optax.adagrad(0.05)

    b = group.pack_batch(data.next_batch())

    @jax.jit
    def _init(states0, bb, key):
        _, gl = group.lookup_train(states0, bb, 0)
        embs = group.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        return model.init(key, embs, group.numeric_features(bb))["params"]

    states = group.create_state()
    params = _init(states, b, jax.random.key(0))
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(group, afn, loss_fn, opt, tx,
                                    donate=False)

    # Warm the table so probes/gathers hit a populated table (the
    # steady-state regime), then keep that state for every phase.
    for _ in range(3):
        ts, _ = step(ts, group.pack_batch(data.next_batch()))

    # Coalescing leaves one physical table per (dim, options) class —
    # reference-shaped WDL has several (dims 64/128 cannot merge).
    # Measure the indexed phases per table and report the sums; pick
    # the widest table for the representative per-phase rows.
    tnames = list(group.tables)
    n_ids = 0
    phases = {k: 0.0 for k in ("dedup", "probe_find", "gather")}
    per_table = {}
    dd_main = slots_main = None
    dedup_j = jax.jit(lkup.dedup)
    for tname in tnames:
        cfg = group.tables[tname]
        sid = b[group.PACKED_PREFIX + tname]
        qhi, qlo = sid.hi.reshape(-1), sid.lo.reshape(-1)
        n_t = int(qhi.shape[0])
        n_ids += n_t
        state0 = ts.ev[tname]

        t_dedup = timeit(dedup_j, qhi, qlo, n=steps)
        dd = dedup_j(qhi, qlo)

        probe_j = jax.jit(lambda st, hi, lo: ht.find(st.table, hi, lo))
        t_probe = timeit(probe_j, state0, dd.uhi, dd.ulo, n=steps)
        slots = probe_j(state0, dd.uhi, dd.ulo)

        gather_j = jax.jit(lambda vals, sl: vals[jnp.minimum(
            sl, vals.shape[0] - 1)])
        t_gather = timeit(gather_j, state0.values, slots, n=steps)

        per_table[tname] = {"ids": n_t, "dim": int(state0.values.shape[1]),
                            "dedup_ms": round(t_dedup * 1e3, 3),
                            "probe_ms": round(t_probe * 1e3, 3),
                            "gather_ms": round(t_gather * 1e3, 3)}
        phases["dedup"] += t_dedup
        phases["probe_find"] += t_probe
        phases["gather"] += t_gather
        if dd_main is None or n_t >= per_table[tnames[0]]["ids"]:
            tmain, dd_main, slots_main = tname, dd, slots
    tname, cfg = tmain, group.tables[tmain]
    dd = dd_main

    # One lookup pass (not timed here) to materialize the per-table
    # LookupResults (arrays only — GroupLookup itself carries column
    # metadata jit cannot return) and the combined per-column
    # embeddings the dense towers consume.
    @jax.jit
    def _lk(st, bb):
        _, gl_ = group.lookup_train(st, bb, 0)
        rows_ = {t: lk.rows for t, lk in gl_.lks.items()}
        return gl_.lks, group.combine(gl_, rows_)

    lks, embs = _lk(ts.ev, b)

    # Dense towers: forward+backward on fixed embeddings (the
    # matmul-bound part of the step; grads flow to params AND
    # embeddings like the real step).
    @jax.jit
    def dense_fwd_bwd(params_, embs_, bb):
        def f(p, e):
            return loss_fn(afn(p, e, bb), bb).mean()
        return jax.grad(f, argnums=(0, 1))(params_, embs_)

    phases["dense_fwd_bwd"] = timeit(dense_fwd_bwd, ts.params, embs, b,
                                     n=steps)

    # Sparse apply: optimizer row update at the step's row count,
    # summed over the physical tables like the indexed phases above.
    phases["sparse_apply"] = 0.0
    for t in tnames:
        cfg_t = group.tables[t]

        def apply_j(slots_tree, values, lk, _cfg=cfg_t):
            return opt.apply(_cfg, slots_tree, values, lk,
                             jnp.ones_like(lk.rows), 1, lr=None)

        t_apply = timeit(jax.jit(apply_j), ts.slots[t], ts.ev[t].values,
                         lks[t], n=steps)
        per_table[t]["apply_ms"] = round(t_apply * 1e3, 3)
        phases["sparse_apply"] += t_apply

    phases["full_step"] = timeit(
        lambda t_, bb: step(t_, bb)[1]["loss"], ts, b, n=steps)

    # Useful-bytes lower bounds for the indexed phases (what the phase
    # MUST move from/to HBM, ignoring probe overshoot and sort passes)
    # -> achieved useful-GB/s, the roofline framing for the
    # transaction-bound part of the step. v5e HBM peak ~ 819 GB/s.
    useful = {}
    for t in tnames:
        st = ts.ev[t]
        # phases run at the padded size: dedup outputs [n] unique slots
        # (EMPTY-padded), so probe/gather/apply all touch n entries.
        n_u = per_table[t]["ids"]
        dim = per_table[t]["dim"]
        vb = st.values.dtype.itemsize
        useful.setdefault("gather", 0)
        useful["gather"] += n_u * dim * vb
        useful.setdefault("probe_find", 0)
        useful["probe_find"] += n_u * 8          # one key-pair row/id
        useful.setdefault("sparse_apply", 0)
        useful["sparse_apply"] += 4 * n_u * dim * 4  # val+acc r/w fp32
        useful.setdefault("dedup", 0)
        useful["dedup"] += 4 * n_u * 8           # pairs through a sort
    gbps = {k: round(useful[k] / phases[k] / 1e9, 2)
            for k in useful if phases.get(k)}

    out = {
        "metric": "wdl_step_breakdown",
        "batch": batch,
        "ids_per_step": n_ids,
        "unique_ids_main_table": int(np.asarray(jax.device_get(
            (dd.uhi != keylib.EMPTY_HI).sum()))),
        "backend": jax.default_backend(),
        "per_table": per_table,
        "phases_ms": {k: round(v * 1e3, 3) for k, v in phases.items()},
        "useful_gbps_lower_bound": gbps,
        "phase_sum_ms": round(sum(v for k, v in phases.items()
                                  if k != "full_step") * 1e3, 3),
        "note": ("each phase is its own device program with a D2H "
                 "fence; dispatch overhead counted once per phase, so "
                 "the sum slightly overstates the fused step"),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
