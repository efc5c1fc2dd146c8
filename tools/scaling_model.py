"""Multi-chip scaling model: exact per-step exchange bytes + efficiency.

BASELINE.json's north star asks for >=85% scaling efficiency to 2 hosts.
No multi-chip hardware exists in this environment, so this tool bounds
the expected efficiency from first principles instead of vibes:

1. **Exact exchange-byte count.**  Every cross-chip byte of a training
   step is statically known from the group config: the sharded id
   exchange ships ``[S, K, 3]`` int32 (EV tables) or ``[S, K]`` int32
   (static tables) each way, and row payloads ``[S*K, dim]`` f32 back
   plus their gradient transpose.  This tool builds the EXACT bench
   model configs (reference-shaped WDL, EV and static variants) and
   counts those buffers per step per chip, as a function of shard
   count S.  Under weak scaling (fixed per-chip batch) ``S*K =
   ceil(cf*n/S)*S`` is ~constant, so per-chip exchange bytes are
   ~flat in S — the a2a cost does not grow with the mesh.

2. **Efficiency model.**  t_step(S) = t_compute + t_ici, with
   t_compute the MEASURED single-chip step time (BENCH_DETAIL.json)
   and t_ici = off-chip bytes / ICI bandwidth (no compute/comm overlap
   assumed — conservative; XLA overlaps a2a with independent work).
   Off-chip fraction of an all-to-all buffer is (S-1)/S.  Dense-grad
   psum bytes ride the same budget (2*(S-1)/S * param bytes).
   v5e ICI: 4 links/chip, ~400 Gbps between neighbors on the 2D torus;
   we use a conservative 100 GB/s effective per-chip injection
   bandwidth (and report bytes, so any other assumption is one
   division away).  Hosts in a v5e pod slice connect over ICI (DCN is
   only crossed between slices), so "2 hosts" = 16 chips, same fabric.

3. **Total-work anchor (1-core CPU mesh).**  This host has ONE core,
   so an 8-virtual-device mesh cannot show parallel speedup — but it
   CAN show the sharded program's total-work overhead: running the
   8-shard shard_map program and the single-device program on the SAME
   global batch on the same core, wall-clock ratio ~= extra work the
   sharded step performs (owner dedup, exchange packing, collectives'
   local memcpy).  Efficiency on real hardware is bounded below by
   1 / (overhead_ratio + t_ici/t_compute).

Usage:
  python tools/scaling_model.py            # byte model + efficiency
  python tools/scaling_model.py --anchor   # + 1-core CPU total-work run
Writes SCALING.json next to the repo root's SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH_PER_CHIP = 16384
CF = 2.0
# Conservative effective per-chip ICI injection bandwidth for v5e
# (4 links x ~50 GB/s usable each is the optimistic read; we halve it).
ICI_GBPS = 100e9
# Measured single-chip step times at B=16384 (BENCH_DETAIL.json r5):
#   EV headline 124,769 samples/s -> 131.3 ms; static 214,998 -> 76.2 ms.
T_COMPUTE = {"ev": 16384 / 124768.91, "static": 16384 / 214998.34}


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def per_peer(n: int, S: int) -> int:
    K = max(8, int(-(-n * CF // S)))
    return _round8(K)


def wdl_tables(static: bool):
    """(name, n_ids_per_chip, unique_budget, dim, id_planes) per
    physical table of the bench WDL (coalesced, wide_in_deep for EV)."""
    from deeprec_tpu.data.criteo import (CRITEO_HASH_BUCKETS,
                                         WDL_EMBEDDING_DIMS)
    B = BATCH_PER_CHIP
    out = []
    if static:
        # Static tables coalesce by dim class; exchange ships ONE int32
        # slot plane; dedup budget = sum min(buckets, B) per class.
        for dim_class in (64, 128):
            cols = [i for i, d in enumerate(WDL_EMBEDDING_DIMS)
                    if d == dim_class]
            n = B * len(cols)
            u = sum(min(CRITEO_HASH_BUCKETS[i], B) for i in cols)
            out.append((f"static_dim{dim_class}", n, min(u + 1, n + 1),
                        dim_class, 1))
    else:
        # EV tables coalesce by dim class (wide_in_deep: dim+1);
        # exchange ships (hi, lo, count) planes and the send size is
        # the occurrence count n (dd arrays are n-sized).
        for dim_class in (64, 128):
            cols = [i for i, d in enumerate(WDL_EMBEDDING_DIMS)
                    if d == dim_class]
            n = B * len(cols)
            out.append((f"ev_dim{dim_class + 1}", n, n,
                        dim_class + 1, 3))
    return out


def dense_param_bytes():
    """WDL dense tower params (hidden 1024/512/256 over ~1.7k-dim
    input): psum'd every step."""
    in_dim = sum(d + 1 for d in (64,) * 14 + (128,) * 12) + 13
    dims = [in_dim, 1024, 512, 256, 1]
    n = sum(dims[i] * dims[i + 1] + dims[i + 1]
            for i in range(len(dims) - 1))
    return n * 4


def model(S: int, static: bool) -> dict:
    rows_bytes = ids_bytes = 0
    for name, n, u, dim, planes in wdl_tables(static):
        send_n = u if static else n   # static path dedups before send
        K = per_peer(send_n, S)
        SK = S * K
        # ids: one a2a each way of [S, K, planes] int32.
        ids_bytes += 2 * SK * planes * 4
        # rows: forward return a2a + backward grad a2a, [S*K, dim] f32.
        rows_bytes += 2 * SK * dim * 4
    off = (S - 1) / S
    a2a_off = (ids_bytes + rows_bytes) * off
    psum_off = 2 * off * dense_param_bytes()
    t_ici = (a2a_off + psum_off) / ICI_GBPS
    key = "static" if static else "ev"
    t_comp = T_COMPUTE[key]
    return {
        "config": key, "shards": S,
        "ids_bytes_per_chip_step": int(ids_bytes),
        "row_bytes_per_chip_step": int(rows_bytes),
        "offchip_bytes_per_chip_step": int(a2a_off + psum_off),
        "t_ici_ms": round(t_ici * 1e3, 3),
        "t_compute_ms": round(t_comp * 1e3, 2),
        "weak_scaling_efficiency": round(t_comp / (t_comp + t_ici), 4),
        "aggregate_samples_per_sec": int(
            S * BATCH_PER_CHIP / (t_comp + t_ici)),
    }


def anchor(n_steps: int = 6) -> dict:
    """1-core CPU total-work ratio: 8-shard program vs single-device
    program on the same global batch (B=1024 to keep CPU time sane).
    Each variant runs in its own subprocess so the virtual device count
    is set before JAX initializes."""
    import subprocess

    def child(mode):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        if mode == "mesh8":
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count=8")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--anchor-child", mode],
            capture_output=True, text=True, timeout=1800, env=env)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(f"anchor child {mode}: "
                               f"{r.stderr.strip()[-400:]}")
        return json.loads(lines[-1])

    r1 = child("single")
    r8 = child("mesh8")
    out = {
        "anchor": "1-core CPU mesh: 8 virtual devices timeshare one "
                  "core, so wall-clock ~= TOTAL work (not a speedup "
                  "measurement). Cost-model ratios compare the "
                  "sharded program's static per-step work (x8 "
                  "devices) against the single-device program on the "
                  "same global batch — the defensible overhead bound "
                  "(wall-clock on an oversubscribed core also counts "
                  "collective-emulation rendezvous).",
        "batch_global": 1024,
        "single_device_ms_per_step": round(r1["ms_per_step"], 1),
        "sharded8_ms_per_step": round(r8["ms_per_step"], 1),
        "wallclock_total_work_ratio": round(
            r8["ms_per_step"] / r1["ms_per_step"], 3),
    }
    if r1.get("flops_per_step") and r8.get("flops_per_step"):
        out["cost_model_flops_ratio"] = round(
            8 * r8["flops_per_step"] / r1["flops_per_step"], 3)
    if r1.get("bytes_per_step") and r8.get("bytes_per_step"):
        out["cost_model_bytes_ratio"] = round(
            8 * r8["bytes_per_step"] / r1["bytes_per_step"], 3)
    return out


def anchor_child(mode: str, n_steps: int = 6) -> None:
    import time

    import jax
    jax.config.update("jax_platforms", "cpu")
    import optax

    from deeprec_tpu.data.criteo import SyntheticCriteo
    from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
    from deeprec_tpu.models import wdl
    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.parallel.mesh import data_mesh
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses

    B = 1024
    cols = wdl.criteo_columns(embedding_dim=16, capacity=1 << 14,
                              reference_shapes=False, wide_in_deep=True)
    data = SyntheticCriteo(batch_size=B, vocab=20000, seed=0)
    loss_fn = lambda out, b: losses.bce_with_logits(out, b["label"])  # noqa

    model_ = wdl.WDL(hidden=(256, 128))
    single = EmbeddingGroup(cols, coalesce=True)
    b_init = single.pack_batch(data.next_batch())
    _, gl0 = single.lookup_train(single.create_state(), b_init, 0)
    embs0 = single.combine(
        gl0, {t: lk.rows for t, lk in gl0.lks.items()})
    params = model_.init(jax.random.key(0), embs0,
                         single.numeric_features(b_init))["params"]

    def build(num_shards, mesh):
        kw = (dict(axis_name="data", num_shards=num_shards)
              if num_shards > 1 else {})
        group = EmbeddingGroup(cols, coalesce=True, **kw)
        b0 = group.pack_batch(data.next_batch())
        opt = sopt.SparseAdagrad(0.05)
        tx = optax.adagrad(0.05)
        ts = trainlib.create_train_state(group, params, tx, opt)
        step = trainlib.make_train_step(
            group, wdl.apply_fn(model_, group), loss_fn, opt, tx,
            mesh=mesh, donate=False)
        return group, ts, step, b0

    def run(num_shards, mesh):
        group, ts, step, b0 = build(num_shards, mesh)
        compiled = step.lower(ts, b0).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        batches = [group.pack_batch(data.next_batch()) for _ in range(4)]
        ts, m = step(ts, batches[0])
        float(jax.device_get(m["loss"]))   # fence (drains the queue)
        t0 = time.perf_counter()
        for i in range(n_steps):
            ts, m = step(ts, batches[i % 4])
        float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / n_steps
        return dt, ca.get("flops"), ca.get("bytes accessed")

    assert jax.devices()[0].platform == "cpu", jax.devices()
    if mode == "single":
        t, flops, byts = run(1, None)
    else:
        assert len(jax.devices()) >= 8, jax.devices()
        t, flops, byts = run(8, data_mesh(8))
    print(json.dumps({"mode": mode, "ms_per_step": t * 1e3,
                      "flops_per_step": flops,
                      "bytes_per_step": byts}))


def main():
    if "--anchor-child" in sys.argv:
        anchor_child(sys.argv[sys.argv.index("--anchor-child") + 1])
        return
    out = {"rows": [model(S, st) for st in (False, True)
                    for S in (8, 16, 32, 256)],
           "notes": {
               "batch_per_chip": BATCH_PER_CHIP,
               "capacity_factor": CF,
               "ici_bytes_per_sec_assumed": ICI_GBPS,
               "t_compute_source": "BENCH_DETAIL.json round 5 "
                                   "(sync-fenced, real v5e chip)",
               "two_hosts": "16 chips, same ICI fabric (v5e pod "
                            "slice; DCN only between slices)",
           }}
    if "--anchor" in sys.argv:
        out["cpu_anchor"] = anchor()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
