"""Microbenchmarks: Pallas fused sparse-apply vs the XLA lowering, and
the embedding lookup/probe path — the reference's op-level speedup
table (``docs/Operator-Optimization.md:20-30``) role.

Usage: python tools/kernel_benchmark.py [n_rows ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=50, warm=5):
    def fence(o):
        # block_until_ready acks on enqueue through the tunneled
        # runtime (round-2 finding); a small dependent D2H is the only
        # real fence — it drains the device queue.
        np.asarray(jax.device_get(jax.tree.leaves(o)[0].ravel()[0:1]))
    for _ in range(warm):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / n


def bench_sparse_apply(C=1 << 17, D=128, n=65536):
    from deeprec_tpu.ops.pallas import sparse_apply as sa

    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    accum = jnp.asarray(rng.uniform(0.1, 1.0, size=(C + 1, D)),
                        jnp.float32)
    slots = jnp.asarray(rng.choice(C, size=n, replace=False), jnp.int32)
    grads = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)

    ref = jax.jit(sa.adagrad_apply_rows_reference)
    t_ref = timeit(ref, values, accum, slots, grads, 0.1)
    t_pal = timeit(sa.adagrad_apply_rows, values, accum, slots, grads,
                   0.1)
    # Correctness cross-check on device.
    v1, a1 = sa.adagrad_apply_rows(values, accum, slots, grads, 0.1)
    v2, a2 = ref(values, accum, slots, grads, 0.1)
    ok = bool(jnp.allclose(v1, v2, rtol=1e-5, atol=1e-6)
              & jnp.allclose(a1, a2, rtol=1e-5, atol=1e-6))
    print(json.dumps({
        "metric": "sparse_adagrad_apply", "rows": n, "dim": D,
        "xla_us": round(t_ref * 1e6, 1),
        "pallas_us": round(t_pal * 1e6, 1),
        "speedup": round(t_ref / t_pal, 3), "match": ok,
    }), flush=True)


def bench_adam(C=1 << 17, D=128, n=65536):
    from deeprec_tpu.ops.pallas import sparse_apply as sa

    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    m = jnp.asarray(rng.normal(0, 0.1, size=(C + 1, D)), jnp.float32)
    v = jnp.asarray(rng.uniform(0, 0.1, size=(C + 1, D)), jnp.float32)
    slots = jnp.asarray(rng.choice(C, size=n, replace=False), jnp.int32)
    grads = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
    args = (0.01, 0.9, 0.999, 1e-8)

    ref = jax.jit(sa.adam_apply_rows_reference)
    t_ref = timeit(ref, values, m, v, slots, grads, *args)
    t_pal = timeit(sa.adam_apply_rows, values, m, v, slots, grads, *args)
    o1 = sa.adam_apply_rows(values, m, v, slots, grads, *args)
    o2 = ref(values, m, v, slots, grads, *args)
    ok = all(bool(jnp.allclose(a, b, rtol=1e-5, atol=1e-6))
             for a, b in zip(o1, o2))
    print(json.dumps({
        "metric": "sparse_adam_apply_3slot", "rows": n, "dim": D,
        "xla_us": round(t_ref * 1e6, 1),
        "pallas_us": round(t_pal * 1e6, 1),
        "speedup": round(t_ref / t_pal, 3), "match": ok,
    }), flush=True)


def bench_lookup(C=1 << 20, n=1 << 17, max_probes=64):
    from deeprec_tpu import config as cfg
    from deeprec_tpu.embedding import hash_table as ht
    from deeprec_tpu.embedding import variable as ev
    from deeprec_tpu.utils import keys as keylib

    tc = cfg.TableConfig(name="b", dim=16, capacity=C,
                         max_probes=max_probes)
    state = ev.create(tc)
    rng = np.random.default_rng(0)
    ids = rng.integers(1, C // 2, size=n).astype(np.int64)
    hi, lo = keylib.split_ids(ids)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)

    ins = jax.jit(lambda s, h, l: ht.find_or_insert(
        s, h, l, jnp.ones(n, bool), max_probes=max_probes)[0])
    state = state.replace(table=ins(state.table, hi, lo))

    find = jax.jit(lambda t, h, l: ht.find(t, h, l,
                                           max_probes=max_probes))
    t_find = timeit(find, state.table, hi, lo)
    gather = jax.jit(lambda v, s: v[jnp.minimum(s, C)])
    slots = find(state.table, hi, lo)
    t_gather = timeit(gather, state.values, slots)
    print(json.dumps({
        "metric": "hash_find+gather", "ids": n, "capacity": C,
        "max_probes": max_probes,
        "find_us": round(t_find * 1e6, 1),
        "gather_us": round(t_gather * 1e6, 1),
    }), flush=True)


def bench_gather(C=1 << 20, D=128, n=1 << 18):
    """Pallas per-row-DMA gather vs the XLA gather — the embedding
    fetch, THE dominant op of a reference-shaped recsys step."""
    from deeprec_tpu.ops.pallas import gather as pg

    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    slots = jnp.asarray(rng.integers(0, C, size=n), jnp.int32)

    xla = jax.jit(lambda v, s: v[jnp.minimum(s, C)])
    # Correctness on the compiled path before timing.
    small = jnp.asarray(rng.integers(0, C, size=2048), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(pg.gather_rows(values, small)),
        np.asarray(xla(values, small)))
    t_xla = timeit(xla, values, slots)
    t_pal = timeit(pg.gather_rows, values, slots)
    print(json.dumps({
        "metric": "gather_rows", "rows": n, "capacity": C, "dim": D,
        "xla_ms": round(t_xla * 1e3, 2),
        "pallas_ms": round(t_pal * 1e3, 2),
        "speedup": round(t_xla / t_pal, 2),
        "pallas_ns_per_row": round(t_pal / n * 1e9, 1),
    }), flush=True)


def main():
    # Each bench in its own process: leftover multi-GB table buffers
    # push the device into host-spill mode and poison later timings.
    if len(sys.argv) > 1:
        which = sys.argv[1]
        if which == "apply":
            bench_sparse_apply(n=int(sys.argv[2]))
        elif which == "adam":
            bench_adam(n=int(sys.argv[2]))
        elif which == "lookup":
            bench_lookup(max_probes=int(sys.argv[2]))
        elif which == "gather":
            bench_gather(D=int(sys.argv[2]))
        return
    import subprocess
    jobs = [("apply", "65536"), ("adam", "65536"), ("lookup", "64"),
            ("lookup", "16")]
    for job in jobs:
        r = subprocess.run([sys.executable, sys.argv[0], *job],
                           capture_output=True, text=True, timeout=900)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)


if __name__ == "__main__":
    main()
