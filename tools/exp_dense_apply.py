"""Dense-apply experiment: is a full-table optimizer sweep cheaper
than the indexed (unique-compacted) apply at headline shapes?

Motivation (round-4 step breakdown): the unique-compaction machinery
plus the indexed gather/apply at the static budget U dominate the EV
step once probing is bucket-row based.  For g=0 rows Adagrad/SGD/FTRL
are exact no-ops, so the apply can be:

  gbuf = zeros[C+1, dim].at[occ_slots].add(occ_grads)   # n indices
  acc += gbuf**2 ; values -= lr * gbuf * rsqrt(acc)     # dense sweep

which trades 4*U indexed row ops for ~6*C*dim*4B of streaming HBM
traffic — and deletes the whole rep/compaction pipeline (cumsum,
u_of scatter, stacked gathers) from the lookup.

Measures, per headline table shape:
  occ_gather      values[occ_slots]                  (fwd, dense path)
  u_gather        values[u_slots] + u_rows[inverse]  (fwd, current)
  indexed_apply   gather/scatter adagrad at U        (bwd, current)
  dense_apply     scatter-add + dense sweep          (bwd, proposed)

Usage: python tools/exp_dense_apply.py [--cpu]
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


def timeit(fn, *args, n=10, warm=2):
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


def bench_shape(name, C, dim, n, U, n_true_unique, res):
    rng = np.random.default_rng(0)
    uniq = rng.choice(C, size=n_true_unique, replace=False)
    occ_slots = jnp.asarray(rng.choice(uniq, size=n), jnp.int32)
    u_slots = jnp.asarray(
        np.concatenate([uniq, np.full(U - n_true_unique, C)])[:U],
        jnp.int32)
    inverse = jnp.asarray(rng.integers(0, n_true_unique, size=n),
                          jnp.int32)
    values = jnp.asarray(rng.normal(size=(C + 1, dim)), jnp.float32)
    acc = jnp.abs(jnp.asarray(rng.normal(size=(C + 1, dim)), jnp.float32))
    u_acc = acc[:U]
    occ_g = jnp.asarray(rng.normal(size=(n, dim)), jnp.float32)
    u_g = jnp.asarray(rng.normal(size=(U, dim)), jnp.float32)

    def occ_gather(v, s):
        return v[s]

    def u_gather_plus_occ(v, us, inv):
        urows = v[us]
        return urows[inv]

    def indexed_apply(v, a, us, g):
        rows_a = a[us] + g * g
        rows_v = v[us] - 0.05 * g * jax.lax.rsqrt(rows_a + 1e-8)
        sidx = jnp.where(us < C, us, C + 1)
        return (v.at[sidx].set(rows_v, mode="drop"),
                a.at[sidx].set(rows_a, mode="drop"))

    def dense_apply(v, a, os_, g):
        gbuf = jnp.zeros_like(v).at[os_].add(g, mode="drop")
        a2 = a + gbuf * gbuf
        v2 = v - 0.05 * gbuf * jax.lax.rsqrt(a2 + 1e-8)
        return v2, a2

    r = {}
    r["occ_gather_ms"] = 1e3 * timeit(jax.jit(occ_gather), values,
                                      occ_slots)
    r["u_gather_plus_occ_ms"] = 1e3 * timeit(
        jax.jit(u_gather_plus_occ), values, u_slots, inverse)
    r["indexed_apply_U_ms"] = 1e3 * timeit(
        jax.jit(indexed_apply), values, acc, u_slots, u_g)
    r["dense_apply_ms"] = 1e3 * timeit(
        jax.jit(dense_apply), values, acc, occ_slots, occ_g)
    r.update(C=C, dim=dim, n=n, U=U, true_unique=n_true_unique)
    res[name] = {k: round(v, 3) if isinstance(v, float) else v
                 for k, v in r.items()}


def main():
    res = {"backend": jax.default_backend()}
    # Headline WDL coalesced tables (bench.py reference shapes, B=16384)
    bench_shape("dim129_nobudget", C=1 << 20, dim=129, n=131072,
                U=131073, n_true_unique=12068, res=res)
    bench_shape("dim65_budget", C=1 << 20, dim=65, n=294912,
                U=67265, n_true_unique=21106, res=res)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
