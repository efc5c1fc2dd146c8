"""Experiment: does slot-sorting speed up the row gather / scatter?

The step's indexed phases (probe/gather/apply) run at the platform's
per-row transaction rate (~100-200M indexed elements/s, PARITY.md).
Hash-distributed slots land in random HBM rows; if XLA's gather/scatter
engine merges ADJACENT row reads into wider DMAs, paying one sort to
present slots in ascending order could beat the random-order gather.
Also measures the dedup-free alternative (probe all occurrences, then
segment grads by slot) against the sort-based dedup.

Usage: python tools/exp_sorted_gather.py [--cpu]
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

import jax.numpy as jnp
import numpy as np


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


def bench_gather_order(C=1 << 20, D=128, n=1 << 17):
    rng = np.random.default_rng(0)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    slots_rand = jnp.asarray(rng.integers(0, C, size=n), jnp.int32)

    g = jax.jit(lambda v, s: v[s])

    @jax.jit
    def g_sorted(v, s):
        order = jnp.argsort(s)
        rows = v[s[order]]
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype))
        return rows[inv]

    @jax.jit
    def g_sorted_nounsort(v, s):
        return v[jnp.sort(s)]

    t_rand = timeit(g, values, slots_rand)
    t_sorted_pre = timeit(g, values, jnp.sort(slots_rand))
    t_sorted_incl = timeit(g_sorted, values, slots_rand)
    t_sort_gather = timeit(g_sorted_nounsort, values, slots_rand)
    ok = bool(jnp.array_equal(g(values, slots_rand),
                              g_sorted(values, slots_rand)))
    return {
        "metric": "gather_order", "rows": n, "dim": D, "capacity": C,
        "random_ms": round(t_rand * 1e3, 3),
        "presorted_ms": round(t_sorted_pre * 1e3, 3),
        "sort_gather_ms": round(t_sort_gather * 1e3, 3),
        "sort_gather_unsort_ms": round(t_sorted_incl * 1e3, 3),
        "match": ok,
    }


def bench_scatter_order(C=1 << 20, D=128, n=1 << 17):
    rng = np.random.default_rng(1)
    values = jnp.asarray(rng.normal(size=(C + 1, D)), jnp.float32)
    slots = jnp.asarray(rng.choice(C, size=n, replace=False), jnp.int32)
    grads = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)

    sc = jax.jit(lambda v, s, g: v.at[s].add(g))

    @jax.jit
    def sc_sorted(v, s, g):
        order = jnp.argsort(s)
        return v.at[s[order]].add(g[order])

    t_rand = timeit(sc, values, slots, grads)
    t_sorted_pre = timeit(sc, values, jnp.sort(slots),
                          grads)
    t_sorted_incl = timeit(sc_sorted, values, slots, grads)
    return {
        "metric": "scatter_order", "rows": n, "dim": D,
        "random_ms": round(t_rand * 1e3, 3),
        "presorted_ms": round(t_sorted_pre * 1e3, 3),
        "sort_scatter_ms": round(t_sorted_incl * 1e3, 3),
    }


def bench_dedup_vs_probe_all(C=1 << 20, n_occ=426000, n_uniq=131072):
    """Cost of sort-dedup(n_occ) vs probing n_occ ids directly."""
    from deeprec_tpu.embedding import hash_table as ht
    from deeprec_tpu.embedding import lookup as lkup
    from deeprec_tpu.utils import keys as keylib

    rng = np.random.default_rng(2)
    uniq = rng.choice(1 << 40, size=n_uniq, replace=False).astype(np.int64)
    occ = uniq[rng.integers(0, n_uniq, size=n_occ)]
    hi = jnp.asarray((occ >> 32).astype(np.int32))
    lo = jnp.asarray((occ & 0xFFFFFFFF).astype(np.int32))
    uh = jnp.asarray((uniq >> 32).astype(np.int32))
    ul = jnp.asarray((uniq & 0xFFFFFFFF).astype(np.int32))

    table = ht.create(C)
    table, _, _ = jax.jit(
        lambda t, a, b: ht.find_or_insert(t, a, b, jnp.ones_like(a, bool))
    )(table, uh, ul)

    dedup_j = jax.jit(lkup.dedup)
    find_j = jax.jit(lambda t, a, b: ht.find(t, a, b))

    t_dedup = timeit(dedup_j, hi, lo)
    dd = dedup_j(hi, lo)
    t_find_uniq_padded = timeit(find_j, table, dd.uhi, dd.ulo)
    t_find_all = timeit(find_j, table, hi, lo)
    uhs = jnp.asarray(np.sort(uniq) >> 32, jnp.int32)
    uls = jnp.asarray(np.sort(uniq) & 0xFFFFFFFF, jnp.int32)
    t_find_uniq_exact = timeit(find_j, table, uhs, uls)
    return {
        "metric": "dedup_vs_probe_all", "n_occ": n_occ, "n_uniq": n_uniq,
        "dedup_ms": round(t_dedup * 1e3, 3),
        "find_uniq_padded_ms": round(t_find_uniq_padded * 1e3, 3),
        "find_uniq_exact_ms": round(t_find_uniq_exact * 1e3, 3),
        "find_all_occ_ms": round(t_find_all * 1e3, 3),
        "dedup_plus_find": round((t_dedup + t_find_uniq_padded) * 1e3, 3),
    }


def main():
    for fn in (bench_gather_order, bench_scatter_order,
               bench_dedup_vs_probe_all):
        print(json.dumps(fn()), flush=True)
    for D in (16, 64):
        print(json.dumps(bench_gather_order(D=D)), flush=True)


if __name__ == "__main__":
    main()
