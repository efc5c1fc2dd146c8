"""HostKV / _NpIndex promotion-throughput microbench (VERDICT r1
item 9: vectorized host spill store must sustain >=10M ids/s batch
ops on one core — the round-1 dict-loop version capped at ~1M/s).

Usage: python tools/bench_hostkv.py [n_ids] [dim]
Prints one JSON line per operation.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from deeprec_tpu.embedding.multi_tier import HostKV

    kv = HostKV(dim, {"accum": (dim,)}, {"accum": np.float32})
    rng = np.random.default_rng(0)
    ids = rng.choice(np.int64(1) << 40, size=n, replace=False)
    vals = rng.normal(size=(n, dim)).astype(np.float32)
    freqs = np.ones(n, np.int32)
    vers = np.ones(n, np.int32)
    slots = {"accum": vals}

    chunk = 65536  # promotion-payload-sized batches
    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        sl = slice(s, s + chunk)
        kv.put_batch(ids[sl], vals[sl], freqs[sl], vers[sl],
                     {"accum": slots["accum"][sl]})
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "hostkv_put_ids_per_sec",
                      "value": round(n / dt, 0), "unit": "ids/s",
                      "n": n, "dim": dim}))

    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        kv.get_batch(ids[s:s + chunk])
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "hostkv_get_ids_per_sec",
                      "value": round(n / dt, 0), "unit": "ids/s"}))

    # The prepare_promotion hot path: contains over a mixed batch.
    probe = np.concatenate([ids[: n // 2],
                            rng.integers(1 << 41, 1 << 42, n // 2)])
    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        kv.contains_batch(probe[s:s + chunk])
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "hostkv_contains_ids_per_sec",
                      "value": round(n / dt, 0), "unit": "ids/s"}))

    t0 = time.perf_counter()
    for s in range(0, n, chunk):
        kv.delete_batch(ids[s:s + chunk])
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "hostkv_delete_ids_per_sec",
                      "value": round(n / dt, 0), "unit": "ids/s",
                      "len_after": len(kv)}))


if __name__ == "__main__":
    main()
