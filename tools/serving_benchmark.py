"""Serving latency/QPS benchmark — the reference's serving perf story
(``docs/SessionGroup.md`` motivates SessionGroup with QPS tables).

Measures single-request latency percentiles and saturated throughput
of the jitted scoring path (ServingModel.predict) for WDL at serving
batch sizes, plus the HTTP round trip through HttpScorer.

Usage: python tools/serving_benchmark.py [batch ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(batch_sizes):
    from __graft_entry__ import _build
    from deeprec_tpu.train import loop as trainlib

    group, model, data, ts, afn, loss_fn, opt, tx, _ = _build(
        max(batch_sizes), capacity=1 << 20, dim=16,
        hidden=(1024, 512, 256), vocab=200_000)
    eval_fns = {b: trainlib.make_eval_step(group, afn)
                for b in batch_sizes}
    return group, data, ts, eval_fns


def main():
    batch_sizes = [int(a) for a in sys.argv[1:]] or [1, 64, 512, 4096]
    group, data, ts, eval_fns = build(batch_sizes)

    for B in batch_sizes:
        full = data.next_batch()
        batch = jax.tree.map(lambda x: x[:B], full)
        fn = eval_fns[B]
        out = fn(ts, batch)
        np.asarray(jax.device_get(out))  # compile + real fence
        lat = []
        for _ in range(50):
            t0 = time.perf_counter()
            out = fn(ts, batch)
            # Serving returns scores to the client anyway, so the D2H
            # belongs in the latency (and is the only real fence on
            # this tunneled runtime — block_until_ready acks early).
            np.asarray(jax.device_get(out))
            lat.append(time.perf_counter() - t0)
        lat_ms = np.array(lat) * 1e3
        qps = B / np.mean(lat)
        print(json.dumps({
            "metric": "serving_latency_ms", "batch": B,
            "p50": round(float(np.percentile(lat_ms, 50)), 3),
            "p99": round(float(np.percentile(lat_ms, 99)), 3),
            "samples_per_sec": round(float(qps), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
