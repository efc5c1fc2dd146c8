"""Headline benchmark: WDL on (synthetic) Criteo, samples/sec.

Mirrors the reference harness semantics (``tests/model_benchmark/
config.yaml``: throughput measured between steps 100 and 110, samples/s
= steps/s * batch).  Baseline: DeepRec's best published WDL number,
22,788.93 samples/s FP32+BF16 on an 8-vCPU Xeon PS-style host
(``modelzoo/WDL/README.md:182-215``; BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax

BASELINE_WDL = 22788.93  # DeepRec FP32+BF16, modelzoo/WDL/README.md
BATCH = 16384  # saturates the chip; 4096 is dispatch-latency-bound
WARMUP_STEPS = 100
MEASURE_STEPS = 10


def main():
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from deeprec_tpu.models import wdl
    from deeprec_tpu.train import loop as trainlib

    group, model, data, ts, afn, loss_fn, opt, tx, _ = _build(
        BATCH, capacity=1 << 20, dim=16, hidden=(1024, 512, 256),
        vocab=200_000)
    # BF16 compute mode — the reference's headline WDL row is FP32+BF16
    # (fp32 params, bf16 activations; docs/BFloat16.md).
    model = wdl.WDL(hidden=(1024, 512, 256), dtype=jnp.bfloat16)
    afn = wdl.apply_fn(model, group)
    step = trainlib.make_train_step(group, afn, loss_fn, opt, tx)

    # Pre-generate host batches so the measurement isolates framework +
    # device throughput (the reference harness likewise reads from a
    # pre-staged local dataset). pack_batch collapses the per-column
    # pytree to a few leaves — dispatch cost matters on a 1-core host.
    batches = [group.pack_batch(data.next_batch()) for _ in range(8)]

    for i in range(WARMUP_STEPS):
        ts, m = step(ts, batches[i % len(batches)])
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        ts, m = step(ts, batches[i % len(batches)])
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = BATCH * MEASURE_STEPS / dt
    print(json.dumps({
        "metric": "wdl_criteo_samples_per_sec",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_WDL, 3),
    }))


if __name__ == "__main__":
    main()
