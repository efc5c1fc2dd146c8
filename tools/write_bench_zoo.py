"""Assemble BENCH_ZOO.json from a model_benchmark JSONL run.

Usage: python tools/write_bench_zoo.py RUN.jsonl [RUN2.jsonl ...]
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    by_metric = {}
    for src in sys.argv[1:]:
        with open(src) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    r = json.loads(line)
                    old = by_metric.get(r.get("metric"))
                    # Last VALID row per model wins (reruns supersede
                    # tunnel-stall error rows).
                    if old is None or "value" in r:
                        by_metric[r["metric"]] = r
    rows = sorted(by_metric.values(), key=lambda r: r["metric"])
    # Inject per-model caveat notes for rows produced before ROW_NOTES
    # landed (subprocesses re-read the tool file mid-campaign).
    sys.path.insert(0, os.path.join(HERE, "tools"))
    from model_benchmark import ROW_NOTES
    for r in rows:
        name = r.get("metric", "").rsplit("_samples_per_sec", 1)[0]
        if name in ROW_NOTES and "note" not in r:
            r["note"] = ROW_NOTES[name]
    doc = {
        "note": ("Per-model training throughput on ONE real TPU v5e "
                 "chip (tools/model_benchmark.py). Timing is "
                 "sync-fenced (a dependent D2H read drains the device "
                 "queue before t0 and closes the window — the round-2 "
                 "measurement correction in PARITY.md; "
                 "block_until_ready acks on enqueue on this tunneled "
                 "runtime and must not be trusted). Batches are "
                 "pre-packed; steps 100..130 measured (the reference "
                 "harness measures steps 100..110, "
                 "tests/model_benchmark/config.yaml). EV tables run "
                 "the reference-default metadata mode (no "
                 "record_freq/record_version). vs_baseline divides by "
                 "DeepRec's best published CPU number for that model "
                 "(BASELINE.md) where one exists; sequence-model rows "
                 "carry caveats where the synthetic feature set is "
                 "heavier than the reference dataset's."),
        "supersedes": ("the round-1 BENCH_ZOO.json dispatch-rate "
                       "numbers (6.5M-34M samples/s), which measured "
                       "host enqueue rate, not execution — disowned "
                       "by the round-2 correction and replaced here"),
        "rows": rows,
    }
    with open(os.path.join(HERE, "BENCH_ZOO.json"), "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {len(rows)} rows")


if __name__ == "__main__":
    main()
