"""Subprocess driver: one task of the 2-process CPU cluster.

Usage: python _twoprocess_driver.py <coordinator_port> <process_id>

Initializes `jax.distributed` with 4 local virtual CPU devices (global
mesh = 8 devices over 2 processes), runs the shared sharded train step
on its half of the global batch, and prints per-step losses as one
JSON line prefixed with ``LOSSES``.
"""

import json
import os
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["JAX_PLATFORMS"] = "cpu"

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                      # _twoprocess_common
    sys.path.insert(0, os.path.dirname(here))     # repo root

    import jax
    jax.config.update("jax_platforms", "cpu")
    from deeprec_tpu.parallel import multihost
    multihost.initialize(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import _twoprocess_common as common

    from deeprec_tpu.feature_column.feature_column import SparseIds

    mesh = multihost.global_data_mesh()
    group, ts, step = common.build_group_and_step(mesh)

    losses = []
    half = common.B_GLOBAL // 2
    for i in range(common.N_STEPS):
        ids, label = common.global_batch_np(i)
        lo, hi = pid * half, (pid + 1) * half
        host_batch = {"f": SparseIds.from_numpy(ids[lo:hi]),
                      "label": label[lo:hi]}
        gb = multihost.host_local_to_global(mesh, host_batch)
        ts, m = step(ts, gb)
        losses.append(float(jax.device_get(m["loss"])))
    print("LOSSES " + json.dumps(losses), flush=True)


if __name__ == "__main__":
    main()
