"""The embeddable C ABI serving processor (VERDICT r1 item 7).

``libdeeprec_processor.so`` exports ``initialize`` / ``process`` /
``batch_process`` (the reference's deliverable,
``serving/processor/serving/processor.h:4-12``).  The test drives the
full chain: train + checkpoint -> dlopen the .so -> initialize spawns
the serving worker -> process() scores over the ABI -> results match
in-process scoring.  The C client SDK then talks to the same worker,
closing the loop from native client to native ABI.
"""

import json
import os
import pathlib
import subprocess

import numpy as np
import pytest

import _serving_entry as entry_mod
from deeprec_tpu.serving import native as proc_native

HERE = pathlib.Path(__file__).parent
REPO = HERE.parent


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    import jax.numpy as jnp
    import optax

    from deeprec_tpu.optimizers import sparse as sopt
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses
    from deeprec_tpu.train.checkpoint import CheckpointManager

    tmp = tmp_path_factory.mktemp("abi")
    parts = entry_mod.build({})
    group, afn, ts = (parts["group"], parts["apply_fn"],
                      parts["ts_template"])
    opt = sopt.SparseAdagrad()
    tx = optax.adagrad(0.05)
    step = trainlib.make_train_step(
        group, afn, lambda o, b: losses.bce_with_logits(o, b["label"]),
        opt, tx, donate=False)
    r = np.random.default_rng(1)
    for i in range(4):
        ids = r.integers(0, 40, size=(8, 2)).astype(np.int64)
        from deeprec_tpu.feature_column.feature_column import SparseIds
        b = {"x": jnp.asarray(r.normal(size=8).astype(np.float32)),
             "item": SparseIds.from_numpy(ids),
             "label": jnp.asarray((r.random(8) < 0.5)
                                  .astype(np.float32))}
        ts, _ = step(ts, b)
    mgr = CheckpointManager(str(tmp / "ckpt"), group)
    mgr.save(ts)
    return tmp, parts, ts


def _request():
    return {"instances": [{"x": 0.5, "item": [3, 7]},
                          {"x": -1.0, "item": [11]}]}


def _expected(parts, ts):
    import jax

    from deeprec_tpu.train import loop as trainlib

    batch = parts["parse_request"](_request())
    out = trainlib.make_eval_step(parts["group"],
                                  parts["apply_fn"])(ts, batch)
    return 1.0 / (1.0 + np.exp(-np.asarray(jax.device_get(out),
                                           np.float64)))


@pytest.fixture(scope="module")
def processor(trained_ckpt):
    tmp, parts, ts = trained_ckpt
    if proc_native.load() is None:
        pytest.skip(f"toolchain unavailable: {proc_native.build_error()}")
    env_pp = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [str(REPO), str(HERE)] + ([env_pp] if env_pp else []))
    p = proc_native.Processor(
        "_serving_entry",
        {"checkpoint_dir": str(tmp / "ckpt"), "platform": "cpu"})
    yield p
    p.close()
    os.environ["PYTHONPATH"] = env_pp


def test_process_scores_match_inprocess(processor, trained_ckpt):
    tmp, parts, ts = trained_ckpt
    resp = processor.process(_request())
    np.testing.assert_allclose(resp["predictions"],
                               _expected(parts, ts), rtol=1e-5)


def test_batch_process_and_model_info(processor, trained_ckpt):
    tmp, parts, ts = trained_ckpt
    outs = processor.batch_process([_request(), _request()])
    want = _expected(parts, ts)
    for o in outs:
        np.testing.assert_allclose(o["predictions"], want, rtol=1e-5)
    info = processor.model_info()
    assert info["status"] == "ok" and info["version"] == 4


def test_c_client_sdk_against_abi_worker(processor, trained_ckpt, tmp_path):
    """End-to-end native loop: the C client SDK scores against the
    worker the C ABI spawned (its port comes from model_info's
    transport — we reach it via the processor handle's HTTP port)."""
    tmp, parts, ts = trained_ckpt
    sdk = REPO / "deeprec_tpu/serving/sdk/c"
    exe = tmp_path / "abi_client"
    src = tmp_path / "main.c"
    host, port = processor.endpoint()
    assert host == "127.0.0.1" and port > 0
    src.write_text(r'''
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "deeprec_client.h"
int main(int argc, char** argv) {
  dr_client c;
  if (dr_client_init(&c, argv[1], atoi(argv[2]), 20000)) return 2;
  char buf[65536];
  if (dr_health(&c, buf, sizeof buf)) return 3;
  if (!strstr(buf, "\"ok\"")) return 4;
  const char* req = "{\"instances\": [{\"x\": 0.5, \"item\": [3, 7]},"
                    " {\"x\": -1.0, \"item\": [11]}]}";
  if (dr_predict(&c, req, buf, sizeof buf)) return 5;
  printf("%s\n", buf);
  return 0;
}
''')
    subprocess.run(
        ["gcc", "-O2", "-std=c99", "-I", str(sdk), "-o", str(exe),
         str(src), str(sdk / "deeprec_client.c")],
        check=True, capture_output=True)
    out = subprocess.run([str(exe), host, str(port)],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    resp = json.loads(out.stdout)
    np.testing.assert_allclose(resp["predictions"],
                               _expected(parts, ts), rtol=1e-5)
