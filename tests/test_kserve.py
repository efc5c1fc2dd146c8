"""KServe v2 / Open Inference Protocol front end (the Triton-shim role,
``triton/tensorflow_backend_tf.cc``): metadata, readiness, and infer
round-trips driven through a real HTTP client."""

import json
import urllib.error
import urllib.request

import numpy as np
import optax
import pytest

from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.serving.kserve import KServeFrontend, TensorSpec
from deeprec_tpu.serving.processor import ServingModel
from deeprec_tpu.train import loop as trainlib

from tests.test_serving import _build, _mk


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, json.loads(r.read() or b"{}")


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def front(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("kserve")
    group, ts, step, afn, mgr = _build(tmp_path)
    for i in range(3):
        ts, _ = step(ts, _mk(i))
    mgr.save(ts)
    serving = ServingModel(group, afn, trainlib.create_train_state(
        group, ts.params, optax.adagrad(0.05), sopt.SparseAdagrad()),
        str(tmp_path / "ckpt"))
    serving.full_update()
    f = KServeFrontend(serving, "tiny", inputs=[
        TensorSpec("x", "numeric"),
        TensorSpec("item", "id", dims=(2,)),
    ])
    f.start()
    yield f, serving, group, afn, ts
    f.stop()


def test_metadata_and_health(front):
    f, serving, *_ = front
    base = f"http://127.0.0.1:{f.port}"
    code, meta = _get(base + "/v2")
    assert code == 200 and meta["name"] == "deeprec-tpu-serving"
    assert _get(base + "/v2/health/live")[0] == 200
    assert _get(base + "/v2/health/ready")[0] == 200
    code, m = _get(base + "/v2/models/tiny")
    assert code == 200
    assert m["platform"] == "deeprec_tpu"
    assert {i["name"]: i["datatype"] for i in m["inputs"]} == {
        "x": "FP32", "item": "INT64"}
    assert m["versions"] == [str(serving.version)]
    assert _get(base + "/v2/models/tiny/ready")[0] == 200


def test_infer_roundtrip_matches_local_predict(front):
    f, serving, group, afn, ts = front
    base = f"http://127.0.0.1:{f.port}"
    b = _mk(55, B=4)
    # SparseIds round-trip: rebuild raw 64-bit ids for the wire.
    from deeprec_tpu.utils import keys as keylib
    raw = keylib.join_ids(np.asarray(b["item"].hi).reshape(-1),
                          np.asarray(b["item"].lo).reshape(-1))
    req = {"id": "req-1", "inputs": [
        {"name": "x", "shape": [4], "datatype": "FP32",
         "data": np.asarray(b["x"]).tolist()},
        {"name": "item", "shape": [4, 2], "datatype": "INT64",
         "data": [int(v) for v in raw]},
    ]}
    code, resp = _post(base + "/v2/models/tiny/infer", req)
    assert code == 200
    assert resp["model_name"] == "tiny" and resp["id"] == "req-1"
    (out,) = resp["outputs"]
    assert out["datatype"] == "FP32" and out["shape"] == [4]
    local = serving.predict(b)
    expect = 1.0 / (1.0 + np.exp(-np.asarray(local, np.float64)))
    np.testing.assert_allclose(out["data"], expect.reshape(-1), rtol=1e-5,
                               atol=1e-6)


def test_infer_rejects_bad_requests(front):
    f, *_ = front
    base = f"http://127.0.0.1:{f.port}"
    # missing input
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v2/models/tiny/infer",
              {"inputs": [{"name": "x", "shape": [2],
                           "data": [0.1, 0.2]}]})
    assert ei.value.code == 400
    # undeclared input
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v2/models/tiny/infer",
              {"inputs": [{"name": "nope", "shape": [1], "data": [1]}]})
    assert ei.value.code == 400
    # unknown model
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base + "/v2/models/other/infer", {"inputs": []})
    assert ei.value.code == 404
