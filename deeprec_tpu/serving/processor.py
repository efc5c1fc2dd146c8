"""Serving: model loading, delta updates, scoring.

Rebuild of the reference's serving processor
(``serving/processor/serving/processor.h:4-12`` C ABI,
``model_instance.h:26-180`` full/delta model updates,
``docs/Processor.md``):

  * ``ServingModel`` = Model/ModelImpl + LocalSessionInstance: holds the
    jitted scoring function and the restored TrainState; applies
    **full** and **delta (incremental-checkpoint)** updates atomically
    and supports version rollback (restore at an older step).
  * ``ModelWatcher`` = the ModelStore polling thread: watches the
    checkpoint directory and swaps new versions in asynchronously.
  * ``HttpScorer`` = the user-RPC boundary (the reference ships a C ABI
    for arbitrary RPC frameworks; here a stdlib HTTP/JSON front plays
    that role — swap in any server, ``predict`` is thread-safe).
  * SessionGroup's job (saturating hardware with concurrent sessions
    over shared variables) is inherent here: one device-resident state
    serves all threads, XLA queues the scoring calls.

Inference lookups never mutate tables (no insert/count), matching the
reference's serving graph rewrite (EV ops -> read-only lookups,
``serving/processor/framework/graph_optimizer.cc``).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train.checkpoint import CheckpointManager
from deeprec_tpu.train.loop import TrainState


class ServingModel:
    """A servable model version with atomic full/delta updates."""

    def __init__(self, group: EmbeddingGroup, apply_fn: Callable,
                 ts_template: TrainState, ckpt_dir: str,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.group = group
        self._mgr = CheckpointManager(ckpt_dir, group)
        self._eval = trainlib.make_eval_step(group, apply_fn, mesh=mesh)
        self._lock = threading.Lock()
        self._ts = ts_template
        self._version: Optional[int] = None
        self._applied: set[str] = set()

    @property
    def version(self) -> Optional[int]:
        return self._version

    # -- updates ----------------------------------------------------------
    def full_update(self, step: Optional[int] = None) -> int:
        """Load the newest (or a specific) full checkpoint + its deltas.
        Passing an older ``step`` is version rollback."""
        ts = self._mgr.restore(self._ts, step=step)
        with self._lock:
            self._ts = ts
            self._version = int(jax.device_get(ts.step))
            self._applied = set()
        return self._version

    def delta_update(self) -> Optional[int]:
        """Apply incremental checkpoints newer than the current version
        without reloading the full model (the DeltaModelUpdate path)."""
        cur = self._version
        if cur is None:
            return self.full_update()
        incrs = [s for s in self._mgr._steps("incr") if s > cur]
        if not incrs:
            return None
        ts = self._ts
        for s in incrs:
            ts = self._mgr._apply(ts, f"incr-{s}", full=False)
        with self._lock:
            self._ts = ts
            self._version = incrs[-1]
        return self._version

    # -- scoring ----------------------------------------------------------
    def predict(self, batch: Dict[str, Any]):
        with self._lock:
            ts = self._ts
        return self._eval(ts, batch)

    def warmup(self, batches) -> float:
        """Compile-and-prime with representative request batches before
        taking traffic (the processor's warmup-file role,
        ``docs/Processor.md``). Returns seconds spent."""
        t0 = time.perf_counter()
        out = None
        for b in batches:
            out = self.predict(b)
        if out is not None:
            jax.block_until_ready(out)
        return time.perf_counter() - t0


class ModelWatcher:
    """Poll the checkpoint dir; apply full updates on new full ckpts and
    delta updates on new incrementals (the ModelStore poller)."""

    def __init__(self, model: ServingModel, interval_s: float = 10.0):
        self._model = model
        self._interval = interval_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def poll_once(self):
        latest_full = self._model._mgr.latest_step()
        cur = self._model.version
        if latest_full is not None and (cur is None or latest_full > cur):
            self._model.full_update()
        else:
            self._model.delta_update()

    def start(self):
        def run():
            while not self._stop.wait(self._interval):
                try:
                    self.poll_once()
                except Exception as e:  # keep serving on update failure
                    print(f"[ModelWatcher] update failed: {e}")

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)


class HttpScorer:
    """JSON scoring endpoint.

    POST /v1/predict  {"instances": [...]} -> {"predictions": [...]}
    GET  /healthz     -> {"status": "ok", "version": N}

    ``parse_request`` maps the decoded JSON to a framework batch dict;
    ``format_response`` maps model outputs to JSON-serializable data
    (default: sigmoid scores list).
    """

    def __init__(self, model: ServingModel,
                 parse_request: Callable[[Any], Dict],
                 format_response: Optional[Callable] = None,
                 host: str = "0.0.0.0", port: int = 0):
        self._model = model
        fmt = format_response or (lambda out: {
            "predictions": (1.0 / (1.0 + np.exp(
                -np.asarray(jax.device_get(out), np.float64)))).tolist()})
        scorer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok",
                                     "version": scorer._model.version})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/predict":
                    self._send(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n))
                    batch = parse_request(req)
                    out = scorer._model.predict(batch)
                    self._send(200, fmt(out))
                except Exception as e:
                    self._send(400, {"error": str(e)})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def start(self):
        self._thread.start()

    def stop(self):
        self._server.shutdown()
