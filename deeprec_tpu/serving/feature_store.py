"""Pluggable feature stores for distributed sparse serving.

Rebuild of ``serving/processor/storage/`` (``feature_store.h``
``IFeatureStoreMgr``, ``redis_feature_store.cc``): in remote-session
mode the embedding tables do NOT live on the serving host — lookups go
to an external KV store, only the dense model runs locally
(``model_instance.h:172`` RemoteSessionInstance).

Stores map ``(table_name, int64 id) -> float32 row``.  The Redis
implementation is gated on the ``redis`` package (not in the image);
the in-memory store is the test double the reference keeps for its
store tests and doubles as a single-process cache.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, Optional

import numpy as np

from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.train.loop import TrainState
import jax


class FeatureStore:
    """IFeatureStoreMgr interface."""

    def get_batch(self, table: str, ids: np.ndarray,
                  dim: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (found [n] bool, rows [n, dim] float32, zeros on miss)."""
        raise NotImplementedError

    def put_batch(self, table: str, ids: np.ndarray,
                  rows: np.ndarray) -> None:
        raise NotImplementedError

    def delete_table(self, table: str) -> None:
        raise NotImplementedError


class InMemoryFeatureStore(FeatureStore):
    """Thread-safe in-process store (the reference's store test double;
    also a local cache tier in front of Redis)."""

    def __init__(self):
        self._tables: Dict[str, Dict[int, np.ndarray]] = {}
        self._lock = threading.Lock()

    def get_batch(self, table, ids, dim):
        ids = np.asarray(ids, np.int64)
        rows = np.zeros((ids.shape[0], dim), np.float32)
        found = np.zeros(ids.shape[0], bool)
        t = self._tables.get(table)
        if t is None:
            return found, rows
        with self._lock:
            for j, i in enumerate(ids):
                r = t.get(int(i))
                if r is not None:
                    rows[j] = r
                    found[j] = True
        return found, rows

    def put_batch(self, table, ids, rows):
        ids = np.asarray(ids, np.int64)
        rows = np.asarray(rows, np.float32)
        with self._lock:
            t = self._tables.setdefault(table, {})
            for i, r in zip(ids, rows):
                t[int(i)] = r.copy()

    def delete_table(self, table):
        with self._lock:
            self._tables.pop(table, None)

    def num_rows(self, table: str) -> int:
        return len(self._tables.get(table, {}))


class RedisFeatureStore(FeatureStore):
    """Redis-backed store (``redis_feature_store.cc`` analog).

    Key layout: ``{prefix}/{table}/{id}`` -> raw float32 row bytes,
    matching the reference's binary-value scheme.  Uses the ``redis``
    client package when installed, else the built-in dependency-free
    RESP2 client (``serving/resp.py``) — both speak to any real Redis
    server; tests run against the in-process
    :class:`~deeprec_tpu.serving.resp.MiniRedisServer`.
    """

    def __init__(self, url: str = "redis://localhost:6379/0",
                 prefix: str = "deeprec"):
        try:
            import redis  # noqa: PLC0415 — optional dependency
            self._r = redis.from_url(url)
        except ImportError:
            from deeprec_tpu.serving.resp import RespClient
            self._r = RespClient.from_url(url)
        self._prefix = prefix

    def _key(self, table, i):
        return f"{self._prefix}/{table}/{int(i)}"

    def get_batch(self, table, ids, dim):
        ids = np.asarray(ids, np.int64)
        vals = self._r.mget([self._key(table, i) for i in ids])
        rows = np.zeros((ids.shape[0], dim), np.float32)
        found = np.zeros(ids.shape[0], bool)
        for j, v in enumerate(vals):
            if v is not None:
                rows[j] = np.frombuffer(v, np.float32)
                found[j] = True
        return found, rows

    def put_batch(self, table, ids, rows):
        pipe = self._r.pipeline()
        for i, r in zip(np.asarray(ids, np.int64),
                        np.asarray(rows, np.float32)):
            pipe.set(self._key(table, i), r.tobytes())
        pipe.execute()

    def delete_table(self, table):  # pragma: no cover - destructive
        for k in self._r.scan_iter(f"{self._prefix}/{table}/*"):
            self._r.delete(k)


# ---------------------------------------------------------------------------
# Publishing: push a trained model's sparse params into the store
# (the reference's remote-mode model update, model_instance.cc).
# ---------------------------------------------------------------------------

def publish_sparse(ts: TrainState, group: EmbeddingGroup,
                   store: FeatureStore,
                   min_version: Optional[int] = None) -> Dict[str, int]:
    """Write every live row (or rows touched since ``min_version`` — the
    delta-update path) into the store. Returns rows-written per table."""
    out = {}
    for tname, cfg in group.tables.items():
        state = jax.device_get(ts.ev[tname])
        shards = ([jax.tree.map(lambda x, s=s: x[s], state)
                   for s in range(group.num_shards)]
                  if group.num_shards > 1 else [state])
        n = 0
        for st in shards:
            arrs = ev.export_arrays(cfg, st)
            keys, values = arrs["keys"], arrs["values"]
            if min_version is not None and not cfg.static_buckets:
                # Static bucket tables have no touched-row recorder —
                # re-publish them in full on every delta (matching the
                # checkpoint's incremental semantics for them).
                keep = arrs["versions"] >= min_version
                keys, values = keys[keep], values[keep]
            store.put_batch(tname, keys, values)
            n += keys.shape[0]
        out[tname] = n
    return out


# ---------------------------------------------------------------------------
# Remote serving: sparse from the store, dense on the local device
# (RemoteSessionInstance, model_instance.h:172).
# ---------------------------------------------------------------------------

class RemoteServingModel:
    """Score with store-resident embeddings + a local dense model.

    ``apply_fn(params, embs, batch)`` is the same contract as training;
    bag combine happens host-side on the fetched rows (request batches
    are small, so host combine is cheap and saves a device upload of
    per-position rows).
    """

    def __init__(self, group: EmbeddingGroup, apply_fn: Callable,
                 params, store: FeatureStore,
                 cache: Optional[InMemoryFeatureStore] = None):
        self.group = group
        self.apply_fn = apply_fn
        self.params = params
        self.store = store
        self.cache = cache
        self._jitted = jax.jit(
            lambda p, embs, numerics: apply_fn(p, embs, numerics))

    def _fetch(self, table: str, ids: np.ndarray, dim: int):
        if self.cache is not None:
            found, rows = self.cache.get_batch(table, ids, dim)
            if found.all():
                return rows
            miss = ~found
            f2, r2 = self.store.get_batch(table, ids[miss], dim)
            rows[miss] = r2
            if f2.any():
                self.cache.put_batch(table, ids[miss][f2], r2[f2])
            return rows
        _, rows = self.store.get_batch(table, ids, dim)
        return rows

    def predict(self, batch):
        from deeprec_tpu.feature_column.feature_column import (
            SequenceEmbeddingColumn)
        from deeprec_tpu.utils import keys as keylib

        embs = {}
        for c in self.group.embedding:
            tname = self.group.physical_table_of(c)
            cfg = self.group.tables[tname]
            sid = batch[c.name]
            t_hi, t_lo = self.group.transform_ids(c, sid.hi, sid.lo)
            hi = np.asarray(t_hi)
            lo = np.asarray(t_lo)
            ids = keylib.join_ids(hi.reshape(-1), lo.reshape(-1))
            mask = ids != keylib.EMPTY_ID
            rows = np.zeros((ids.shape[0], cfg.dim), np.float32)
            if mask.any():
                rows[mask] = self._fetch(tname, ids[mask], cfg.dim)
            B, L = hi.shape
            rows = rows.reshape(B, L, cfg.dim)
            m = mask.reshape(B, L)
            if isinstance(c, SequenceEmbeddingColumn):
                embs[c.name] = (rows, m)
            else:
                s = rows.sum(axis=1)
                cnt = np.maximum(m.sum(axis=1), 1).astype(np.float32)
                if c.combiner == "sum":
                    embs[c.name] = s
                elif c.combiner == "mean":
                    embs[c.name] = s / cnt[:, None]
                else:  # sqrtn
                    embs[c.name] = s / np.sqrt(cnt)[:, None]
        return self._jitted(self.params, embs, batch)
