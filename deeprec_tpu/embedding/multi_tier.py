"""Multi-tier embedding storage: HBM hot shard + host-RAM spill tier.

TPU-native rebuild of DeepRec's multi-level storage manager
(``core/framework/embedding/multilevel_embedding.h:49-487``:
``StorageManager::GetOrCreate`` walks DRAM→PMEM/LevelDB/SSD tiers,
``BatchEviction`` (:421-463) moves cold rows down, ``cache.h`` LRU/LFU
ranks decide victims) and of its KV backends
(``lockless_hash_map.h``, ``leveldb_kv.h``, ``ssd_hashkv.h``).

The reference resolves tier misses *synchronously inside the lookup op*
on host threads.  A TPU step cannot take a host round-trip per miss, so
the tiers are re-designed around the input pipeline instead:

  * The **hot tier** is the fixed-capacity device ``EVState`` shard —
    every in-step lookup is HBM-only, exactly as fast as a single-tier
    table.
  * The **spill tier** (:class:`HostKV`) is a host-RAM dict-of-rows
    holding demoted keys (values + freq/version + optimizer slot rows).
  * **Promotion** rides the prefetch lookahead: while step *t* runs,
    the host sees the ids of batch *t+1* (the input pipeline already
    stages it — ``data/prefetch.py``), queries the spill tier, and
    builds a promotion payload; one scatter program re-materializes
    those rows in HBM before step *t+1* touches them.  This replaces
    the reference's blocking ``CopyBackToGPU`` path with work that
    overlaps device compute.
  * **Demotion** is the ``BatchEviction`` analog: when live occupancy
    exceeds the high watermark, the coldest rows (LRU = smallest
    version, LFU = smallest freq — the two ``BatchCache`` policies,
    ``cache.h:47,120``) move to the spill tier and their slots are
    tombstoned.

Round-trip invariant: a key's value/freq/version/optimizer-slot rows
survive demote→promote bit-exactly, so training resumes where it left
off — the property DeepRec's multi-tier storage exists to provide.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import hash_table as ht
from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.utils import keys as keylib


class HostKV:
    """Host-RAM spill store: id -> (value row, freq, version, slot rows).

    Plays the role of the reference's lower-tier KV backends
    (``leveldb_kv.h``, ``ssd_hashkv.h``); host RAM is the TPU host's
    equivalent of the PS machine's DRAM/PMEM.  Storage is columnar
    (one growing array per field) with an id->row dict index, so
    batch get/put are vectorized numpy ops.
    """

    GROW = 4096

    def __init__(self, dim: int, slot_shapes: Dict[str, tuple],
                 slot_dtypes: Dict[str, Any], value_dtype=np.float32):
        self._index: Dict[int, int] = {}
        self._free: list[int] = []
        self._cap = 0
        self._dim = dim
        self._value_dtype = value_dtype
        self._slot_shapes = dict(slot_shapes)
        self._slot_dtypes = dict(slot_dtypes)
        self._values = np.zeros((0, dim), value_dtype)
        self._freqs = np.zeros((0,), np.int32)
        self._versions = np.zeros((0,), np.int32)
        self._slots = {n: np.zeros((0,) + s, self._slot_dtypes[n])
                       for n, s in self._slot_shapes.items()}

    def __len__(self):
        return len(self._index)

    def __contains__(self, key: int):
        return int(key) in self._index

    def _grow(self, need: int):
        new_cap = self._cap + max(need, self.GROW)
        def g(a, shape):
            out = np.zeros((new_cap,) + shape, a.dtype)
            out[: self._cap] = a[: self._cap]
            return out
        self._values = g(self._values, (self._dim,))
        self._freqs = g(self._freqs, ())
        self._versions = g(self._versions, ())
        for n in self._slots:
            self._slots[n] = g(self._slots[n], self._slot_shapes[n])
        self._free.extend(range(self._cap, new_cap))
        self._cap = new_cap

    def put_batch(self, ids, values, freqs, versions,
                  slots: Dict[str, np.ndarray]):
        ids = np.asarray(ids, np.int64)
        n = ids.shape[0]
        if n == 0:
            return
        rows = np.empty(n, np.int64)
        need = sum(1 for i in ids if int(i) not in self._index)
        if need > len(self._free):
            self._grow(need - len(self._free))
        for j, i in enumerate(ids):
            k = int(i)
            r = self._index.get(k)
            if r is None:
                r = self._free.pop()
                self._index[k] = r
            rows[j] = r
        self._values[rows] = values
        self._freqs[rows] = freqs
        self._versions[rows] = versions
        for name, arr in slots.items():
            self._slots[name][rows] = arr

    def get_batch(self, ids):
        """Returns (hit_mask [n] bool, values, freqs, versions, slots) —
        non-hit rows are zeros."""
        ids = np.asarray(ids, np.int64)
        n = ids.shape[0]
        hit = np.zeros(n, bool)
        rows = np.zeros(n, np.int64)
        for j, i in enumerate(ids):
            r = self._index.get(int(i))
            if r is not None:
                hit[j] = True
                rows[j] = r
        values = np.where(hit[:, None], self._values[rows], 0).astype(
            self._value_dtype)
        freqs = np.where(hit, self._freqs[rows], 0).astype(np.int32)
        versions = np.where(hit, self._versions[rows], -1).astype(np.int32)
        slots = {n_: np.where(
            hit.reshape((-1,) + (1,) * len(self._slot_shapes[n_])),
            self._slots[n_][rows], 0).astype(self._slot_dtypes[n_])
            for n_ in self._slots}
        return hit, values, freqs, versions, slots

    def delete_batch(self, ids):
        for i in np.asarray(ids, np.int64):
            r = self._index.pop(int(i), None)
            if r is not None:
                self._free.append(r)

    def keys(self) -> np.ndarray:
        return np.fromiter(self._index.keys(), np.int64, len(self._index))

    def export(self):
        """Snapshot for checkpointing: same field layout as
        ``variable.export_arrays`` plus slot rows."""
        ids = self.keys()
        hit, values, freqs, versions, slots = self.get_batch(ids)
        out = {"keys": ids, "values": values, "freqs": freqs,
               "versions": versions}
        for n, a in slots.items():
            out[f"slot/{n}"] = a
        return out


@dataclasses.dataclass
class TierStats:
    promoted: int = 0
    demoted: int = 0
    spill_rows: int = 0
    hbm_live: int = 0


class TieredTable:
    """Tier orchestrator for one table shard (host-side object).

    Usage per training step (single-device; see class docstring for the
    sharded variant):

        payload = tiered.prepare_promotion(state, next_batch_ids)  # host
        state, slots = tiered.apply_promotion(state, slots, payload)
        ... run train step ...
        state, slots = tiered.maybe_demote(state, slots)           # host

    ``prepare_promotion`` can run on an input-pipeline thread while the
    device executes the previous step.
    """

    def __init__(self, cfg: cfglib.TableConfig,
                 slot_template: Dict[str, jax.Array],
                 policy: str = "lru",
                 high_watermark: float = 0.85,
                 low_watermark: float = 0.70,
                 promote_chunk: int = 4096):
        if policy not in ("lru", "lfu"):
            raise ValueError(f"policy must be lru|lfu, got {policy!r}")
        self.cfg = cfg
        self.policy = policy
        self.high = high_watermark
        self.low = low_watermark
        self.promote_chunk = promote_chunk
        shapes, dtypes = {}, {}
        for name, arr in slot_template.items():
            if hasattr(arr, "ndim") and arr.ndim >= 1 and \
                    arr.shape[0] == cfg.capacity + 1:
                shapes[name] = tuple(arr.shape[1:])
                dtypes[name] = np.dtype(str(arr.dtype))
        self.host = HostKV(cfg.dim, shapes, dtypes,
                           value_dtype=np.dtype(cfg.dtype))
        self.stats = TierStats()

    # -- promotion ---------------------------------------------------------
    def prepare_promotion(self, state: ev.EVState, ids: np.ndarray):
        """Host pass: of the upcoming ids, which live in the spill tier
        (and not in HBM)?  Returns a payload dict or None.

        ``ids`` are raw int64 feature ids (duplicates fine).
        """
        if len(self.host) == 0:
            return None
        ids = np.unique(np.asarray(ids, np.int64))
        ids = ids[np.isin(ids, (keylib.EMPTY_ID, keylib.TOMB_ID),
                          invert=True)]
        cand = ids[np.fromiter((int(i) in self.host._index for i in ids),
                               bool, len(ids))] if len(ids) else ids
        if cand.size == 0:
            return None
        # Skip ids already resident in HBM (demote→touch→promote race):
        # membership check against the device key arrays, on host.
        key_hi = np.asarray(state.table.key_hi)
        key_lo = np.asarray(state.table.key_lo)
        resident = set(keylib.join_ids(key_hi, key_lo)[
            ht.live_mask_np(key_hi, key_lo)].tolist())
        stale = np.array([i for i in cand.tolist() if i in resident],
                         np.int64)
        if stale.size:
            # A resident id's spill copy is stale (the HBM row is the
            # one being trained — e.g. a capped promotion let the lookup
            # re-insert it fresh). Drop it so checkpoints never carry
            # duplicate keys with conflicting values.
            self.host.delete_batch(stale)
        cand = np.array([i for i in cand.tolist() if i not in resident],
                        np.int64)
        if cand.size == 0:
            return None
        cand = cand[: self.promote_chunk]
        hit, values, freqs, versions, slots = self.host.get_batch(cand)
        assert hit.all()
        return {"ids": cand, "values": values, "freqs": freqs,
                "versions": versions, "slots": slots}

    def apply_promotion(self, state: ev.EVState,
                        slot_state: Dict[str, jax.Array], payload):
        """Scatter promoted rows into the device shard (one jitted
        insert+scatter program, the ``import_arrays`` path)."""
        if payload is None:
            return state, slot_state
        arrays = {"keys": payload["ids"], "values": payload["values"],
                  "freqs": payload["freqs"], "versions": payload["versions"]}
        extra = {}
        for n, a in payload["slots"].items():
            arrays[f"slot/{n}"] = a
            extra[n] = slot_state[n]
        state, extra, landed = ev.import_arrays(
            self.cfg, state, arrays,
            chunk=min(self.promote_chunk, 8192), extra_targets=extra,
            return_mask=True)
        slot_state = {**slot_state, **extra}
        # Only remove spill copies of rows that actually landed: if the
        # HBM shard filled up between demotions, the dropped rows keep
        # their trained values in the spill tier and retry next step.
        self.host.delete_batch(payload["ids"][landed])
        self.stats.promoted += int(landed.sum())
        return state, slot_state

    # -- demotion ----------------------------------------------------------
    def maybe_demote(self, state: ev.EVState,
                     slot_state: Dict[str, jax.Array],
                     keep_mask: Optional[np.ndarray] = None):
        """BatchEviction analog: if occupancy > high watermark, move the
        coldest rows to the spill tier until at the low watermark.

        ``keep_mask`` ([capacity] bool) pins rows (e.g. the ids of the
        already-staged next batch) so a promotion isn't immediately
        undone.
        """
        cap = self.cfg.capacity
        key_hi = np.asarray(state.table.key_hi)
        key_lo = np.asarray(state.table.key_lo)
        live = ht.live_mask_np(key_hi, key_lo)
        n_live = int(live.sum())
        self.stats.hbm_live = n_live
        self.stats.spill_rows = len(self.host)
        if n_live <= int(self.high * cap):
            return state, slot_state
        n_target = int(self.low * cap)
        n_evict = n_live - n_target

        if self.policy == "lru":
            rank = np.asarray(state.versions)[:-1].astype(np.int64)
        else:  # lfu
            rank = np.asarray(state.freqs)[:-1].astype(np.int64)
        rank = np.where(live, rank, np.iinfo(np.int64).max)
        if keep_mask is not None:
            rank = np.where(keep_mask, np.iinfo(np.int64).max, rank)
        victim_slots = np.argsort(rank, kind="stable")[:n_evict]
        victim_slots = victim_slots[live[victim_slots]]
        if victim_slots.size == 0:
            return state, slot_state

        ids = keylib.join_ids(key_hi[victim_slots], key_lo[victim_slots])
        values = np.asarray(state.values)[victim_slots]
        freqs = np.asarray(state.freqs)[victim_slots]
        versions = np.asarray(state.versions)[victim_slots]
        slots = {}
        for n, arr in slot_state.items():
            a = arr
            if hasattr(a, "ndim") and a.ndim >= 1 and \
                    a.shape[0] == cap + 1:
                slots[n] = np.asarray(a)[victim_slots]
        self.host.put_batch(ids, values, freqs, versions, slots)

        mask = np.zeros(cap, bool)
        mask[victim_slots] = True
        state = state.replace(
            table=ht.remove_slots(state.table, jnp.asarray(mask)))
        self.stats.demoted += int(victim_slots.size)
        self.stats.hbm_live = n_live - int(victim_slots.size)
        self.stats.spill_rows = len(self.host)
        return state, slot_state

    # -- checkpoint --------------------------------------------------------
    def export_spill(self):
        """Spill-tier rows for checkpointing (merge with the HBM export:
        both use the 4-tensor + slot/<name> layout)."""
        return self.host.export()

    def import_spill(self, arrays):
        ids = np.asarray(arrays["keys"], np.int64)
        slots = {n[len("slot/"):]: np.asarray(a) for n, a in arrays.items()
                 if n.startswith("slot/")}
        self.host.put_batch(ids, np.asarray(arrays["values"]),
                            np.asarray(arrays["freqs"]),
                            np.asarray(arrays["versions"]), slots)


class TieredGroup:
    """Wire multi-tier storage into the training loop for every table
    whose ``StorageOption.storage_type`` is ``HBM_HOST``.

    Wraps the train step: before each step it promotes the incoming
    batch's spill-tier rows into HBM, after each step (every
    ``demote_every`` steps) it demotes past-watermark cold rows.  The
    promotion scan runs on the calling (input-pipeline) thread, so with
    a staged iterator it overlaps the previous device step.

        tiered = TieredGroup(group, ts.slots)
        for batch in data:
            ts = tiered.pre_step(ts, batch)
            ts, metrics = step(ts, batch)
            ts = tiered.post_step(ts)
    """

    def __init__(self, group, slot_states, policy: str = "lru",
                 high_watermark: float = 0.85, low_watermark: float = 0.70,
                 demote_every: int = 16):
        from deeprec_tpu import config as _cfg
        self.group = group
        self.demote_every = demote_every
        self._n_steps = 0
        if group.num_shards > 1:
            raise NotImplementedError(
                "TieredGroup currently supports single-shard groups; "
                "sharded multi-tier runs one TieredGroup per host shard")
        self.tiered: Dict[str, TieredTable] = {}
        for tname, cfg in group.tables.items():
            st = cfg.ev_option.storage_option
            if st.storage_type == _cfg.StorageType.HBM_HOST:
                self.tiered[tname] = TieredTable(
                    cfg, slot_states[tname], policy=policy,
                    high_watermark=high_watermark,
                    low_watermark=low_watermark)

    def _batch_ids_for(self, tname: str, batch) -> np.ndarray:
        from deeprec_tpu.utils import keys as _k
        ids = []
        for c in self.group.embedding:
            if self.group.physical_table_of(c) != tname:
                continue
            s = batch[c.name]
            hi, lo = self.group.transform_ids(c, s.hi, s.lo)
            ids.append(_k.join_ids(np.asarray(hi).reshape(-1),
                                   np.asarray(lo).reshape(-1)))
        return (np.concatenate(ids) if ids
                else np.zeros((0,), np.int64))

    def pre_step(self, ts, batch):
        """Promote spill-tier rows the incoming batch will touch."""
        for tname, tiered in self.tiered.items():
            payload = tiered.prepare_promotion(
                ts.ev[tname], self._batch_ids_for(tname, batch))
            if payload is not None:
                state, slots = tiered.apply_promotion(
                    ts.ev[tname], dict(ts.slots[tname]), payload)
                ts = ts.replace(ev={**ts.ev, tname: state},
                                slots={**ts.slots, tname: slots})
        return ts

    def post_step(self, ts):
        """Demote cold rows past the watermark (every demote_every)."""
        self._n_steps += 1
        if self._n_steps % self.demote_every:
            return ts
        for tname, tiered in self.tiered.items():
            state, slots = tiered.maybe_demote(
                ts.ev[tname], dict(ts.slots[tname]))
            ts = ts.replace(ev={**ts.ev, tname: state},
                            slots={**ts.slots, tname: slots})
        return ts

    def stats(self) -> Dict[str, TierStats]:
        return {n: t.stats for n, t in self.tiered.items()}
