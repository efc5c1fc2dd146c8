"""Checkpointing: full + incremental, with restore-time re-sharding.

Rebuild of the reference's saver stack (SURVEY §2.6/§3.4):
  * full checkpoints save each EV table as the 4-tensor format
    (keys/values/freqs/versions — ``docs/Embedding-Variable-Export-
    Format.md``) plus row-aligned optimizer slot rows (slot-EV sharing,
    ``python/training/slot_creator.py:86``) and the dense params/opt
    pytrees;
  * incremental checkpoints (``python/training/incremental_saver.py``,
    ``core/kernels/incr_save_restore_ops.h:347`` IndicesIncrRecorder)
    dump only rows touched since the last save.  Here "touched" falls
    out of the EV design for free: the per-row ``versions`` array is
    the recorder, so a delta is ``versions >= since_step``;
  * restore = latest full + deltas in step order; table rows re-shard
    by hash when the restoring mesh differs from the saving one
    (``KvResourceImportV2`` partition filtering).

Files are plain ``.npz`` per table per shard + one for the dense tree —
host I/O, no device-format lock-in.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.feature_column.feature_column import EmbeddingGroup
from deeprec_tpu.train.loop import TrainState
from deeprec_tpu.utils import keys as keylib


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        key = "/".join(str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing dense leaf {key}")
        leaves.append(jnp.asarray(flat[key]).astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def _row_aligned(slot_tree, capacity: int):
    """Split a table's optimizer-slot pytree into row-aligned arrays
    ([C+1, ...]) and scalar/global leaves."""
    rows, scalars = {}, {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(slot_tree)[0]:
        key = "/".join(str(p) for p in path)
        arr = leaf
        if hasattr(arr, "shape") and arr.ndim >= 1 and \
                arr.shape[0] == capacity + 1:
            rows[key] = arr
        else:
            scalars[key] = arr
    return rows, scalars


def _export_table(cfg, state: ev.EVState, slot_tree, *,
                  min_version: Optional[int] = None,
                  partition_id: int = 0,
                  partition_num: int = 1) -> Dict[str, np.ndarray]:
    """Snapshot live rows (all, or touched since ``min_version``).

    Static bucket tables (no hash table, no version metadata) are
    saved in FULL on every save, incremental included — they are
    effectively dense params (matching the reference, whose
    incremental saver also rewrites dense variables each delta).
    A row-sharded static shard saves its GLOBAL slots as keys
    (``local_row * partition_num + partition_id``), so restore
    re-shards to any shard count by the same mod rule.
    """
    if cfg.static_buckets:
        N = cfg.capacity
        out = {
            "keys": (np.arange(N, dtype=np.int64) * partition_num
                     + partition_id),
            "values": np.asarray(state.values)[:N],
            "freqs": np.zeros((N,), np.int32),
            "versions": np.zeros((N,), np.int32),
        }
        rows, scalars = _row_aligned(slot_tree, cfg.capacity)
        for name, arr in rows.items():
            out[f"slot/{name}"] = np.asarray(arr)[:N]
        for name, arr in scalars.items():
            out[f"scalar/{name}"] = np.asarray(arr)
        return out
    key_hi = np.asarray(state.table.key_hi)
    key_lo = np.asarray(state.table.key_lo)
    ids = keylib.join_ids(key_hi, key_lo)
    live = ~np.isin(ids, (keylib.EMPTY_ID, keylib.TOMB_ID))
    if min_version is not None:
        from deeprec_tpu.embedding.variable import _tracking
        if _tracking(cfg)[1]:
            vers = np.asarray(state.versions)[:-1]
            live &= vers >= min_version
        # else: no touched-row recorder (record_version=False) — the
        # "delta" is a full dump of this table, like the reference's
        # incremental saver on variables without a recorder.
    idx = np.nonzero(live)[0]
    out = {
        "keys": ids[idx],
        "values": np.asarray(state.values)[idx],
        "freqs": np.asarray(state.freqs)[idx],
        "versions": np.asarray(state.versions)[idx],
    }
    rows, scalars = _row_aligned(slot_tree, cfg.capacity)
    for name, arr in rows.items():
        out[f"slot/{name}"] = np.asarray(arr)[idx]
    for name, arr in scalars.items():
        out[f"scalar/{name}"] = np.asarray(arr)
    if state.bloom.shape[0] > 1:
        out["bloom"] = np.asarray(state.bloom)
    return out


class CheckpointManager:
    """Save/restore TrainStates produced by ``train.loop``.

    ``group`` must be the EmbeddingGroup the state was built with (its
    ``num_shards`` describes the state's shard layout).
    """

    def __init__(self, directory: str, group: EmbeddingGroup,
                 keep: int = 3):
        self.dir = directory
        self.group = group
        self.keep = keep
        # Keys evicted (shrink) since the last save, per table — the
        # deletion half of the incremental-checkpoint contract
        # (``incr_save_restore_ops.h:177-301`` pairs with ckpt-time
        # Shrink): without them, full+delta restore resurrects rows
        # evicted after the full save.
        self._tombstones: Dict[str, set] = {}
        # Auxiliary saveable resources riding the checkpoint (the
        # reference's saveable-resource mechanism — WorkQueue is one,
        # ``python/ops/work_queue.py:113``): name -> (get_state,
        # set_state) with JSON-serializable state.
        self._aux: Dict[str, tuple] = {}
        # Optional multi-tier spill stores (host tier rides the ckpt).
        self._tiered = None
        os.makedirs(directory, exist_ok=True)

    def register_aux(self, name: str, get_state, set_state):
        """Attach a saveable resource: ``get_state() -> json-able``,
        ``set_state(state)``. Saved with every checkpoint; the newest
        applied checkpoint's state wins on restore."""
        self._aux[name] = (get_state, set_state)

    def attach_tiered(self, tiered_group):
        """Attach a ``TieredGroup`` so spill-tier rows are saved with
        every checkpoint and re-imported (re-bucketed) on restore."""
        self._tiered = tiered_group

    # -- helpers ---------------------------------------------------------
    def _table_shards(self, ts: TrainState, tname: str):
        """Yield (EVState, slot_tree) per shard (host-side). A table
        with replicated placement has no shard axis — one yield of the
        full (replica-identical) table."""
        state = jax.device_get(ts.ev[tname])
        slots = jax.device_get(ts.slots[tname])
        if self.group._is_stacked(tname):
            for s in range(self.group.num_shards):
                yield (jax.tree.map(lambda x: x[s], state),
                       jax.tree.map(lambda x: x[s], slots))
        else:
            yield state, slots

    def _live_keys(self, ts: TrainState, tname: str) -> np.ndarray:
        cfg = self.group.tables[tname]
        if cfg.static_buckets:
            n = cfg.capacity * (self.group.num_shards
                                if self.group._is_stacked(tname) else 1)
            return np.arange(n, dtype=np.int64)
        out = []
        for st, _ in self._table_shards(ts, tname):
            ids = keylib.join_ids(np.asarray(st.table.key_hi),
                                  np.asarray(st.table.key_lo))
            out.append(ids[~np.isin(ids, (keylib.EMPTY_ID,
                                          keylib.TOMB_ID))])
        return np.concatenate(out) if out else np.zeros(0, np.int64)

    def shrink_tables(self, ts: TrainState,
                      global_step: Optional[int] = None) -> TrainState:
        """Checkpoint-time eviction with deletion journaling: runs
        ``group.shrink`` and records every evicted key so the next
        incremental save carries tombstones. Use this (not bare
        ``group.shrink``) whenever incremental checkpoints are in play.
        """
        step = (int(jax.device_get(ts.step)) if global_step is None
                else int(global_step))
        before = {t: self._live_keys(ts, t) for t in self.group.tables}
        ts = ts.replace(ev=self.group.shrink(ts.ev, step))
        for t in self.group.tables:
            gone = np.setdiff1d(before[t], self._live_keys(ts, t))
            if gone.size:
                self._tombstones.setdefault(t, set()).update(
                    gone.tolist())
        return ts

    def _steps(self, kind: str):
        pat = re.compile(rf"{kind}-(\d+)$")
        out = []
        for d in os.listdir(self.dir):
            m = pat.match(d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    # -- save -------------------------------------------------------------
    def save(self, ts: TrainState, *, incremental: bool = False,
             since_step: Optional[int] = None) -> str:
        """Write a full (default) or incremental checkpoint at the
        state's current step."""
        step = int(jax.device_get(ts.step))
        kind = "incr" if incremental else "full"
        path = os.path.join(self.dir, f"{kind}-{step}")
        tmp = path + ".tmp"
        os.makedirs(tmp, exist_ok=True)

        # Dense params/opt are saved in full every time — they're tiny
        # next to the tables, and the reference's incremental saver also
        # rewrites dense variables each delta.
        dense = {"params": ts.params, "dense_opt": ts.dense_opt}
        np.savez(os.path.join(tmp, "dense.npz"), **_flatten(dense))
        min_version = since_step if incremental else None
        for tname, cfg in self.group.tables.items():
            n_sh = (self.group.num_shards
                    if self.group._is_stacked(tname) else 1)
            for si, (st, sl) in enumerate(self._table_shards(ts, tname)):
                arrs = _export_table(cfg, st, sl, min_version=min_version,
                                     partition_id=si, partition_num=n_sh)
                if incremental and si == 0:
                    # Deletion records: journaled evictions minus keys
                    # that were re-inserted since (currently live).
                    journal = np.fromiter(
                        self._tombstones.get(tname, ()), np.int64,
                        len(self._tombstones.get(tname, ())))
                    arrs["tombstones"] = np.setdiff1d(
                        journal, self._live_keys(ts, tname))
                np.savez(os.path.join(tmp, f"table-{tname}-s{si}.npz"),
                         **arrs)
        if self._aux:
            aux = {n: get() for n, (get, _) in self._aux.items()}
            with open(os.path.join(tmp, "aux.json"), "w") as f:
                json.dump(aux, f)
        if self._tiered is not None:
            for tname, shards in self._tiered.export_spill().items():
                for si, arrs in shards.items():
                    if len(arrs.get("keys", ())):
                        np.savez(os.path.join(
                            tmp, f"spill-{tname}-s{si}.npz"), **arrs)
        meta = {
            "step": step,
            "kind": kind,
            "since_step": since_step,
            "num_shards": self.group.num_shards,
            # Per-table file counts: replicated-placement tables save
            # one file regardless of the group's shard count.
            "table_shards": {
                t: (self.group.num_shards
                    if self.group._is_stacked(t) else 1)
                for t in self.group.tables
            },
            "tables": sorted(self.group.tables),
        }
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta, f)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        # The snapshot (full) / delta (incremental) just written fully
        # reflects all journaled evictions — start a fresh journal.
        self._tombstones.clear()
        self._gc()
        return path

    def _gc(self):
        fulls = self._steps("full")
        for old in fulls[:-self.keep]:
            shutil.rmtree(os.path.join(self.dir, f"full-{old}"),
                          ignore_errors=True)
        if fulls:
            # Deltas older than the oldest kept full are unreplayable.
            floor = fulls[:-self.keep][-1] if fulls[:-self.keep] else None
            if floor is not None:
                for inc in self._steps("incr"):
                    if inc <= floor:
                        shutil.rmtree(
                            os.path.join(self.dir, f"incr-{inc}"),
                            ignore_errors=True)

    # -- restore ------------------------------------------------------------
    def latest_step(self) -> Optional[int]:
        fulls = self._steps("full")
        return fulls[-1] if fulls else None

    def restore(self, ts_template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into (a state shaped like) ``ts_template``: the
        newest full checkpoint at or before ``step``, plus any newer
        incremental deltas up to ``step``.  The template's shard count
        may differ from the checkpoint's — rows re-shard by hash.
        """
        fulls = self._steps("full")
        if step is not None:
            fulls = [s for s in fulls if s <= step]
        if not fulls:
            raise FileNotFoundError(f"no full checkpoint in {self.dir}")
        base = fulls[-1]
        # Restore from FRESH tables: the template may hold a newer state
        # whose extra keys (absent from the checkpoint) must not survive
        # a rollback.  Slot/metadata rows of unreachable slots are
        # harmless — re-inserted keys reinitialize via is_new.
        ts_template = ts_template.replace(ev=self.group.create_state())
        ts = self._apply(ts_template, f"full-{base}", full=True)
        incrs = [s for s in self._steps("incr") if s > base
                 and (step is None or s <= step)]
        for s in incrs:
            ts = self._apply(ts, f"incr-{s}", full=False)
        final_step = incrs[-1] if incrs else base
        return ts.replace(step=jnp.int32(final_step))

    def _apply(self, ts: TrainState, name: str, *, full: bool) -> TrainState:
        path = os.path.join(self.dir, name)
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if os.path.exists(os.path.join(path, "dense.npz")):
            dense = dict(np.load(os.path.join(path, "dense.npz"),
                                 allow_pickle=False))
            tmpl = {"params": ts.params, "dense_opt": ts.dense_opt}
            restored = _unflatten_like(tmpl, dense)
            ts = ts.replace(params=restored["params"],
                            dense_opt=restored["dense_opt"])
        if self._aux and os.path.exists(os.path.join(path, "aux.json")):
            with open(os.path.join(path, "aux.json")) as f:
                aux = json.load(f)
            for n, (_, setter) in self._aux.items():
                if n in aux:
                    setter(aux[n])
        if self._tiered is not None:
            blob: Dict[str, Dict] = {}
            for fn in os.listdir(path):
                m = re.match(r"spill-(.+)-s(\d+)\.npz$", fn)
                if m:
                    blob.setdefault(m.group(1), {})[int(m.group(2))] = \
                        dict(np.load(os.path.join(path, fn),
                                     allow_pickle=False))
            if blob:
                self._tiered.import_spill(blob)

        new_ev = dict(ts.ev)
        new_slots = dict(ts.slots)
        for tname, cfg in self.group.tables.items():
            S_saved = meta.get("table_shards", {}).get(
                tname, meta["num_shards"])
            # Merge all saved shards of this table into one host list.
            merged: Dict[str, list] = {}
            scalars: Dict[str, np.ndarray] = {}
            bloom = None
            tombs = None
            for si in range(S_saved):
                f = os.path.join(path, f"table-{tname}-s{si}.npz")
                if not os.path.exists(f):
                    continue
                arrs = dict(np.load(f, allow_pickle=False))
                for k, v in arrs.items():
                    if k.startswith("scalar/"):
                        scalars[k[len("scalar/"):]] = v
                    elif k == "bloom":
                        bloom = v
                    elif k == "tombstones":
                        tombs = v
                    else:
                        merged.setdefault(k, []).append(v)
            if "keys" not in merged:
                continue
            cat = {k: np.concatenate(v) for k, v in merged.items()}

            def restore_shard(st, sl, pid, pnum):
                rows, _ = _row_aligned(sl, cfg.capacity)
                st2, rows2 = ev.import_arrays(
                    cfg, st, cat, partition_id=pid, partition_num=pnum,
                    extra_targets=rows)
                # Write scalar slot leaves + re-assemble slot pytree.
                sl2 = _set_leaves(sl, rows2, scalars)
                if bloom is not None and pnum == S_saved:
                    st2 = st2.replace(bloom=jnp.asarray(bloom))
                if tombs is not None and tombs.size:
                    # Deletions recorded since the base full save —
                    # applied after upserts so an evicted-then-reinserted
                    # key (absent from tombstones by construction)
                    # survives while truly evicted rows do not resurrect.
                    st2 = ev.delete_keys(cfg, st2, tombs)
                return st2, sl2

            if self.group._is_stacked(tname):
                S_new = self.group.num_shards
                host_ev = jax.device_get(new_ev[tname])
                host_sl = jax.device_get(new_slots[tname])
                st_shards, sl_shards = [], []
                for s in range(S_new):
                    st = jax.tree.map(lambda x: jnp.asarray(x[s]), host_ev)
                    sl = jax.tree.map(lambda x: jnp.asarray(x[s]), host_sl)
                    st2, sl2 = restore_shard(st, sl, s, S_new)
                    st_shards.append(st2)
                    sl_shards.append(sl2)
                new_ev[tname] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *st_shards)
                new_slots[tname] = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *sl_shards)
            else:
                new_ev[tname], new_slots[tname] = restore_shard(
                    new_ev[tname], new_slots[tname], 0, 1)
        return ts.replace(ev=new_ev, slots=new_slots,
                          step=jnp.int32(meta["step"]))


def _set_leaves(tree, rows: Dict[str, Any], scalars: Dict[str, np.ndarray]):
    """Rebuild a slot pytree from row-aligned updates + scalar values."""
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    leaves = []
    for path, leaf in paths_leaves:
        key = "/".join(str(p) for p in path)
        if key in rows:
            leaves.append(rows[key])
        elif key in scalars:
            leaves.append(jnp.asarray(scalars[key]).astype(
                leaf.dtype if hasattr(leaf, "dtype") else None))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
