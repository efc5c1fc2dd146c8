"""Adaptive embedding: hot keys in EV, cold keys in a static bucket table.

Rebuild of ``categorical_column_with_adaptive_embedding`` /
``adaptive_embedding_lookup_sparse``
(``python/feature_column/feature_column_v2.py:2058``,
``python/ops/embedding_ops.py:678-795``, ``docs/Adaptive-Embedding.md``):
frequent ids get collision-free EV rows, infrequent ids share a
hash-bucket dense table (memory bound), and when an id becomes hot its
EV row is seeded from the static row it trained in (value migration) so
no learning is lost.

Where the reference drives hotness from precomputed
``adaptive_mask_tensors``, here hotness is the EV's own frequency
counter crossing ``hot_threshold`` — online, no side input.

The static table is an ordinary dense parameter: pass it through the
loss so cold-id gradients flow to it via autodiff, while hot-id
gradients ride the EV unique-rows cotangent as usual.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import lookup as lkup
from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.utils import keys as keylib


class AdaptiveLookup(NamedTuple):
    lk: ev.LookupResult       # EV-side unique lookup (rows = diff input)
    hot: jax.Array            # [n_unique] bool — uses the EV row
    newly_hot: jax.Array      # [n_unique] bool — crossed the threshold now
    bucket: jax.Array         # [n_unique] int32 — static-table row
    inverse: jax.Array        # [B, L]
    mask: jax.Array           # [B, L]


def _bits(cfg, state, lk, counts, *, hot_threshold, num_buckets, salt):
    """hot / newly_hot / bucket at the lookup's unique level, from the
    POST-update freqs and the per-unique in-batch counts."""
    safe = jnp.minimum(lk.slots, cfg.capacity)
    freq_after = state.freqs[safe]
    freq_before = freq_after - counts
    hot = lk.admitted & (freq_after >= hot_threshold)
    newly_hot = hot & (freq_before < hot_threshold)
    bucket = (keylib.hash_mix(lk.qhi, lk.qlo, salt=salt + 13)
              % jnp.uint32(num_buckets)).astype(jnp.int32)
    return hot, newly_hot, bucket


def lookup_train(cfg: cfglib.TableConfig, state: ev.EVState,
                 ids_hi, ids_lo, global_step, *,
                 hot_threshold: int, num_buckets: int,
                 salt: int = 0) -> tuple[ev.EVState, AdaptiveLookup]:
    """Training lookup for one padded-dense feature [B, L]."""
    B, L = ids_hi.shape
    dd = lkup.dedup(ids_hi.reshape(-1), ids_lo.reshape(-1))
    state, lk = ev.lookup_train(cfg, state, dd.uhi, dd.ulo, dd.counts,
                                global_step, salt=salt)
    hot, newly_hot, bucket = _bits(
        cfg, state, lk, dd.counts, hot_threshold=hot_threshold,
        num_buckets=num_buckets, salt=salt)
    mask = ~((ids_hi == keylib.EMPTY_HI) & (ids_lo == keylib.EMPTY_LO))
    return state, AdaptiveLookup(
        lk=lk, hot=hot, newly_hot=newly_hot, bucket=bucket,
        inverse=dd.inverse.reshape(B, L), mask=mask)


class ShardedAdaptiveLookup(NamedTuple):
    """Sharded-mode result: lk + bits live at the OWNER-unique level
    (aligned with ``lk.rows``); ``routing`` is the id exchange to ride
    back through ``EmbeddingGroup.combine``."""

    lk: ev.LookupResult
    hot: jax.Array
    newly_hot: jax.Array
    bucket: jax.Array
    routing: "object"          # sharded.Routing
    inverse: jax.Array         # [B, L]
    mask: jax.Array            # [B, L]


def lookup_train_sharded(cfg: cfglib.TableConfig, state: ev.EVState,
                         ids_hi, ids_lo, global_step, *,
                         axis_name: str, hot_threshold: int,
                         num_buckets: int, salt: int = 0,
                         capacity_factor: float = 2.0):
    """Sharded adaptive training lookup (call inside shard_map): the EV
    half rides the standard id exchange (``sharded.bag_lookup_train``);
    hotness/migration bits are computed on the OWNER shard, where the
    id's freq counter lives, and the hot/cold row merge happens at the
    owner-unique level before the return exchange — the static bucket
    table is a replicated dense param every device holds.

    Reference analog: adaptive embedding over partitioned EVs
    (``python/ops/embedding_ops.py:678-795`` with
    ``fixed_size_partitioner`` parts placed across PS tasks)."""
    from deeprec_tpu.embedding import sharded as shlib

    state, sbl = shlib.bag_lookup_train(
        cfg, state, ids_hi, ids_lo, global_step, axis_name=axis_name,
        capacity_factor=capacity_factor, salt=salt)
    # sbl.counts: the owner-side per-unique summed in-batch counts —
    # exactly what the owner's freq update consumed.
    hot, newly_hot, bucket = _bits(
        cfg, state, sbl.lk, sbl.counts,
        hot_threshold=hot_threshold, num_buckets=num_buckets, salt=salt)
    r = sbl.routing
    return state, ShardedAdaptiveLookup(
        lk=sbl.lk, hot=hot, newly_hot=newly_hot, bucket=bucket,
        routing=r, inverse=r.inverse, mask=r.mask)


def lookup_infer_rows_sharded(cfg, state, ids_hi, ids_lo, static_table,
                              *, axis_name: str, hot_threshold: int,
                              num_buckets: int, salt: int = 0,
                              capacity_factor: float = 2.0):
    """Read-only sharded adaptive lookup: route ids to owner shards,
    merge hot-EV/cold-static rows ON the owner (static is replicated),
    exchange merged rows back.  Returns (local_rows [n+1?, dim],
    inverse [B, L], mask)."""
    from deeprec_tpu.embedding import hash_table as ht
    from deeprec_tpu.embedding import sharded as shlib

    def owner_rows(rhi, rlo):
        slots = ht.find(state.table, rhi, rlo, max_probes=cfg.max_probes)
        found = slots < cfg.capacity
        safe = jnp.minimum(slots, cfg.capacity)
        hot = found & (state.freqs[safe] >= hot_threshold)
        ev_rows = state.values[safe]
        bucket = (keylib.hash_mix(rhi, rlo, salt=salt + 13)
                  % jnp.uint32(num_buckets)).astype(jnp.int32)
        static_rows = static_table[bucket].astype(ev_rows.dtype)
        real = rhi != keylib.EMPTY_HI
        rows = jnp.where(hot[:, None], ev_rows, static_rows)
        return jnp.where(real[:, None], rows, 0.0)

    return shlib.exchange_rows_infer(
        cfg, ids_hi, ids_lo, owner_rows, axis_name=axis_name,
        capacity_factor=capacity_factor)


def migrate_new_hot(cfg: cfglib.TableConfig, state: ev.EVState,
                    al: AdaptiveLookup, static_table) -> ev.EVState:
    """Seed EV rows of ids that just became hot from their static rows
    (the reference's migration/value-reuse step). Call before the loss
    so the forward pass already uses the migrated value."""
    idx = jnp.where(al.newly_hot, al.lk.slots, cfg.capacity + 1)
    seed = static_table[al.bucket].astype(state.values.dtype)
    return state.replace(
        values=state.values.at[idx].set(seed, mode="drop"))


def combine(rows, static_table, al: AdaptiveLookup, combiner: str):
    """[B, dim] bag embeddings. Differentiable in (rows, static_table)."""
    static_rows = static_table[al.bucket].astype(rows.dtype)
    merged = jnp.where(al.hot[:, None], rows, static_rows)
    return lkup.combine_bags(merged, al.inverse, al.mask, combiner)


# Note on gradients: ``combine``'s jnp.where routes each id's cotangent
# to exactly one side — EV rows for hot ids, the static table for cold
# ids — so no extra gradient masking is needed before the sparse apply.


def lookup_infer(cfg: cfglib.TableConfig, state: ev.EVState,
                 ids_hi, ids_lo, static_table, *,
                 hot_threshold: int, num_buckets: int, salt: int = 0):
    """Inference-time adaptive read (no mutation): per-occurrence rows
    [B*L, dim]. Ids resident in the EV with frequency >=
    ``hot_threshold`` read their EV row; everything else reads its
    static hash bucket (the serving-side half of
    ``adaptive_embedding_lookup_sparse``)."""
    from deeprec_tpu.embedding import hash_table as ht

    flat_hi = ids_hi.reshape(-1)
    flat_lo = ids_lo.reshape(-1)
    slots = ht.find(state.table, flat_hi, flat_lo,
                    max_probes=cfg.max_probes)
    found = slots < cfg.capacity
    safe = jnp.minimum(slots, cfg.capacity)
    hot = found & (state.freqs[safe] >= hot_threshold)
    ev_rows = state.values[safe]
    bucket = (keylib.hash_mix(flat_hi, flat_lo, salt=salt + 13)
              % jnp.uint32(num_buckets)).astype(jnp.int32)
    static_rows = static_table[bucket].astype(ev_rows.dtype)
    return jnp.where(hot[:, None], ev_rows, static_rows)
