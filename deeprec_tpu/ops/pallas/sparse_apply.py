"""Pallas TPU kernel: fused per-row sparse optimizer apply.

The XLA lowering of a sparse Adagrad apply is four HBM passes over the
touched rows (gather accum, scatter accum, gather values, scatter
values) plus index plumbing for each.  This kernel makes it one pass:
for each touched row, DMA the value row and slot row HBM→VMEM once,
compute the update on the VPU, and DMA both back.

SYNC-measured on TPU v5e (round 2, honest D2H-fenced timing — round
1's numbers were dispatch-rate artifacts): 426k rows × dim 128 Adagrad
= ~85 ms Pallas vs ~78 ms XLA. Both are bound by per-row HBM
transaction + issue cost (~190 ns/row), so the production optimizers
keep the XLA lowering (optimizers/sparse.py) and these kernels stand
as the measured DMA baseline for future hardware / coalescing
experiments.

Key layout decisions:
  * The tables stay **unpadded and uncopied**: [C+1, D] arrays live in
    ANY/HBM space, updated in place through ``input_output_aliases``.
    Row C is the table's existing overflow-sentinel row ("never read,
    safe scatter target" — see ``EVState``), so dropped/overflow slots
    are redirected there instead of needing an extra padded row.
  * ``slots`` ride SMEM as per-tile [8, 128] blocks — scalar-
    prefetching the whole array overflows SMEM past ~65k ids (the
    round-1 version only ever ran at test sizes).

Requirement: ``slots`` must be unique among in-range entries (the
deduped-id contract every sparse optimizer here already has) — tiles
run in parallel, so duplicate rows would race.

Reference analog: ``KvSparseApplyAdagradOp``
(``core/kernels/training_ali_ops.cc:71``) — the reference's CPU kernel
likewise updates accum+value per id in one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_TILE = 1024  # rows per grid step; slots ride SMEM as [8, 128]
                      # (SMEM blocks need sublane multiples of 8)


def _make_kernel(D: int):
    R = ROWS_PER_TILE

    def kernel(lr_ref,               # scalar-prefetch: [1] float32
               values_hbm,           # [C+1, D] float32 (ANY/HBM)
               accum_hbm,            # [C+1, D] float32
               grads_ref,            # [R, D] VMEM tile
               slots_ref,            # [R//128, 128] int32 SMEM tile
               values_out,           # aliased [C+1, D]
               accum_out,            # aliased [C+1, D]
               vtile, atile, sem):   # scratch [R, D] x2, DMA sems [2]
        def get_slot(i):
            return slots_ref[i // 128, i % 128]

        # Batch-issue all 2R input DMAs on two shared semaphores, then
        # drain — the DMA engines overlap the whole tile's row fetches.
        def start_in(i, c):
            slot = get_slot(i)
            pltpu.make_async_copy(values_hbm.at[slot], vtile.at[i],
                                  sem.at[0]).start()
            pltpu.make_async_copy(accum_hbm.at[slot], atile.at[i],
                                  sem.at[1]).start()
            return c

        def wait_in(i, c):
            slot = get_slot(i)
            pltpu.make_async_copy(values_hbm.at[slot], vtile.at[i],
                                  sem.at[0]).wait()
            pltpu.make_async_copy(accum_hbm.at[slot], atile.at[i],
                                  sem.at[1]).wait()
            return c

        jax.lax.fori_loop(0, R, start_in, 0)
        jax.lax.fori_loop(0, R, wait_in, 0)

        # One vectorized [R, D] update on the VPU.
        g = grads_ref[:]
        acc = atile[:] + g * g
        atile[:] = acc
        vtile[:] = vtile[:] - lr_ref[0] * g * jax.lax.rsqrt(acc)

        def start_out(i, c):
            slot = get_slot(i)
            pltpu.make_async_copy(vtile.at[i], values_out.at[slot],
                                  sem.at[0]).start()
            pltpu.make_async_copy(atile.at[i], accum_out.at[slot],
                                  sem.at[1]).start()
            return c

        def wait_out(i, c):
            slot = get_slot(i)
            pltpu.make_async_copy(vtile.at[i], values_out.at[slot],
                                  sem.at[0]).wait()
            pltpu.make_async_copy(atile.at[i], accum_out.at[slot],
                                  sem.at[1]).wait()
            return c

        jax.lax.fori_loop(0, R, start_out, 0)
        jax.lax.fori_loop(0, R, wait_out, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def adagrad_apply_rows(values, accum, slots, grads, lr,
                       interpret: bool = False):
    """Fused sparse Adagrad: values/accum [C+1, D] (row C is the
    overflow sentinel); slots [n] int32, unique among in-range entries
    (>= C drops); grads [n, D]; lr scalar. Returns (values', accum'),
    updated in place (no table copy)."""
    C1, D = values.shape
    if not interpret and D % 128:
        # Mosaic tiles HBM rows at 128 lanes; a [D<128] row slice can't
        # be DMA'd on the compiled path. Fall back to the XLA lowering
        # (callers use supports_dim() to pick).
        return adagrad_apply_rows_reference(values, accum, slots, grads,
                                            lr)
    n = slots.shape[0]
    n_pad = -(-n // ROWS_PER_TILE) * ROWS_PER_TILE
    Dp = -(-D // 128) * 128

    gp = grads if n_pad == n else jnp.concatenate(
        [grads, jnp.zeros((n_pad - n, D), grads.dtype)], axis=0)
    # Redirect overflow/drop/padding to the sentinel row C1-1.
    sp = jnp.full((n_pad,), C1 - 1, jnp.int32).at[:n].set(
        jnp.where(slots < C1 - 1, slots, C1 - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # values (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # accum (HBM)
            pl.BlockSpec((ROWS_PER_TILE, D),
                         lambda t, l: (t, 0),
                         memory_space=pltpu.VMEM),  # grads tile
            pl.BlockSpec((ROWS_PER_TILE // 128, 128),
                         lambda t, l: (t, 0),
                         memory_space=pltpu.SMEM),  # slots tile
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            # D == Dp on the compiled path (supports_dim gate); the
            # interpreter accepts any lane width.
            pltpu.VMEM((ROWS_PER_TILE, D), jnp.float32),
            pltpu.VMEM((ROWS_PER_TILE, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vout, aout = pl.pallas_call(
        _make_kernel(D),
        out_shape=[jax.ShapeDtypeStruct(values.shape, values.dtype),
                   jax.ShapeDtypeStruct(accum.shape, accum.dtype)],
        grid_spec=grid_spec,
        input_output_aliases={1: 0, 2: 1},  # +1 scalar-prefetch offset
        interpret=interpret,
    )(jnp.asarray([lr], jnp.float32), values, accum, gp,
      sp.reshape(-1, 128))
    return vout, aout


def supports_dim(D: int) -> bool:
    """True when the compiled kernel applies (lane-aligned rows)."""
    return D % 128 == 0


# ---------------------------------------------------------------------------
# Fused lazy-Adam: values + m + v in ONE sweep (XLA: 3 gathers +
# 3 scatters). This is where DMA fusion beats XLA's scatter pipeline —
# the win scales with the number of slot arrays.
# ---------------------------------------------------------------------------

def _make_adam_kernel(D: int):
    R = ROWS_PER_TILE

    def kernel(hyper_ref,              # scalar-prefetch
               values_hbm, m_hbm, v_hbm, grads_ref,
               slots_ref,              # [R] int32 SMEM tile
               values_out, m_out, v_out,
               vtile, mtile, wtile, sem):
        def start_in(i, carry):
            slot = slots_ref[0, i]
            pltpu.make_async_copy(values_hbm.at[slot], vtile.at[i],
                                  sem.at[0, i]).start()
            pltpu.make_async_copy(m_hbm.at[slot], mtile.at[i],
                                  sem.at[1, i]).start()
            pltpu.make_async_copy(v_hbm.at[slot], wtile.at[i],
                                  sem.at[2, i]).start()
            return carry

        def wait_in(i, carry):
            slot = slots_ref[0, i]
            pltpu.make_async_copy(values_hbm.at[slot], vtile.at[i],
                                  sem.at[0, i]).wait()
            pltpu.make_async_copy(m_hbm.at[slot], mtile.at[i],
                                  sem.at[1, i]).wait()
            pltpu.make_async_copy(v_hbm.at[slot], wtile.at[i],
                                  sem.at[2, i]).wait()
            return carry

        jax.lax.fori_loop(0, R, start_in, 0)
        jax.lax.fori_loop(0, R, wait_in, 0)

        alpha = hyper_ref[0]     # lr * sqrt(1-b2^t) / (1-b1^t)
        beta1 = hyper_ref[1]
        beta2 = hyper_ref[2]
        eps = hyper_ref[3]
        g = grads_ref[:]
        m = beta1 * mtile[:] + (1.0 - beta1) * g
        v = beta2 * wtile[:] + (1.0 - beta2) * g * g
        mtile[:] = m
        wtile[:] = v
        vtile[:] = vtile[:] - alpha * m / (jnp.sqrt(v) + eps)

        def start_out(i, carry):
            slot = slots_ref[0, i]
            pltpu.make_async_copy(vtile.at[i], values_out.at[slot],
                                  sem.at[0, i]).start()
            pltpu.make_async_copy(mtile.at[i], m_out.at[slot],
                                  sem.at[1, i]).start()
            pltpu.make_async_copy(wtile.at[i], v_out.at[slot],
                                  sem.at[2, i]).start()
            return carry

        def wait_out(i, carry):
            slot = slots_ref[0, i]
            pltpu.make_async_copy(vtile.at[i], values_out.at[slot],
                                  sem.at[0, i]).wait()
            pltpu.make_async_copy(mtile.at[i], m_out.at[slot],
                                  sem.at[1, i]).wait()
            pltpu.make_async_copy(wtile.at[i], v_out.at[slot],
                                  sem.at[2, i]).wait()
            return carry

        jax.lax.fori_loop(0, R, start_out, 0)
        jax.lax.fori_loop(0, R, wait_out, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def adam_apply_rows(values, m, v, slots, grads, alpha, beta1, beta2,
                    epsilon, interpret: bool = False):
    """Fused lazy-Adam row update (bias correction folded into
    ``alpha`` by the caller). Same contracts as adagrad_apply_rows."""
    C1, D = values.shape
    if not interpret and D % 128:
        return adam_apply_rows_reference(values, m, v, slots, grads,
                                         alpha, beta1, beta2, epsilon)
    n = slots.shape[0]
    n_pad = -(-n // ROWS_PER_TILE) * ROWS_PER_TILE
    gp = grads if n_pad == n else jnp.concatenate(
        [grads, jnp.zeros((n_pad - n, D), grads.dtype)], axis=0)
    sp = jnp.full((n_pad,), C1 - 1, jnp.int32).at[:n].set(
        jnp.where(slots < C1 - 1, slots, C1 - 1))
    hyper = jnp.asarray([alpha, beta1, beta2, epsilon], jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pad // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ROWS_PER_TILE, D),
                         lambda t, h: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROWS_PER_TILE),
                         lambda t, h: (t, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS_PER_TILE, D), jnp.float32),
            pltpu.VMEM((ROWS_PER_TILE, D), jnp.float32),
            pltpu.VMEM((ROWS_PER_TILE, D), jnp.float32),
            pltpu.SemaphoreType.DMA((3, ROWS_PER_TILE)),
        ],
    )
    vout, mout, wout = pl.pallas_call(
        _make_adam_kernel(D),
        out_shape=[jax.ShapeDtypeStruct(values.shape, values.dtype),
                   jax.ShapeDtypeStruct(m.shape, m.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        grid_spec=grid_spec,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
    )(hyper, values, m, v, gp, sp.reshape(-1, ROWS_PER_TILE))
    return vout, mout, wout


def adam_apply_rows_reference(values, m, v, slots, grads, alpha, beta1,
                              beta2, epsilon):
    C1, D = values.shape
    safe = jnp.minimum(slots, C1 - 1)
    idx = jnp.where(slots < C1 - 1, slots, C1 + 1)
    g = grads.astype(jnp.float32)
    m_rows = beta1 * m[safe] + (1.0 - beta1) * g
    v_rows = beta2 * v[safe] + (1.0 - beta2) * g * g
    new_rows = values[safe] - alpha * m_rows / (jnp.sqrt(v_rows) + epsilon)
    return (values.at[idx].set(new_rows, mode="drop"),
            m.at[idx].set(m_rows, mode="drop"),
            v.at[idx].set(v_rows, mode="drop"))


def adagrad_apply_rows_reference(values, accum, slots, grads, lr):
    """jnp reference (the current optimizers/sparse.py lowering)."""
    C1, D = values.shape
    idx = jnp.where(slots < C1 - 1, slots, C1 + 1)  # OOB drop
    g = grads.astype(jnp.float32)
    acc_rows = accum[jnp.minimum(slots, C1 - 1)] + g * g
    new_rows = values[jnp.minimum(slots, C1 - 1)] \
        - lr * g * jax.lax.rsqrt(acc_rows)
    return (values.at[idx].set(new_rows, mode="drop"),
            accum.at[idx].set(acc_rows, mode="drop"))
