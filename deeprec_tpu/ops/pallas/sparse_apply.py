"""Pallas TPU kernel: fused per-row sparse optimizer apply.

The XLA lowering of a sparse Adagrad apply is four HBM passes over the
touched rows (gather accum, scatter accum, gather values, scatter
values) plus index plumbing for each.  This kernel makes it one pass:
for each touched row, DMA the value row and slot row HBM→VMEM once,
compute the update on the VPU, and DMA both back — double-buffered so
the DMAs overlap compute (pallas_guide.md "Double Buffering").

Layout: rows are processed in tiles of ``ROWS_PER_TILE`` rows so the
VMEM blocks stay (8·k, 128)-aligned; ``dim`` is zero-padded to a
multiple of 128 lanes by the caller wrapper (tables with dim ≤ 128 pad
to one lane group — the padding rows/lanes are DMA'd but their writes
are exact copies, so correctness is unaffected).

``slots`` may contain out-of-range indices (== capacity sentinel, or
capacity+1 drop marker) — those rows are redirected to the scratch
sentinel row (index capacity) whose content is never read, preserving
the ``mode='drop'`` semantics of the jnp path.

In-place semantics via ``input_output_aliases``: the kernel's outputs
alias the value/accum tables, so XLA performs no copy of the [C+1, D]
arrays.

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

ROWS_PER_TILE = 8


def _adagrad_kernel(slots_ref,            # scalar-prefetch: [n_pad] int32
                    lr_ref,               # scalar-prefetch: [1] float32
                    values_hbm,           # [C+2, Dp] float32 (ANY/HBM)
                    accum_hbm,            # [C+2, Dp] float32
                    grads_ref,            # [ROWS, Dp] VMEM tile
                    values_out,           # aliased [C+2, Dp]
                    accum_out,            # aliased [C+2, Dp]
                    vrow, arow, sem):     # scratch
    t = pl.program_id(0)
    base = t * ROWS_PER_TILE

    def row_loop(i, _):
        slot = slots_ref[base + i]

        # DMA both rows in.
        v_in = pltpu.make_async_copy(values_hbm.at[slot], vrow.at[0],
                                     sem.at[0])
        a_in = pltpu.make_async_copy(accum_hbm.at[slot], arow.at[0],
                                     sem.at[1])
        v_in.start()
        a_in.start()
        v_in.wait()
        a_in.wait()

        g = grads_ref[i, :]
        acc = arow[0, :] + g * g
        arow[0, :] = acc
        vrow[0, :] = vrow[0, :] - lr_ref[0] * g * jax.lax.rsqrt(acc)

        v_out = pltpu.make_async_copy(vrow.at[0], values_out.at[slot],
                                      sem.at[0])
        a_out = pltpu.make_async_copy(arow.at[0], accum_out.at[slot],
                                      sem.at[1])
        v_out.start()
        a_out.start()
        v_out.wait()
        a_out.wait()
        return _

    jax.lax.fori_loop(0, ROWS_PER_TILE, row_loop, None)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adagrad_apply_rows(values, accum, slots, grads, lr,
                       interpret: bool = False):
    """Fused sparse Adagrad: values/accum are [C+1, D]; slots [n] int32
    (entries >= C are dropped); grads [n, D]; lr scalar.

    Returns (values', accum').  One HBM read + one write per touched
    row per table (vs 2+2 for the unfused lowering).
    """
    C1, D = values.shape
    n = slots.shape[0]
    Dp = -(-D // 128) * 128
    n_pad = -(-n // ROWS_PER_TILE) * ROWS_PER_TILE

    # Sentinel row C1 absorbs dropped updates; pad dim to lane multiple.
    def pad_table(x):
        x = jnp.concatenate([x, jnp.zeros((1, D), x.dtype)], axis=0)
        if Dp != D:
            x = jnp.concatenate(
                [x, jnp.zeros((C1 + 1, Dp - D), x.dtype)], axis=1)
        return x

    vp = pad_table(values)
    ap = pad_table(accum)
    gp = jnp.zeros((n_pad, Dp), grads.dtype).at[:n, :D].set(grads)
    sp = jnp.full((n_pad,), C1, jnp.int32).at[:n].set(
        jnp.where(slots < C1 - 1, slots, C1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # values (HBM)
            pl.BlockSpec(memory_space=pl.ANY),   # accum (HBM)
            pl.BlockSpec((ROWS_PER_TILE, Dp),
                         lambda t, s, l: (t, 0),
                         memory_space=pltpu.VMEM),  # grads tile
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, Dp), jnp.float32),
            pltpu.VMEM((1, Dp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vout, aout = pl.pallas_call(
        _adagrad_kernel,
        out_shape=[jax.ShapeDtypeStruct(vp.shape, vp.dtype),
                   jax.ShapeDtypeStruct(ap.shape, ap.dtype)],
        grid_spec=grid_spec,
        input_output_aliases={2: 0, 3: 1},  # +2 scalar-prefetch offset
        interpret=interpret,
    )(sp, jnp.asarray([lr], jnp.float32), vp, ap, gp)
    return vout[:C1, :D], aout[:C1, :D]


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
