"""Pallas TPU kernel: batched embedding-row gather via per-row DMA.

MEASURED NEGATIVE RESULT (v5e, sync-fenced, round 2) — kept as the DMA
baseline, NOT used in production: for a [262k]-row gather of dim-128
f32 rows from a 2^20-row table, XLA's native ``values[slots]`` runs in
3.25 ms (~41 GB/s) while this per-row-DMA kernel takes 10.8 ms
(41 ns/row issue floor) — XLA wins 3.3x at wide dims. The "gathers are
slow" findings that motivated this experiment (e.g. 38 ms for
[426k, 16]) are about NARROW rows, where per-row transaction cost
dominates and a per-row DMA hits the same floor — there is no win
either way, so the production embedding fetch stays on the XLA gather
everywhere. The kernel below issues one async copy per row,
batch-started across a tile so the DMA engines pipeline the fetches,
writing straight into the output's VMEM tile.

No compute, no aliasing: out[i] = values[slots[i]]. Out-of-range slots
(overflow sentinel and padding) read row C (the table's sentinel row),
matching the XLA path's clamp semantics.

Constraint: D must be a multiple of 128 (Mosaic tiles HBM rows at 128
lanes; narrower row slices cannot be DMA'd on the compiled path) —
``supports_dim`` gates callers, everything else falls back to XLA.

Reference analog: ``KvResourceGather`` sharded CPU loop
(``core/kernels/kv_variable_ops.cc:386-452``) — same role, the
reference shards the id batch over host threads, here over DMA queues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_TILE = 1024


def _make_kernel():
    R = ROWS_PER_TILE

    def kernel(values_hbm,       # [C+1, D] (ANY/HBM)
               slots_ref,        # [R//128, 128] int32 SMEM tile
               out_tile,         # [R, D] VMEM output tile
               sem):             # DMA semaphore
        def get_slot(i):
            return slots_ref[i // 128, i % 128]

        def start(i, c):
            pltpu.make_async_copy(values_hbm.at[get_slot(i)],
                                  out_tile.at[i], sem).start()
            return c

        def wait(i, c):
            pltpu.make_async_copy(values_hbm.at[get_slot(i)],
                                  out_tile.at[i], sem).wait()
            return c

        jax.lax.fori_loop(0, R, start, 0)
        jax.lax.fori_loop(0, R, wait, 0)

    return kernel


def supports_dim(D: int) -> bool:
    return D % 128 == 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(values, slots, interpret: bool = False):
    """out[i] = values[min(slots[i], C)] — [n, D] from [C+1, D].

    Out-of-range/overflow slots read the sentinel row C (same clamp the
    XLA path applies before indexing).
    """
    C1, D = values.shape
    if not interpret and not supports_dim(D):
        return values[jnp.minimum(slots, C1 - 1)]
    n = slots.shape[0]
    n_pad = -(-n // ROWS_PER_TILE) * ROWS_PER_TILE
    sp = jnp.full((n_pad,), C1 - 1, jnp.int32).at[:n].set(
        jnp.minimum(slots, C1 - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_pad // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # values (HBM)
            pl.BlockSpec((ROWS_PER_TILE // 128, 128),
                         lambda t: (t, 0),
                         memory_space=pltpu.SMEM),      # slots tile
        ],
        out_specs=pl.BlockSpec((ROWS_PER_TILE, D), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _make_kernel(),
        out_shape=jax.ShapeDtypeStruct((n_pad, D), values.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(values, sp.reshape(-1, 128))
    return out[:n]
