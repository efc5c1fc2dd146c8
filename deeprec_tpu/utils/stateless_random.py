"""Stateless per-key random row initialization.

New embedding rows are initialized from a deterministic function of the
feature id, so an id's initial value is identical regardless of which
step, batch, or shard first inserts it — the functional analog of the
reference's initializer-on-allocation (``embedding_var.h:137``
``LookupOrCreateEmb`` with the default-value tensor).

Randomness comes from the same murmur-style mixer as the table hash
(different salts), computed as one [n, dim] vectorized pass on the VPU —
no threefry key per row, no sequential loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from deeprec_tpu.utils.keys import _fmix32

_PHI = np.uint32(0x9E3779B9)


def _hash_grid(hi, lo, dim: int, salt: int):
    """uint32 hash for every (row, column) pair. hi/lo: [n]."""
    base = lo.astype(jnp.uint32) ^ (hi.astype(jnp.uint32) * _PHI)
    base = base ^ jnp.uint32((salt * 0x85EBCA6B) & 0xFFFFFFFF)
    cols = (jnp.arange(dim, dtype=jnp.uint32) * _PHI)[None, :]
    return _fmix32(base[:, None] ^ cols)


def _to_unit(bits):
    """uint32 -> float32 uniform in (0, 1]."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24)) + \
        jnp.float32(1.0 / (1 << 25))


def uniform_rows(hi, lo, dim: int, *, minval=-1.0, maxval=1.0, salt=0):
    u = _to_unit(_hash_grid(hi, lo, dim, salt))
    return minval + (maxval - minval) * u


def normal_rows(hi, lo, dim: int, *, stddev=1.0, salt=0):
    """Box–Muller on two independent hash grids."""
    u1 = _to_unit(_hash_grid(hi, lo, dim, salt * 2 + 1))
    u2 = _to_unit(_hash_grid(hi, lo, dim, salt * 2 + 2))
    z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(2.0 * jnp.pi * u2)
    return stddev * z


def truncated_normal_rows(hi, lo, dim: int, *, stddev=1.0, salt=0):
    """Normal clipped to ±2σ and rescaled.

    The reference resamples (tf.truncated_normal); clipping keeps the
    kernel branch-free with a negligible distribution difference at the
    tails (<5% of mass moved).
    """
    z = normal_rows(hi, lo, dim, stddev=1.0, salt=salt)
    return stddev * jnp.clip(z, -2.0, 2.0)


def init_rows(initializer: str, hi, lo, dim: int, scale: float, salt: int = 0):
    """Dispatch on TableConfig.initializer."""
    if initializer == "zeros":
        return jnp.zeros((hi.shape[0], dim), jnp.float32)
    if initializer == "constant":
        return jnp.full((hi.shape[0], dim), scale, jnp.float32)
    if initializer == "uniform":
        return uniform_rows(hi, lo, dim, minval=-scale, maxval=scale, salt=salt)
    if initializer == "normal":
        return normal_rows(hi, lo, dim, stddev=scale, salt=salt)
    if initializer == "truncated_normal":
        return truncated_normal_rows(hi, lo, dim, stddev=scale, salt=salt)
    raise ValueError(f"unknown initializer {initializer!r}")
