"""Mesh construction helpers.

One place to build the device mesh so every caller gets consistent axis
types: ``shard_map``-driven SPMD here uses classic Auto axes (JAX 0.9's
``make_mesh`` defaults to Explicit sharding-in-types, which changes
``shard_map``/collective semantics).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"


def make_mesh(
    axis_shapes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    devices=None,
) -> jax.sharding.Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    if int(np.prod(axis_shapes)) != len(devices):
        raise ValueError(
            f"mesh shape {tuple(axis_shapes)} != #devices {len(devices)}")
    auto = tuple(jax.sharding.AxisType.Auto for _ in axis_names)
    return jax.make_mesh(tuple(axis_shapes), tuple(axis_names),
                         axis_types=auto, devices=devices)


def data_mesh(n: Optional[int] = None) -> jax.sharding.Mesh:
    """1-D mesh over all (or the first n) devices — the layout for
    recommender SPMD: batch and table shards both ride this axis."""
    devs = jax.devices() if n is None else jax.devices()[:n]
    return make_mesh((len(devs),), (DATA_AXIS,), devices=devs)
