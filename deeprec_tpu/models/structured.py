"""StructuredModel: user/item subgraph split for sequence scoring.

Rebuild of ``contrib/structured_model/python/core.py:19-132``
("StructureFeature"): when scoring B users x N candidate items, the
user tower runs ONCE per user and is broadcast across that user's
items, instead of being recomputed N times.  In the reference this is
a graph transform (tile/gather insertion); under JAX it is a
composition contract: ``user_fn`` consumes [B, ...] user features,
``item_fn`` consumes [B, N, ...] item features, and ``join_fn`` sees
the broadcast pair — XLA never materializes N copies of the user
tower's compute.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def structured_score(
    user_fn: Callable[..., jax.Array],
    item_fn: Callable[..., jax.Array],
    join_fn: Callable[[jax.Array, jax.Array], jax.Array],
    user_inputs,
    item_inputs,
):
    """Score every (user, item) pair without user-tower recompute.

    user_fn(user_inputs) -> [B, Du]; item_fn(item_inputs) -> [B, N, Di];
    join_fn([B, N, Du], [B, N, Di]) -> [B, N] scores.
    """
    u = user_fn(user_inputs)                       # [B, Du]   computed once
    it = item_fn(item_inputs)                      # [B, N, Di]
    B, Du = u.shape
    N = it.shape[1]
    u_tiled = jnp.broadcast_to(u[:, None, :], (B, N, Du))
    return join_fn(u_tiled, it)


def dot_join(u, it):
    """Inner-product join head (two-tower scoring)."""
    return jnp.sum(u * it, axis=-1)


class StructuredModel:
    """Convenience wrapper bundling the three callables.

    ``apply(params, user_inputs, item_inputs)`` evaluates the split
    model; gradients flow through both towers as usual (the reference
    only supports inference-time splitting; here training works too).
    """

    def __init__(self, user_fn, item_fn, join_fn=dot_join):
        self.user_fn = user_fn
        self.item_fn = item_fn
        self.join_fn = join_fn

    def apply(self, params: Dict[str, Any], user_inputs, item_inputs):
        return structured_score(
            lambda ui: self.user_fn(params, ui),
            lambda ii: self.item_fn(params, ii),
            self.join_fn, user_inputs, item_inputs)
