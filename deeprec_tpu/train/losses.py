"""Loss functions. Per-example losses: reduction is the trainer's job
(it must scale by the global batch size under SPMD so sparse-row
cotangents arrive with the right factor)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, labels):
    """Sigmoid cross-entropy per example: [B] -> [B]."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def softmax_ce_in_batch(user_vec, item_vec, temperature: float = 1.0):
    """In-batch sampled-softmax for two-tower retrieval (DSSM): each
    row's positive is the diagonal; other rows act as negatives."""
    u = user_vec / (jnp.linalg.norm(user_vec, axis=1, keepdims=True) + 1e-8)
    v = item_vec / (jnp.linalg.norm(item_vec, axis=1, keepdims=True) + 1e-8)
    logits = (u @ v.T) / temperature                    # [B, B]
    labels = jnp.arange(logits.shape[0])
    logp = jax.nn.log_softmax(logits, axis=1)
    return -logp[jnp.arange(logits.shape[0]), labels]   # [B]
