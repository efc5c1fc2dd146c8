"""Evaluation metrics.

AUC comes in two forms: exact per-batch (rank statistic) and a streaming
histogram accumulator for full-epoch eval, replacing the reference's
``tf.metrics.auc`` usage in modelzoo train loops
(``modelzoo/WDL/train.py`` eval section, AUC parity tables in the
modelzoo READMEs are the correctness bar — SURVEY §6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def batch_auc(logits, labels):
    """Exact AUC of one batch via the Mann-Whitney rank statistic."""
    scores = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    order = jnp.argsort(scores)
    ranks = jnp.zeros_like(scores).at[order].set(
        jnp.arange(1, scores.shape[0] + 1, dtype=jnp.float32))
    n_pos = jnp.sum(labels)
    n_neg = labels.shape[0] - n_pos
    pos_rank_sum = jnp.sum(ranks * labels)
    u = pos_rank_sum - n_pos * (n_pos + 1) / 2.0
    return jnp.where(n_pos * n_neg > 0, u / (n_pos * n_neg), 0.5)


class AucState(NamedTuple):
    """Streaming histogram AUC (matches tf.metrics.auc's thresholded
    approximation; 4096 buckets keeps the bias < 1e-4)."""

    pos: jax.Array  # [num_buckets]
    neg: jax.Array


def auc_init(num_buckets: int = 4096) -> AucState:
    return AucState(jnp.zeros((num_buckets,), jnp.float64)
                    if jax.config.jax_enable_x64
                    else jnp.zeros((num_buckets,), jnp.float32),
                    jnp.zeros((num_buckets,), jnp.float32))


def auc_update(state: AucState, logits, labels) -> AucState:
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    nb = state.pos.shape[0]
    idx = jnp.clip((p * nb).astype(jnp.int32), 0, nb - 1)
    lab = labels.astype(jnp.float32)
    pos = state.pos.at[idx].add(lab)
    neg = state.neg.at[idx].add(1.0 - lab)
    return AucState(pos, neg)


def auc_result(state: AucState):
    """Trapezoidal AUC over bucket thresholds."""
    pos = state.pos.astype(jnp.float64) if jax.config.jax_enable_x64 \
        else state.pos
    neg = state.neg
    total_pos = jnp.sum(pos)
    total_neg = jnp.sum(neg)
    # Cumulative from the high-score end: TPR/FPR per threshold.
    tp = jnp.cumsum(pos[::-1])
    fp = jnp.cumsum(neg[::-1])
    tpr = tp / jnp.maximum(total_pos, 1.0)
    fpr = fp / jnp.maximum(total_neg, 1.0)
    tpr = jnp.concatenate([jnp.zeros((1,), tpr.dtype), tpr])
    fpr = jnp.concatenate([jnp.zeros((1,), fpr.dtype), fpr])
    return jnp.sum((fpr[1:] - fpr[:-1]) * (tpr[1:] + tpr[:-1]) / 2.0)


def accuracy(logits, labels):
    pred = (jax.nn.sigmoid(logits.astype(jnp.float32)) >= 0.5)
    return jnp.mean(pred == (labels > 0.5))


def recall_at_k(user_vec, item_vec, k: int = 10):
    """In-batch recall@k for two-tower eval (DSSM,
    ``modelzoo/DSSM/README.md`` recall metric)."""
    u = user_vec / (np.linalg.norm(user_vec, axis=1, keepdims=True) + 1e-8)
    v = item_vec / (np.linalg.norm(item_vec, axis=1, keepdims=True) + 1e-8)
    sims = u @ v.T
    topk = np.argsort(-sims, axis=1)[:, :k]
    hits = (topk == np.arange(len(u))[:, None]).any(axis=1)
    return hits.mean()
