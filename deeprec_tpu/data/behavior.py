"""Synthetic user-behavior-sequence stream (Amazon-Books / Taobao shape).

Feeds DIN/DIEN/BST/DSSM (reference datasets:
``modelzoo/DIN/README.md:234``, ``modelzoo/DSSM/README.md:249``): a
candidate item + category, the user's recent item/category sequence,
and a click label whose logit mixes FOUR components so each sequence
architecture has signal only it can fully capture (round-1 lesson:
uniform item draws + mean-affinity-only labels left the attention
models at chance — items were too rare to learn and order carried no
information):

  * mean-history affinity  — what DIN attention / mean-pooling sees;
  * recency-weighted affinity (exponential decay toward the past) —
    sequence ORDER matters, the DIEN interest-evolution signal;
  * category match (candidate category present in history) — the
    hard-attention component;
  * per-user bias.

Items are drawn Zipf within cluster-coherent histories: every item
belongs to a latent cluster, users prefer one cluster, and candidates
come from the user's cluster half the time — so head items recur often
enough that per-id embeddings are learnable in a short run.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from deeprec_tpu.feature_column.feature_column import SparseIds
from deeprec_tpu.utils import keys as keylib


class SyntheticBehavior:
    def __init__(self, batch_size: int, num_items: int = 2000,
                 num_cats: int = 100, num_users: int = 1000,
                 seq_len: int = 20, seed: int = 0,
                 n_clusters: int = 32, zipf_a: float = 1.3,
                 w_aff: float = 1.0, w_rec: float = 1.0,
                 w_cat: float = 0.8, w_user: float = 0.4,
                 recency_decay: float = 0.8):
        self.batch_size = batch_size
        self.num_items = num_items
        self.num_cats = num_cats
        self.num_users = num_users
        self.seq_len = seq_len
        self.nc = min(n_clusters, num_items)
        self.zipf_a = zipf_a
        self.w = np.array([w_aff, w_rec, w_cat, w_user])
        self.decay = recency_decay
        self.rng = np.random.default_rng(seed)
        r = np.random.default_rng(seed + 1)
        # Latent item vectors: cluster center + item noise, so affinity
        # aligns with the cluster structure the histories follow.
        centers = r.normal(0, 1, size=(self.nc, 8))
        self._item_vec = (centers[np.arange(num_items) % self.nc]
                          + 0.5 * r.normal(0, 1, size=(num_items, 8)))
        # Categories correlate with clusters (several cats per cluster).
        self._cat_of = ((np.arange(num_items) % self.nc)
                        * max(1, num_cats // self.nc)
                        + r.integers(0, max(1, num_cats // self.nc),
                                     size=num_items)) % num_cats
        self._user_bias = r.normal(0, 1, size=num_users)
        self._user_cluster = r.integers(0, self.nc, size=num_users)
        self._norm = None

    def _zipf_item_in_cluster(self, cluster, size):
        """Zipf-ranked item of a cluster: rank r -> r-th item with
        item % nc == cluster."""
        per = max(1, self.num_items // self.nc)
        r = self.rng.zipf(self.zipf_a, size=size) % per
        return (cluster + self.nc * r) % self.num_items

    def _logit_parts(self, item, seq, seq_lens, user):
        T = seq.shape[1]
        mask = np.arange(T)[None, :] < seq_lens[:, None]
        iv = self._item_vec
        cand = iv[item]                                        # [B, 8]
        hist = (iv[seq] * mask[:, :, None]).sum(1) / np.maximum(
            seq_lens[:, None], 1)
        aff = (hist * cand).sum(1)
        # Recency: weight w_t = decay^(len-1-t) for t < len (latest = 1).
        age = (seq_lens[:, None] - 1 - np.arange(T)[None, :])
        w_t = np.where(mask, self.decay ** np.maximum(age, 0), 0.0)
        rec_hist = (iv[seq] * w_t[:, :, None]).sum(1) / np.maximum(
            w_t.sum(1, keepdims=True), 1e-6)
        rec = (rec_hist * cand).sum(1)
        cat_match = (np.where(mask, self._cat_of[seq], -1)
                     == self._cat_of[item][:, None]).any(1).astype(float)
        bias = self._user_bias[user]
        return np.stack([aff, rec, cat_match - cat_match.mean(), bias], 0)

    def logits(self, item, seq, seq_lens, user) -> np.ndarray:
        parts = self._logit_parts(item, seq, seq_lens, user)
        if self._norm is None:
            self._norm = parts.std(1) + 1e-6
        return (self.w[:, None] * parts / self._norm[:, None]).sum(0)

    def next_batch(self) -> Dict:
        B, T = self.batch_size, self.seq_len
        rng = self.rng
        user = rng.integers(0, self.num_users, size=B)
        cu = self._user_cluster[user]
        # Cluster-coherent history with 20% random exploration.
        seq = self._zipf_item_in_cluster(cu[:, None], (B, T)).astype(np.int64)
        explore = rng.random((B, T)) < 0.2
        seq = np.where(explore,
                       rng.integers(0, self.num_items, size=(B, T)), seq)
        seq_lens = rng.integers(1, T + 1, size=B)
        # Candidate: half in-cluster, half random.
        in_c = rng.random(B) < 0.5
        item = np.where(
            in_c, self._zipf_item_in_cluster(cu, B),
            rng.integers(0, self.num_items, size=B)).astype(np.int64)

        logit = self.logits(item, seq, seq_lens, user)
        p = 1.0 / (1.0 + np.exp(-logit))
        label = (rng.random(B) < p).astype(np.float32)

        mask = np.arange(T)[None, :] < seq_lens[:, None]
        item = item[:, None]
        # Per-field key offsets keep id spaces disjoint in shared tables.
        seq_pad = np.where(mask, seq, keylib.EMPTY_ID)
        cats = self._cat_of[item[:, 0]][:, None].astype(np.int64) + (1 << 41)
        seq_cats = np.where(
            mask, self._cat_of[seq].astype(np.int64) + (1 << 41),
            keylib.EMPTY_ID)
        return {
            "label": label,
            "user": SparseIds.from_numpy(user[:, None].astype(np.int64)
                                         + (1 << 42)),
            "item": SparseIds.from_numpy(item),
            "cat": SparseIds.from_numpy(cats),
            "seq_items": SparseIds.from_numpy(seq_pad),
            "seq_cats": SparseIds.from_numpy(seq_cats),
        }

    def __iter__(self):
        while True:
            yield self.next_batch()
