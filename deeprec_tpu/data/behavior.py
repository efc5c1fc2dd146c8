"""Synthetic user-behavior-sequence stream (Amazon-Books / Taobao shape).

Feeds DIN/DIEN/BST/DSSM (reference datasets:
``modelzoo/DIN/README.md:234``, ``modelzoo/DSSM/README.md:249``): a
candidate item + category, the user's recent item/category sequence,
and a click label correlated with sequence-candidate affinity so the
attention models have signal to learn.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from deeprec_tpu.feature_column.feature_column import SparseIds
from deeprec_tpu.utils import keys as keylib


class SyntheticBehavior:
    def __init__(self, batch_size: int, num_items: int = 2000,
                 num_cats: int = 100, num_users: int = 1000,
                 seq_len: int = 20, seed: int = 0):
        self.batch_size = batch_size
        self.num_items = num_items
        self.num_cats = num_cats
        self.num_users = num_users
        self.seq_len = seq_len
        self.rng = np.random.default_rng(seed)
        r = np.random.default_rng(seed + 1)
        # Latent item/user vectors drive labels.
        self._item_vec = r.normal(0, 1, size=(num_items, 8))
        self._cat_of = r.integers(0, num_cats, size=num_items)

    def next_batch(self) -> Dict:
        B, T = self.batch_size, self.seq_len
        rng = self.rng
        user = rng.integers(0, self.num_users, size=(B, 1)).astype(np.int64)
        seq = rng.integers(0, self.num_items, size=(B, T)).astype(np.int64)
        seq_lens = rng.integers(1, T + 1, size=B)
        item = rng.integers(0, self.num_items, size=(B, 1)).astype(np.int64)

        mask = np.arange(T)[None, :] < seq_lens[:, None]
        # Affinity between candidate and the user's (masked) history.
        iv = self._item_vec
        hist = (iv[seq] * mask[:, :, None]).sum(1) / np.maximum(
            seq_lens[:, None], 1)
        aff = (hist * iv[item[:, 0]]).sum(1)
        p = 1.0 / (1.0 + np.exp(-1.5 * aff))
        label = (rng.random(B) < p).astype(np.float32)

        # Per-field key offsets keep id spaces disjoint in shared tables.
        seq_pad = np.where(mask, seq, keylib.EMPTY_ID)
        cats = self._cat_of[item[:, 0]][:, None].astype(np.int64) + (1 << 41)
        seq_cats = np.where(
            mask, self._cat_of[seq].astype(np.int64) + (1 << 41),
            keylib.EMPTY_ID)
        return {
            "label": label,
            "user": SparseIds.from_numpy(user + (1 << 42)),
            "item": SparseIds.from_numpy(item),
            "cat": SparseIds.from_numpy(cats),
            "seq_items": SparseIds.from_numpy(seq_pad),
            "seq_cats": SparseIds.from_numpy(seq_cats),
        }

    def __iter__(self):
        while True:
            yield self.next_batch()
