"""Criteo-Kaggle input pipeline + synthetic generator.

Reference pipeline: ``modelzoo/WDL/train.py`` reads the Kaggle TSV
(label, 13 integer, 26 hex-categorical columns) through TextLineDataset.
Here parsing is host-side numpy (the TransCsv fused-parse role,
``core/kernels/trans_csv_ali_ops.cc``), emitting the framework batch
dict: numeric float32 arrays + SparseIds id matrices.

The synthetic generator draws categorical ids from Zipf-like
distributions (realistic hot-key skew for the sharded exchange) and
labels from a hidden per-id weight model, so AUC lift is measurable
without the real dataset (zero-egress environment).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from deeprec_tpu.feature_column.feature_column import SparseIds

NUM_INT = 13
NUM_CAT = 26


def _batch_from_np(labels, ints, cats) -> Dict:
    batch = {"label": labels.astype(np.float32)}
    for i in range(NUM_INT):
        batch[f"I{i+1}"] = ints[:, i].astype(np.float32)
    for i in range(NUM_CAT):
        ids = SparseIds.from_numpy(cats[:, i:i + 1])  # [B, 1] bags
        batch[f"C{i+1}"] = ids
        batch[f"C{i+1}_wide"] = ids  # wide columns reuse the same ids
    return batch


class SyntheticCriteo:
    """Deterministic synthetic stream with learnable structure."""

    def __init__(self, batch_size: int, vocab: int = 10000,
                 seed: int = 0, zipf_a: float = 1.2):
        self.batch_size = batch_size
        self.vocab = vocab
        self.rng = np.random.default_rng(seed)
        self.zipf_a = zipf_a
        w_rng = np.random.default_rng(seed + 1)
        # Hidden ground-truth weights per (field, id-bucket).
        self._w_cat = w_rng.normal(0, 1.0, size=(NUM_CAT, 997))
        self._w_int = w_rng.normal(0, 0.5, size=(NUM_INT,))

    def next_batch(self) -> Dict:
        B = self.batch_size
        ints = self.rng.normal(0, 1, size=(B, NUM_INT)).astype(np.float32)
        # Zipf with cutoff at vocab; distinct fields get distinct offsets.
        z = self.rng.zipf(self.zipf_a, size=(B, NUM_CAT))
        cats = (z % self.vocab).astype(np.int64)
        cats = cats + np.arange(NUM_CAT, dtype=np.int64)[None, :] * (1 << 40)
        logit = ints @ self._w_int
        for f in range(NUM_CAT):
            logit = logit + self._w_cat[f, (cats[:, f] % 997).astype(int)]
        p = 1.0 / (1.0 + np.exp(-0.5 * logit))
        labels = (self.rng.random(B) < p).astype(np.float32)
        return _batch_from_np(labels, ints, cats)

    def __iter__(self) -> Iterator[Dict]:
        while True:
            yield self.next_batch()


class SyntheticMultiTask(SyntheticCriteo):
    """Criteo-style features with (click, conversion) labels for the
    multi-task zoo; conversion only happens on clicked impressions
    (the ESMM entire-space assumption)."""

    def next_batch(self) -> Dict:
        batch = super().next_batch()
        click = batch.pop("label")
        B = click.shape[0]
        conv_p = 1.0 / (1.0 + np.exp(
            -(batch["I1"] + batch["I2"])))
        conversion = ((self.rng.random(B) < conv_p) & (click > 0.5)
                      ).astype(np.float32)
        batch["click"] = click
        batch["conversion"] = conversion
        return batch


def parse_criteo_lines(lines, hash_mod: Optional[int] = None):
    """Parse raw Kaggle TSV lines -> (labels, ints, cats int64).

    Missing ints -> 0; categorical hex tokens hashed to int64 with a
    per-field offset so fields don't collide in shared tables.
    """
    B = len(lines)
    labels = np.zeros((B,), np.float32)
    ints = np.zeros((B, NUM_INT), np.float32)
    cats = np.zeros((B, NUM_CAT), np.int64)
    for r, line in enumerate(lines):
        parts = line.rstrip("\n").split("\t")
        labels[r] = float(parts[0] or 0)
        for i in range(NUM_INT):
            v = parts[1 + i] if 1 + i < len(parts) else ""
            ints[r, i] = float(v) if v else 0.0
        for i in range(NUM_CAT):
            v = parts[1 + NUM_INT + i] if 1 + NUM_INT + i < len(parts) else ""
            h = int(v, 16) if v else 0
            if hash_mod:
                h %= hash_mod
            cats[r, i] = h + (i << 40)
    # log-normalize ints as the modelzoo does
    ints = np.sign(ints) * np.log1p(np.abs(ints))
    return labels, ints, cats


def criteo_file_batches(path: str, batch_size: int,
                        hash_mod: Optional[int] = None,
                        use_native: bool = True) -> Iterator[Dict]:
    """Stream batches from a Kaggle-format TSV file.

    With ``use_native`` (and no ``hash_mod``), parsing runs through the
    C++ fused parser (``native.parse_criteo``, the TransCsv role) —
    roughly an order of magnitude faster than the Python line loop, so
    the host keeps up with the device at production batch sizes.
    """
    from deeprec_tpu import native
    if use_native and hash_mod is None and native.have_native():
        tail = b""
        with open(path, "rb") as f:
            while True:
                chunk = f.read(1 << 22)
                if not chunk:
                    break
                data = tail + chunk
                off = 0
                while True:
                    rows, labels, dense, cats, consumed = \
                        native.parse_criteo(data[off:], batch_size)
                    if rows < batch_size:
                        break
                    yield _batch_from_np(labels, dense, cats)
                    off += consumed
                tail = data[off:]
        if tail:
            rows, labels, dense, cats, _ = native.parse_criteo(
                tail + b"\n" if not tail.endswith(b"\n") else tail,
                batch_size)
            if rows:
                yield _batch_from_np(labels[:rows], dense[:rows],
                                     cats[:rows])
        return
    buf = []
    with open(path) as f:
        for line in f:
            buf.append(line)
            if len(buf) == batch_size:
                yield _batch_from_np(*parse_criteo_lines(buf, hash_mod))
                buf = []
    if buf:
        yield _batch_from_np(*parse_criteo_lines(buf, hash_mod))
