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

# Reference per-column Criteo cardinalities and WDL embedding dims
# (``modelzoo/WDL/train.py:40-96`` HASH_BUCKET_SIZES /
# EMBEDDING_DIMENSIONS; DeepFM shares the bucket table, DLRM uses a
# uniform 10000 / dim 16 — ``modelzoo/DLRM/train.py:330-393``).
CRITEO_HASH_BUCKETS = [
    2500, 2000, 300000, 250000, 1000, 100, 20000, 4000, 20, 100000,
    10000, 250000, 40000, 100, 100, 200000, 50, 10000, 4000, 20,
    250000, 100, 100, 250000, 400, 100000]
WDL_EMBEDDING_DIMS = [
    64, 64, 128, 128, 64, 64, 64, 64, 64, 128, 64, 128, 64, 64, 64,
    128, 64, 64, 64, 64, 128, 64, 64, 128, 64, 128]


def capacity_for(bucket: int, ceiling: Optional[int] = None,
                 headroom: float = 1.3) -> int:
    """Power-of-two EV capacity covering a reference hash-bucket count
    with probe headroom, optionally clipped (CPU accuracy runs)."""
    cap = 1 << max(8, int(np.ceil(np.log2(bucket * headroom))))
    return min(cap, ceiling) if ceiling else cap


def batch_np_dict(labels, ints, cats, wide: bool = True) -> Dict:
    """Raw numpy batch (no device transfer) for
    ``EmbeddingGroup.pack_batch_np`` — the host-packing fast path of
    the production input pipeline.

    ``wide=False`` skips the ``C*_wide`` duplicate id columns for
    models built with ``wide_in_deep=True`` (which have no wide
    embedding columns): shipping them would add ~40% dead H2D per step
    through ``pack_batch_np``'s passthrough.
    """
    batch = {"label": labels.astype(np.float32)}
    for i in range(NUM_INT):
        batch[f"I{i+1}"] = ints[:, i].astype(np.float32)
    for i in range(NUM_CAT):
        ids = cats[:, i:i + 1]
        batch[f"C{i+1}"] = ids
        if wide:
            batch[f"C{i+1}_wide"] = ids
    return batch


def _batch_from_np(labels, ints, cats, wide: bool = True) -> Dict:
    batch = {"label": labels.astype(np.float32)}
    for i in range(NUM_INT):
        batch[f"I{i+1}"] = ints[:, i].astype(np.float32)
    for i in range(NUM_CAT):
        ids = SparseIds.from_numpy(cats[:, i:i + 1])  # [B, 1] bags
        batch[f"C{i+1}"] = ids
        if wide:
            batch[f"C{i+1}_wide"] = ids  # wide columns reuse the same ids
    return batch


class SyntheticCriteo:
    """Deterministic synthetic stream with interaction-structured labels.

    The label logit is a sum of FOUR ground-truth components so that
    every architecture family in the zoo has signal only it can fully
    capture (round-1 lesson: a purely field-additive logit leaves
    interaction-only paths like DLRM's dot-interaction at chance):

      * ``w_linear`` — per-field id effects + dense linear (wide/linear
        towers represent this exactly);
      * ``w_fm`` — pairwise FM term ``sum_{f<g} <V_f[id], V_g[id]>``
        over latent factors (DeepFM's FM head / DLRM's dot-interaction
        represent this exactly; a linear model cannot);
      * ``w_cross`` — dense×categorical cross ``(x·u_f) * s_f[id]``;
      * ``w_quad`` — dense quadratic (bottom-MLP food).

    Ids are drawn Zipf per field (realistic hot-key skew, and the head
    recurs often enough that per-id embeddings are learnable in a short
    run), with per-field cardinalities ``vocab`` (int or per-field list
    — pass the reference's ``HASH_BUCKET_SIZES`` shape,
    ``modelzoo/WDL/train.py:40-66``).
    """

    def __init__(self, batch_size: int, vocab=10000,
                 seed: int = 0, zipf_a: float = 1.2,
                 w_linear: float = 0.8, w_fm: float = 1.5,
                 w_cross: float = 0.8, w_quad: float = 0.5,
                 fm_dim: int = 4, n_buckets: int = 2048):
        self.batch_size = batch_size
        if np.isscalar(vocab):
            self.vocab = np.full(NUM_CAT, int(vocab), np.int64)
        else:
            self.vocab = np.asarray(list(vocab), np.int64)
            assert self.vocab.shape == (NUM_CAT,)
        self.rng = np.random.default_rng(seed)
        self.zipf_a = zipf_a
        w_rng = np.random.default_rng(seed + 1)
        nb = n_buckets
        self._nb = nb
        # Ground truth per (field, id-bucket): linear weights, FM latent
        # factors, dense-cross gains.
        self._w_cat = w_rng.normal(0, 1.0, size=(NUM_CAT, nb))
        self._w_int = w_rng.normal(0, 1.0, size=(NUM_INT,))
        self._V = w_rng.normal(0, 1.0, size=(NUM_CAT, nb, fm_dim))
        # FM over a sparse set of field pairs keeps the per-pair signal
        # strong (all 325 pairs would average each other out).
        pairs = [(f, (f * 7 + 3) % NUM_CAT) for f in range(NUM_CAT)]
        self._pairs = [(a, b) for a, b in pairs if a != b][:16]
        self._u = w_rng.normal(0, 1.0, size=(4, NUM_INT))
        self._s = w_rng.normal(0, 1.0, size=(4, nb))
        self._cross_fields = [1, 5, 9, 16]
        # Normalizers so each component contributes unit variance before
        # the w_* scales (estimated on a probe draw).
        self.w_linear, self.w_fm = w_linear, w_fm
        self.w_cross, self.w_quad = w_cross, w_quad
        self._norm = None

    def _draw(self, B):
        ints = self.rng.normal(0, 1, size=(B, NUM_INT)).astype(np.float32)
        z = self.rng.zipf(self.zipf_a, size=(B, NUM_CAT))
        cats = (z % self.vocab[None, :]).astype(np.int64)
        return ints, cats

    def _logit_parts(self, ints, cats):
        b = (cats % self._nb)
        lin = ints @ self._w_int / np.sqrt(NUM_INT)
        lin = lin + np.take_along_axis(
            self._w_cat.T, b, axis=0).sum(1) / np.sqrt(NUM_CAT)
        fm = np.zeros(ints.shape[0])
        for f, g in self._pairs:
            fm += (self._V[f, b[:, f]] * self._V[g, b[:, g]]).sum(1)
        cross = np.zeros(ints.shape[0])
        for k, f in enumerate(self._cross_fields):
            cross += (ints @ self._u[k]) * self._s[k, b[:, f]]
        quad = (ints[:, :6] * ints[:, 6:12]).sum(1)
        return np.stack([lin, fm, cross, quad], 0)

    def logits(self, ints, cats) -> np.ndarray:
        """Ground-truth logit (Bayes-optimal score) for given features."""
        parts = self._logit_parts(ints, cats)
        if self._norm is None:
            # Probe normalization: fixed at first use for determinism.
            probe = self._logit_parts(*SyntheticCriteo._draw(self, 8192)) \
                if ints.shape[0] < 8192 else parts
            self._norm = probe.std(1) + 1e-6
        w = np.array([self.w_linear, self.w_fm, self.w_cross, self.w_quad])
        return (w[:, None] * parts / self._norm[:, None]).sum(0)

    def next_batch(self) -> Dict:
        B = self.batch_size
        ints, cats = self._draw(B)
        logit = self.logits(ints, cats)
        p = 1.0 / (1.0 + np.exp(-logit))
        labels = (self.rng.random(B) < p).astype(np.float32)
        # Distinct per-field offsets keep id spaces disjoint in shared
        # tables (matches the reference's per-field hashing).
        cats = cats + np.arange(NUM_CAT, dtype=np.int64)[None, :] * (1 << 40)
        return _batch_from_np(labels, ints, cats)

    def __iter__(self) -> Iterator[Dict]:
        while True:
            yield self.next_batch()


class SyntheticMultiTask(SyntheticCriteo):
    """Criteo-style features with (click, conversion) labels for the
    multi-task zoo; conversion only happens on clicked impressions
    (the ESMM entire-space assumption)."""

    def next_batch(self) -> Dict:
        B = self.batch_size
        ints, cats = self._draw(B)
        logit = self.logits(ints, cats)
        click = (self.rng.random(B) <
                 1.0 / (1.0 + np.exp(-logit))).astype(np.float32)
        # Conversion has its own (correlated but distinct) structure:
        # dense linear + a categorical term on rotated fields.
        b = cats % self._nb
        rot = self._w_cat[(np.arange(NUM_CAT) + 3) % NUM_CAT]  # [C, nb]
        conv_logit = (ints[:, 0] + ints[:, 1]
                      + np.take_along_axis(rot.T, b, axis=0).sum(1)
                      / np.sqrt(NUM_CAT))
        conv_p = 1.0 / (1.0 + np.exp(-conv_logit))
        conversion = ((self.rng.random(B) < conv_p) & (click > 0.5)
                      ).astype(np.float32)
        cats = cats + np.arange(NUM_CAT, dtype=np.int64)[None, :] * (1 << 40)
        batch = _batch_from_np(click, ints, cats)
        batch.pop("label")
        batch["click"] = click
        batch["conversion"] = conversion
        return batch


def parse_criteo_lines(lines, hash_mod: Optional[int] = None):
    """Parse raw Kaggle TSV lines -> (labels, ints, cats int64).

    Missing ints -> 0; categorical hex tokens hashed to int64 with a
    per-field offset so fields don't collide in shared tables (non-hex
    tokens string-hash, matching ``native.parse_criteo``).
    """
    from deeprec_tpu import native as _native
    mask40 = (1 << 40) - 1
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
            if not v:
                h = 0
            elif all(c in "0123456789abcdefABCDEF" for c in v):
                h = int(v, 16) & mask40
            else:
                h = int(_native.hash_bytes([v])[0]) & mask40
            if hash_mod:
                h %= hash_mod
            cats[r, i] = h + (i << 40)
    # log-normalize ints as the modelzoo does
    ints = np.sign(ints) * np.log1p(np.abs(ints))
    return labels, ints, cats


def criteo_file_batches(path: str, batch_size: int,
                        hash_mod: Optional[int] = None,
                        use_native: bool = True,
                        as_numpy: bool = False,
                        wide: bool = True,
                        id_bits: Optional[int] = None) -> Iterator[Dict]:
    """Stream batches from a Kaggle-format TSV file.

    With ``use_native`` (and no ``hash_mod``), parsing runs through the
    C++ fused parser (``native.parse_criteo``, the TransCsv role) —
    roughly an order of magnitude faster than the Python line loop, so
    the host keeps up with the device at production batch sizes.

    ``as_numpy`` keeps batches on host (``batch_np_dict``) for the
    ``pack_batch_np`` fast path — no per-column device transfers.

    ``id_bits`` truncates categorical ids to the low N hash bits and
    drops the per-field ``i << 40`` offsets.  ``id_bits=31`` makes every
    id int32-representable so ``pack_batch_np(compact=True)`` can ship
    half-width id planes.  Sound because (a) each C column is its own
    logical table and coalesced groups salt per member, so cross-field
    disjointness never depends on the offsets, and (b) a 31-bit hash
    space loses only birthday-scale aliasing *within* a column — the
    reference's non-EV mode mods the same hash into 2.5k–300k buckets
    (``modelzoo/WDL/train.py:40-66``), orders of magnitude lossier.
    """
    base_mk = batch_np_dict if as_numpy else _batch_from_np

    def mk(labels, dense, cats):
        if id_bits is not None:
            # offsets live at bits >= 40, so one mask strips both.
            cats = np.asarray(cats) & np.int64((1 << id_bits) - 1)
        return base_mk(labels, dense, cats, wide=wide)
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
                    yield mk(labels, dense, cats)
                    off += consumed
                tail = data[off:]
        if tail:
            rows, labels, dense, cats, _ = native.parse_criteo(
                tail + b"\n" if not tail.endswith(b"\n") else tail,
                batch_size)
            if rows:
                yield mk(labels[:rows], dense[:rows], cats[:rows])
        return
    buf = []
    with open(path) as f:
        for line in f:
            buf.append(line)
            if len(buf) == batch_size:
                yield mk(*parse_criteo_lines(buf, hash_mod))
                buf = []
    if buf:
        yield mk(*parse_criteo_lines(buf, hash_mod))
