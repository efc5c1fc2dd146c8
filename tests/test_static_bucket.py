"""Static hash-bucket columns — the reference's DEFAULT column type
(``categorical_column_with_hash_bucket`` + ``embedding_column``,
``modelzoo/WDL/train.py:348,400``): a fully-initialized
[num_buckets, dim] matrix addressed by ``id mod num_buckets`` with
collisions by design, trained sparsely.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from deeprec_tpu import config as cfglib
from deeprec_tpu.embedding import variable as ev
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       NumericColumn,
                                                       SparseIds)
from deeprec_tpu.utils import keys as keylib


def _group(coalesce=True, dims=(8, 8, 4)):
    cols = [NumericColumn("I1")] + [
        EmbeddingColumn(name=f"C{i+1}", dim=d, num_buckets=100 + 50 * i,
                        static_bucket=True)
        for i, d in enumerate(dims)]
    return EmbeddingGroup(cols, coalesce=coalesce)


def _batch(group, rng, B=64, vocab=10**9):
    b = {"I1": rng.normal(size=(B,)).astype(np.float32),
         "label": rng.integers(0, 2, size=(B,)).astype(np.float32)}
    for c in group.embedding:
        b[c.name] = SparseIds.from_numpy(
            rng.integers(0, vocab, size=(B, 1)).astype(np.int64))
    return b


def test_same_dim_columns_coalesce_by_offset():
    g = _group(dims=(8, 8, 4))
    # Two dim-8 columns share one matrix with disjoint row ranges;
    # the dim-4 one is its own table.
    phys = {g.physical_table_of(c) for c in g.embedding}
    assert len(phys) == 2
    offs = {n: g._static_map[n] for n in ("C1", "C2")}
    o1, n1 = offs["C1"]
    o2, n2 = offs["C2"]
    assert {o1, o2} == {0, min(n1, n2) if o2 else n1} or o1 + n1 <= o2 \
        or o2 + n2 <= o1  # disjoint ranges


def test_mod_addressing_and_collisions():
    g = _group(coalesce=False, dims=(8,))
    cfg = g.tables["C1"]
    assert cfg.static_buckets and cfg.capacity == 100
    state = ev.create(cfg)
    # Same id mod N -> same row (collision by design).
    ids = np.asarray([7, 107, 207, 5], np.int64)
    hi, lo = g.transform_ids_np(g.embedding[0], ids)
    rows = np.asarray(ev.lookup(cfg, state, jnp.asarray(hi),
                                jnp.asarray(lo)))
    np.testing.assert_array_equal(rows[0], rows[1])
    np.testing.assert_array_equal(rows[0], rows[2])
    assert not np.allclose(rows[0], rows[3])
    # Matrix is initialized (not zeros) at creation.
    assert np.abs(rows).sum() > 0


def test_train_updates_only_touched_rows_and_matches_grad():
    g = _group(coalesce=False, dims=(8,))
    cfg = g.tables["C1"]
    state = ev.create(cfg)
    ids = np.asarray([3, 103, 9], np.int64)  # 3 and 103 collide
    hi, lo = g.transform_ids_np(g.embedding[0], ids)
    state2, occ = ev.lookup_train_static(
        cfg, state, jnp.asarray(hi), jnp.asarray(lo), 0)
    inv = np.asarray(occ.inverse)
    assert inv[0] == inv[1] != inv[2]
    # State passes through untouched by lookup.
    np.testing.assert_array_equal(np.asarray(state.values),
                                  np.asarray(state2.values))
    # A sparse-adagrad apply updates exactly the touched rows.
    from deeprec_tpu.optimizers import sparse as sopt
    opt = sopt.SparseAdagrad(learning_rate=0.5)
    slots0 = opt.init(cfg)
    grows = jnp.ones_like(occ.lk.rows)
    sl, values = opt.apply(cfg, slots0, state2.values, occ.lk, grows, 0)
    diff = np.abs(np.asarray(values) - np.asarray(state2.values)).sum(1)
    touched = np.zeros(cfg.capacity + 1, bool)
    touched[np.asarray(occ.lk.slots)[np.asarray(occ.lk.admitted)]] = True
    assert (diff[~touched] == 0).all()
    assert (diff[touched[: cfg.capacity + 1]][:2] > 0).all()


def test_static_wdl_end_to_end_loss_drops():
    from deeprec_tpu.models import wdl
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses
    from deeprec_tpu.optimizers import sparse as sopt

    g = _group()
    rng = np.random.default_rng(0)
    model = wdl.WDL(hidden=(16, 8), dtype=jnp.float32)
    b0 = g.pack_batch(_batch(g, rng, vocab=200))

    @jax.jit
    def _init(states, b, key):
        _, gl = g.lookup_train(states, b, 0)
        embs = g.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        return model.init(key, embs, g.numeric_features(b))["params"]

    params = _init(g.create_state(), b0, jax.random.key(0))
    opt = sopt.SparseAdagrad(learning_rate=0.2)
    tx = optax.adagrad(0.2)
    ts = trainlib.create_train_state(g, params, tx, opt)

    def fixed_label_batch():
        b = _batch(g, rng, B=256, vocab=200)
        ids = np.asarray([s.hi for s in [b["C1"]]])  # noqa: F841
        # Learnable structure: label depends on C1's id parity.
        raw = np.asarray(keylib.join_ids(np.asarray(b["C1"].hi),
                                         np.asarray(b["C1"].lo)))[:, 0]
        b["label"] = (raw % 2).astype(np.float32)
        return g.pack_batch(b)

    step = trainlib.make_train_step(
        g, wdl.apply_fn(model, g),
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx, donate=False)
    ls = []
    for i in range(60):
        ts, m = step(ts, fixed_label_batch())
        ls.append(float(m["loss"]))
    assert np.mean(ls[-10:]) < np.mean(ls[:10]) - 0.05
    assert int(m["n_overflow"]) == 0


def test_static_checkpoint_roundtrip(tmp_path):
    from deeprec_tpu.models import wdl
    from deeprec_tpu.train import loop as trainlib
    from deeprec_tpu.train import losses
    from deeprec_tpu.train.checkpoint import CheckpointManager
    from deeprec_tpu.optimizers import sparse as sopt

    g = _group()
    rng = np.random.default_rng(1)
    model = wdl.WDL(hidden=(8,), dtype=jnp.float32)
    b0 = g.pack_batch(_batch(g, rng))

    @jax.jit
    def _init(states, b, key):
        _, gl = g.lookup_train(states, b, 0)
        embs = g.combine(gl, {t: lk.rows for t, lk in gl.lks.items()})
        return model.init(key, embs, g.numeric_features(b))["params"]

    params = _init(g.create_state(), b0, jax.random.key(1))
    opt = sopt.SparseAdagrad(learning_rate=0.1)
    tx = optax.adagrad(0.1)
    ts = trainlib.create_train_state(g, params, tx, opt)
    step = trainlib.make_train_step(
        g, wdl.apply_fn(model, g),
        lambda out, b: losses.bce_with_logits(out, b["label"]),
        opt, tx, donate=False)
    for _ in range(3):
        ts, _ = step(ts, g.pack_batch(_batch(g, rng)))
    mgr = CheckpointManager(str(tmp_path), g)
    mgr.save(ts)
    ts2 = mgr.restore(trainlib.create_train_state(g, params, tx, opt))
    evs = trainlib.make_eval_step(g, wdl.apply_fn(model, g))
    np.testing.assert_allclose(np.asarray(evs(ts, b0)),
                               np.asarray(evs(ts2, b0)), rtol=1e-6)
    # Training continues bit-identically after restore.
    nb = g.pack_batch(_batch(g, rng))
    a, ma = step(ts, nb)
    b, mb = step(ts2, nb)
    assert float(ma["loss"]) == float(mb["loss"])


def test_static_requires_num_buckets():
    with pytest.raises(ValueError):
        EmbeddingColumn(name="x", dim=4, static_bucket=True).table_config()


def test_mod_of_matches_exact_uint64_mod():
    """Device ``keylib.mod_of`` must equal the host's exact
    ``ids.view(uint64) % m`` for ALL m (ADVICE r3: the uint32 fold
    overflowed for m > 65537, silently mis-slotting Criteo-sized
    bucket tables)."""
    rng = np.random.default_rng(7)
    ids = np.concatenate([
        rng.integers(0, 2**62, size=64).astype(np.int64),
        rng.integers(-(2**62), 0, size=32).astype(np.int64),
        np.asarray([0, 1, 123456789012345, 2**31, 2**32, 2**33 + 5,
                    np.iinfo(np.int64).max, -1, -(2**40)], np.int64),
    ])
    hi, lo = keylib.split_ids(ids)
    want_all = ids.view(np.uint64)
    for m in (1, 2, 7, 100, 1350, 65536, 65537, 65538, 300000,
              999983, 2**20, 2**24 + 3, 2**31 - 1):
        got = np.asarray(keylib.mod_of(jnp.asarray(hi), jnp.asarray(lo), m))
        want = (want_all % np.uint64(m)).astype(np.int64)
        np.testing.assert_array_equal(
            got.astype(np.int64), want, err_msg=f"m={m}")


def test_device_host_static_transform_agree_large_buckets():
    """transform_ids (device) vs transform_ids_np (host) on a
    300000-bucket static column — the exact regression from ADVICE r3
    (id 123456789012345 mod 300000 must be 12345 on both paths)."""
    col = EmbeddingColumn(name="big", dim=4, num_buckets=300000,
                          static_bucket=True)
    g = EmbeddingGroup([col], coalesce=False)
    rng = np.random.default_rng(3)
    ids = np.concatenate([
        np.asarray([123456789012345, 0, 299999, 300000, 2**33 + 17],
                   np.int64),
        rng.integers(0, 2**62, size=200).astype(np.int64),
    ])[:, None]
    hi_h, lo_h = g.transform_ids_np(col, ids)
    hi, lo = keylib.split_ids(ids)
    hi_d, lo_d = g.transform_ids(col, jnp.asarray(hi), jnp.asarray(lo))
    np.testing.assert_array_equal(np.asarray(hi_d), hi_h)
    np.testing.assert_array_equal(np.asarray(lo_d), lo_h)
    assert int(lo_h[0, 0]) == 12345
