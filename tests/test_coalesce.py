"""Table coalescing: merged physical tables must train identically
(up to init noise) to separate tables, and id salting must keep
distinct logical tables from aliasing.

Behavior model: ``python/feature_column/coalesced_utils.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from deeprec_tpu import config as cfglib
from deeprec_tpu.feature_column.feature_column import (EmbeddingColumn,
                                                       EmbeddingGroup,
                                                       SparseIds)
from deeprec_tpu.optimizers import sparse as sopt
from deeprec_tpu.train import loop as trainlib
from deeprec_tpu.train import losses


def _cols(n=4, dim=4, cap=1 << 8):
    return [EmbeddingColumn(name=f"c{i}", dim=dim, capacity=cap,
                            initializer="zeros", combiner="sum")
            for i in range(n)]


def _batch(rng, n_cols, B=16, vocab=50):
    ids = rng.integers(1, vocab, size=(B, n_cols, 1)).astype(np.int64)
    batch = {f"c{i}": SparseIds.from_numpy(ids[:, i]) for i in range(n_cols)}
    batch["label"] = jnp.asarray((ids.sum((1, 2)) % 2).astype(np.float32))
    return batch


def _afn(group):
    def fn(params, embs, batch):
        x = jnp.concatenate([embs[k] for k in sorted(embs)], axis=1)
        return jnp.sum(x * params["w"], axis=1)
    return fn


def test_coalesced_group_merges_compatible_tables():
    g = EmbeddingGroup(_cols(4), coalesce=True)
    assert len(g.tables) == 1
    (name, cfg), = g.tables.items()
    assert name.startswith("coalesced:")
    assert cfg.capacity == 1 << 10  # 4 * 256
    # distinct non-zero salts except possibly one
    salts = {g._phys_of[f"c{i}"][1] for i in range(4)}
    assert len(salts) == 4


def test_incompatible_tables_stay_separate():
    cols = _cols(2) + [EmbeddingColumn(name="big", dim=8, capacity=64,
                                       initializer="zeros")]
    g = EmbeddingGroup(cols, coalesce=True)
    assert len(g.tables) == 2
    assert "big" in g.tables


def test_coalesced_training_matches_separate():
    """Same data, zeros init, SGD: coalesced and separate groups must
    produce identical losses (the tables are independent either way)."""
    n = 3
    rng = np.random.default_rng(0)
    batches = [_batch(rng, n) for _ in range(6)]

    results = []
    for coalesce in (False, True):
        group = EmbeddingGroup(_cols(n), coalesce=coalesce)
        opt = sopt.SparseSGD(0.5)
        tx = optax.sgd(0.2)
        params = {"w": jnp.ones((n * 4,))}
        ts = trainlib.create_train_state(group, params, tx, opt)
        step = trainlib.make_train_step(
            group, _afn(group),
            lambda out, b: losses.bce_with_logits(out, b["label"]),
            opt, tx)
        ls = []
        for b in batches:
            ts, m = step(ts, b)
            ls.append(float(m["loss"]))
        results.append(ls)
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5)


def test_salting_prevents_cross_table_aliasing():
    """Two logical tables fed the SAME raw ids must not share rows."""
    cols = _cols(2)
    group = EmbeddingGroup(cols, coalesce=True)
    opt = sopt.SparseSGD(1.0)
    tx = optax.sgd(0.1)
    params = {"w": jnp.concatenate([jnp.ones((4,)), jnp.zeros((4,))])}
    ts = trainlib.create_train_state(group, params, tx, opt)

    ids = np.full((4, 1), 7, np.int64)
    batch = {"c0": SparseIds.from_numpy(ids),
             "c1": SparseIds.from_numpy(ids),
             "label": jnp.ones((4,), jnp.float32)}
    step = trainlib.make_train_step(
        group, _afn(group),
        lambda out, b: losses.bce_with_logits(out, b["label"]), opt, tx)
    ts, _ = step(ts, batch)
    # Only c0 contributes to the loss (w zeros over c1's slice), so
    # after one step c0's row moved but c1's row must still be zeros.
    ev_state = next(iter(ts.ev.values()))
    eval_step = trainlib.make_eval_step(group, lambda p, e, b: (
        e["c0"], e["c1"]))
    e0, e1 = eval_step(ts, batch)
    assert np.abs(np.asarray(e0)).max() > 0
    np.testing.assert_array_equal(np.asarray(e1), 0.0)


def test_eval_matches_train_view():
    n = 2
    rng = np.random.default_rng(1)
    group = EmbeddingGroup(_cols(n), coalesce=True)
    opt = sopt.SparseSGD(0.5)
    tx = optax.sgd(0.2)
    params = {"w": jnp.ones((n * 4,))}
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(
        group, _afn(group),
        lambda out, b: losses.bce_with_logits(out, b["label"]), opt, tx)
    b = _batch(rng, n)
    ts, _ = step(ts, b)
    out = trainlib.make_eval_step(group, _afn(group))(ts, b)
    assert np.isfinite(np.asarray(out)).all()


def test_remote_serving_with_coalesced_tables():
    from deeprec_tpu.serving.feature_store import (InMemoryFeatureStore,
                                                   RemoteServingModel,
                                                   publish_sparse)
    n = 2
    rng = np.random.default_rng(2)
    group = EmbeddingGroup(_cols(n), coalesce=True)
    opt = sopt.SparseSGD(0.5)
    tx = optax.sgd(0.2)
    params = {"w": jnp.ones((n * 4,))}
    ts = trainlib.create_train_state(group, params, tx, opt)
    step = trainlib.make_train_step(
        group, _afn(group),
        lambda out, b: losses.bce_with_logits(out, b["label"]), opt, tx)
    b = _batch(rng, n)
    ts, _ = step(ts, b)

    store = InMemoryFeatureStore()
    publish_sparse(ts, group, store)
    remote = RemoteServingModel(group, _afn(group), ts.params, store)
    got = np.asarray(remote.predict(b))
    want = np.asarray(trainlib.make_eval_step(group, _afn(group))(ts, b))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_packed_batch_matches_unpacked():
    """pack_batch shrinks the pytree; training must be identical."""
    n = 3
    rng = np.random.default_rng(4)
    batches = [_batch(rng, n) for _ in range(4)]
    results = []
    for packed in (False, True):
        group = EmbeddingGroup(_cols(n), coalesce=True)
        opt = sopt.SparseSGD(0.5)
        tx = optax.sgd(0.2)
        ts = trainlib.create_train_state(
            group, {"w": jnp.ones((n * 4,))}, tx, opt)
        step = trainlib.make_train_step(
            group, _afn(group),
            lambda out, b: losses.bce_with_logits(out, b["label"]),
            opt, tx, donate=False)
        ls = []
        for b in batches:
            bb = group.pack_batch(b) if packed else b
            ts, m = step(ts, bb)
            ls.append(float(m["loss"]))
        results.append(ls)
        if packed:
            # packed batch has far fewer leaves
            n_leaves_packed = len(jax.tree.leaves(group.pack_batch(
                batches[0])))
            n_leaves_plain = len(jax.tree.leaves(batches[0]))
            assert n_leaves_packed < n_leaves_plain
            # eval accepts packed batches too
            out = trainlib.make_eval_step(group, _afn(group))(
                ts, group.pack_batch(batches[0]))
            assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)


def test_member_salts_collision_free_for_dense_vocabs():
    """ADVICE r1: XOR-salting lo-only let dense raw-id vocabularies
    >= 2^25 alias across members. The hi-half salts must be pairwise
    distinct so ids sharing a hi word (any dense block < 2^32) can
    never collide across members."""
    from deeprec_tpu.feature_column.feature_column import _member_salt
    from deeprec_tpu.utils import keys as keylib
    salts = [_member_salt(i) for i in range(32)]
    his = [s[0] for s in salts]
    assert len(set(his)) == 32
    assert all(h != 0 and l != 0 for h, l in salts)

    # End-to-end: two members fed the same dense range map to disjoint
    # physical key sets.
    g = EmbeddingGroup(_cols(2, cap=1 << 6), coalesce=True)
    ids = np.arange(1 << 12, dtype=np.int64).reshape(-1, 1)
    s = SparseIds.from_numpy(ids)
    seen = set()
    for i in range(2):
        col = next(c for c in g.embedding if c.name == f"c{i}")
        hi, lo = g.transform_ids(col, s.hi, s.lo)
        keys = keylib.join_ids(np.asarray(hi).ravel(),
                               np.asarray(lo).ravel())
        ks = set(keys.tolist())
        assert len(ks) == ids.size          # transform is injective
        assert not (ks & seen)              # and cross-member disjoint
        seen |= ks


def test_pack_batch_np_matches_device_pack():
    """Host-side packing (numpy salting + concat) must produce the
    exact same packed SparseIds as the device pack_batch path."""
    n = 3
    rng = np.random.default_rng(9)
    group = EmbeddingGroup(_cols(n), coalesce=True)
    group_np = EmbeddingGroup(_cols(n), coalesce=True)

    raw_np = {}
    dev_b = {}
    for i in range(n):
        ids = rng.integers(0, 1 << 45, size=(8, 2)).astype(np.int64)
        raw_np[f"c{i}"] = ids
        dev_b[f"c{i}"] = SparseIds.from_numpy(ids)
    raw_np["label"] = np.ones(8, np.float32)
    dev_b["label"] = jnp.ones(8, jnp.float32)

    want = group.pack_batch(dev_b)
    got = group_np.pack_batch_np(raw_np)
    assert set(want) == set(got)
    for k in want:
        if isinstance(want[k], SparseIds):
            np.testing.assert_array_equal(np.asarray(want[k].hi),
                                          np.asarray(got[k].hi), k)
            np.testing.assert_array_equal(np.asarray(want[k].lo),
                                          np.asarray(got[k].lo), k)
        else:
            np.testing.assert_array_equal(np.asarray(want[k]),
                                          np.asarray(got[k]))


def test_pack_batch_np_compact_matches_full():
    """compact=True ships raw int32 ids (salting moves on-device into
    _packed_view) and bf16 floats; the reconstructed (hi, lo) pair and
    the lookup results must be bit-identical to the full-width pack."""
    n = 3
    rng = np.random.default_rng(11)
    group = EmbeddingGroup(_cols(n), coalesce=True)
    group_c = EmbeddingGroup(_cols(n), coalesce=True)

    raw = {f"c{i}": rng.integers(0, 1 << 30, size=(8, 2)).astype(np.int64)
           for i in range(n)}
    raw["label"] = np.ones(8, np.float32)

    full = group.pack_batch_np(raw)
    comp = group_c.pack_batch_np(raw, compact=True)
    assert set(full) == set(comp)

    by_table = {}
    for c in group.embedding:
        by_table.setdefault(group.physical_table_of(c), []).append(c)
    for tname, tcols in by_table.items():
        key = group.PACKED_PREFIX + tname
        assert not hasattr(comp[key], "hi")  # really took the compact form
        # wire bytes: one int32 plane instead of two
        assert comp[key].ids.dtype == jnp.int32
        f_hi, f_lo, f_w = group._packed_view(full, tname, tcols)
        c_hi, c_lo, c_w = jax.jit(
            lambda b: group_c._packed_view(b, tname, tcols))(comp)[:2] + (
                group_c._pack_widths[tname],)
        assert f_w == c_w
        np.testing.assert_array_equal(np.asarray(f_hi), np.asarray(c_hi))
        np.testing.assert_array_equal(np.asarray(f_lo), np.asarray(c_lo))
    assert comp["label"].dtype == jnp.bfloat16


def test_pack_batch_np_compact_falls_back_on_wide_ids():
    """A table with genuine 64-bit ids must keep the full pair."""
    rng = np.random.default_rng(12)
    group = EmbeddingGroup(_cols(2), coalesce=True)
    raw = {f"c{i}": rng.integers(1 << 40, 1 << 45, size=(4, 1))
           .astype(np.int64) for i in range(2)}
    raw["label"] = np.ones(4, np.float32)
    comp = group.pack_batch_np(raw, compact=True)
    (key,) = [k for k in comp if k.startswith(group.PACKED_PREFIX)]
    assert hasattr(comp[key], "hi")

    want = EmbeddingGroup(_cols(2), coalesce=True).pack_batch_np(raw)
    np.testing.assert_array_equal(np.asarray(want[key].hi),
                                  np.asarray(comp[key].hi))
    np.testing.assert_array_equal(np.asarray(want[key].lo),
                                  np.asarray(comp[key].lo))


def test_compact_pack_trains_identically():
    """A few train steps fed compact batches must produce the same
    losses as full-width batches (same seeds, same data)."""
    n = 2
    rng = np.random.default_rng(13)
    cols = _cols(n)
    batches = []
    for _ in range(3):
        ids = rng.integers(1, 50, size=(8, n, 1)).astype(np.int64)
        b = {f"c{i}": ids[:, i] for i in range(n)}
        b["label"] = (ids.sum((1, 2)) % 2).astype(np.float32)
        batches.append(b)

    def run(compact):
        group = EmbeddingGroup([EmbeddingColumn(
            name=f"c{i}", dim=4, capacity=1 << 8, initializer="zeros",
            combiner="sum") for i in range(n)], coalesce=True)
        params = {"w": jnp.ones((n * 4,), jnp.float32)}
        opt = sopt.SparseAdagrad(learning_rate=0.1)
        tx = optax.adagrad(0.1)
        ts = trainlib.create_train_state(group, params, tx, opt)
        step = trainlib.make_train_step(
            group, _afn(group),
            lambda out, b: losses.bce_with_logits(out, b["label"]),
            opt, tx)
        out = []
        for b in batches:
            ts, m = step(ts, group.pack_batch_np(b, compact=compact))
            out.append(float(m["loss"]))
        return out

    np.testing.assert_allclose(run(False), run(True), rtol=1e-6)


def test_compact_pack_preserves_empty_padding():
    """Sequence columns pad with the 64-bit EMPTY sentinel; the compact
    wire format carries it as int32 min and must reconstruct the exact
    sentinel pair (so masks and combiners see real padding)."""
    from deeprec_tpu.utils import keys as keylib

    group = EmbeddingGroup(_cols(1), coalesce=True)
    ids = np.array([[5, keylib.EMPTY_ID, 7],
                    [keylib.EMPTY_ID, keylib.EMPTY_ID, 9]], np.int64)
    comp = group.pack_batch_np({"c0": ids, "label": np.zeros(2)},
                               compact=True)
    (key,) = [k for k in comp if k.startswith(group.PACKED_PREFIX)]
    assert not hasattr(comp[key], "hi")

    tcols = [c for c in group.embedding]
    hi, lo, _ = group._packed_view(comp, group.physical_table_of(
        tcols[0]), tcols)
    want = EmbeddingGroup(_cols(1), coalesce=True).pack_batch_np(
        {"c0": ids, "label": np.zeros(2)})
    np.testing.assert_array_equal(np.asarray(hi),
                                  np.asarray(want[key].hi))
    np.testing.assert_array_equal(np.asarray(lo),
                                  np.asarray(want[key].lo))
