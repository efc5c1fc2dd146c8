"""Input pipeline: prefetch staging, WorkQueue (local + TCP), Parquet."""

import threading
import time

import numpy as np
import pytest

from deeprec_tpu.data.prefetch import staged
from deeprec_tpu.data.work_queue import (RemoteWorkQueue, WorkQueue,
                                         WorkQueueServer)


def test_prefetch_preserves_items_and_overlaps():
    produced = []

    def make_iter():
        for i in range(20):
            time.sleep(0.005)
            produced.append(i)
            yield {"x": np.full((4,), i)}

    it = staged(make_iter, buffer_size=4, device_put=False)
    got = [int(b["x"][0]) for b in it]
    assert got == list(range(20))


def test_prefetch_transform_applied():
    it = staged(lambda: iter([{"x": np.ones(2)}] * 3),
                transform=lambda b: {"x": b["x"] * 5}, device_put=False)
    for b in it:
        assert b["x"][0] == 5.0


def test_work_queue_epochs_and_state():
    q = WorkQueue(["a", "b", "c"], num_epochs=2)
    taken = [q.take() for _ in range(4)]
    assert taken == ["a", "b", "c", "a"]
    state = q.state()
    q2 = WorkQueue.from_state(state, num_epochs=2)
    assert list(q2) == ["b", "c"]  # resumes remaining work
    assert q.take() == "b"


def test_work_queue_concurrent_consumers():
    q = WorkQueue([str(i) for i in range(100)])
    seen = []
    lock = threading.Lock()

    def consume():
        for item in q:
            with lock:
                seen.append(item)

    threads = [threading.Thread(target=consume) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert sorted(seen, key=int) == [str(i) for i in range(100)]
    assert len(set(seen)) == 100


def test_work_queue_tcp_roundtrip():
    q = WorkQueue(["f1", "f2", "f3"])
    server = WorkQueueServer(q, host="127.0.0.1")
    try:
        c1 = RemoteWorkQueue("127.0.0.1", server.port)
        c2 = RemoteWorkQueue("127.0.0.1", server.port)
        items = [c1.take(), c2.take(), c1.take(), c1.take()]
        assert items == ["f1", "f2", "f3", None]
        c1.close()
        c2.close()
    finally:
        server.shutdown()


def test_parquet_dataset(tmp_path):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from deeprec_tpu.data.parquet import Field, ParquetDataset
    from deeprec_tpu.utils import keys as keylib

    t = pa.table({
        "label": [1.0, 0.0, 1.0, 0.0],
        "price": [1.5, 2.5, 3.5, 4.5],
        "item": [10, 20, 30, 40],
        "hist": [[1, 2], [3], [], [4, 5, 6, 7]],
    })
    p = tmp_path / "d.parquet"
    pq.write_table(t, p)

    ds = ParquetDataset(str(p), [
        Field("label", "label"),
        Field("price", "numeric"),
        Field("item", "id", key_offset=100),
        Field("hist", "id_list", max_len=3),
    ], batch_size=2)
    batches = list(ds)
    assert len(batches) == 2
    b = batches[0]
    np.testing.assert_allclose(b["price"], [1.5, 2.5])
    ids = keylib.join_ids(np.asarray(b["item"].hi).reshape(-1),
                          np.asarray(b["item"].lo).reshape(-1))
    np.testing.assert_array_equal(ids, [110, 120])
    hist = keylib.join_ids(np.asarray(b["hist"].hi).reshape(-1),
                           np.asarray(b["hist"].lo).reshape(-1))
    assert hist[0] == 1 and hist[1] == 2 and hist[2] == keylib.EMPTY_ID
    # Truncation to max_len on the last row of batch 2.
    b2 = batches[1]
    h2 = keylib.join_ids(np.asarray(b2["hist"].hi).reshape(-1),
                         np.asarray(b2["hist"].lo).reshape(-1))
    np.testing.assert_array_equal(h2[3:], [4, 5, 6])


def test_parquet_streams_across_files_and_row_groups(tmp_path):
    """Batches carry across row-group and file boundaries (the
    reference's parquet_batch_reader.cc streaming contract), and the
    remainder is emitted iff drop_remainder=False."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from deeprec_tpu.data.parquet import Field, ParquetDataset

    # 7 + 4 rows, tiny row groups (3) so batches of 5 must span both.
    p1, p2 = tmp_path / "a.parquet", tmp_path / "b.parquet"
    pq.write_table(pa.table({"x": [float(i) for i in range(7)]}), p1,
                   row_group_size=3)
    pq.write_table(pa.table({"x": [float(i) for i in range(7, 11)]}), p2,
                   row_group_size=3)

    fields = [Field("x", "numeric")]
    got = list(ParquetDataset([str(p1), str(p2)], fields, batch_size=5))
    assert len(got) == 2
    np.testing.assert_allclose(np.concatenate([b["x"] for b in got]),
                               np.arange(10.0))
    got = list(ParquetDataset([str(p1), str(p2)], fields, batch_size=5,
                              drop_remainder=False))
    assert [len(b["x"]) for b in got] == [5, 5, 1]
    assert got[-1]["x"][0] == 10.0


def test_parquet_string_id_column(tmp_path):
    """'id_str' columns hash strings with the framework's hash_bytes
    scheme — the DataFrame string-key path of the reference."""
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from deeprec_tpu import native
    from deeprec_tpu.data.parquet import Field, ParquetDataset
    from deeprec_tpu.utils import keys as keylib

    p = tmp_path / "s.parquet"
    pq.write_table(pa.table({"user": ["alice", "bob", "alice", None]}), p)
    ds = ParquetDataset(str(p), [Field("user", "id_str")], batch_size=4)
    (b,) = list(ds)
    ids = keylib.join_ids(np.asarray(b["user"].hi).reshape(-1),
                          np.asarray(b["user"].lo).reshape(-1))
    exp = native.hash_bytes(["alice", "bob", "alice", ""])
    np.testing.assert_array_equal(ids, exp)
    assert ids[0] == ids[2] and ids[0] != ids[1]


def test_criteo_file_batches_id_bits(tmp_path):
    """id_bits=31 must strip the per-field offsets and truncate hashes
    so every id is int32-representable (the compact-wire precondition),
    while labels/dense stay identical to the default path."""
    from deeprec_tpu.data.criteo import criteo_file_batches

    rows = []
    rng = np.random.default_rng(3)
    for r in range(64):
        ints = "\t".join(str(int(v)) for v in rng.integers(0, 50, 13))
        cats = "\t".join(format(int(v), "x")
                         for v in rng.integers(0, 1 << 44, 26))
        rows.append(f"{r % 2}\t{ints}\t{cats}")
    tsv = tmp_path / "mini.tsv"
    tsv.write_text("\n".join(rows) + "\n")

    full = next(criteo_file_batches(str(tsv), 64, as_numpy=True,
                                    wide=False))
    comp = next(criteo_file_batches(str(tsv), 64, as_numpy=True,
                                    wide=False, id_bits=31))
    np.testing.assert_array_equal(full["label"], comp["label"])
    mask31 = (1 << 31) - 1
    for k, v in comp.items():
        if k.startswith("C"):
            v = np.asarray(v)
            assert v.max() <= mask31 and v.min() >= 0
            np.testing.assert_array_equal(
                v, np.asarray(full[k]) & mask31, k)
