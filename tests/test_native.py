"""Native host ops: build, correctness, and native/numpy equivalence.

Behavior model: ``trans_csv_ali_ops.cc`` parsing semantics and
``unique_ali_op.cc`` dedup.
"""

import numpy as np
import pytest

from deeprec_tpu import native


def test_native_library_builds():
    assert native.have_native(), \
        f"native build failed: {native.native_error()}"


class TestHash:
    def test_hash64_deterministic_and_salted(self):
        ids = np.array([0, 1, -1, 2**62, -(2**62)], np.int64)
        a = native.hash64(ids, salt=0)
        b = native.hash64(ids, salt=0)
        c = native.hash64(ids, salt=7)
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()
        assert len(set(a.tolist())) == len(ids)

    def test_hash64_matches_numpy_fallback(self):
        if not native.have_native():
            pytest.skip("no native lib")
        ids = np.random.default_rng(0).integers(
            -2**63, 2**63 - 1, size=1000, dtype=np.int64)
        want = native.hash64(ids, salt=3)
        u = ids.view(np.uint64) ^ np.uint64(3)
        got = native._py_mix64(u).view(np.int64)
        np.testing.assert_array_equal(want, got)

    def test_hash_bytes(self):
        toks = [b"abc", b"", b"abd", "abc"]
        h = native.hash_bytes(toks)
        assert h[0] == h[3]       # str and bytes agree
        assert h[0] != h[2]
        assert h[1] != h[0]


class TestUnique:
    def test_basic(self):
        ids = np.array([5, 3, 5, 5, 9, 3], np.int64)
        uniq, inverse, counts = native.unique(ids)
        assert uniq.tolist() == [5, 3, 9]          # first-occurrence order
        assert counts.tolist() == [3, 2, 1]
        np.testing.assert_array_equal(uniq[inverse], ids)

    def test_empty(self):
        uniq, inverse, counts = native.unique(np.array([], np.int64))
        assert uniq.size == 0

    def test_large_random_matches_np_unique(self):
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 5000, size=20000).astype(np.int64)
        uniq, inverse, counts = native.unique(ids)
        np.testing.assert_array_equal(uniq[inverse], ids)
        ref_u, ref_c = np.unique(ids, return_counts=True)
        assert sorted(uniq.tolist()) == ref_u.tolist()
        assert counts.sum() == ids.size
        got = dict(zip(uniq.tolist(), counts.tolist()))
        for u, c in zip(ref_u.tolist(), ref_c.tolist()):
            assert got[u] == c


class TestParseCriteo:
    LINE = ("1\t" + "\t".join(str(i) for i in range(1, 14)) + "\t"
            + "\t".join(f"{i:x}" for i in range(100, 126)) + "\n")

    def test_parse_one_line(self):
        rows, labels, dense, cats, consumed = native.parse_criteo(
            self.LINE.encode(), 4)
        assert rows == 1 and consumed == len(self.LINE)
        assert labels[0] == 1.0
        np.testing.assert_allclose(
            dense[0], np.log1p(np.arange(1, 14, dtype=np.float32)),
            rtol=1e-6)
        for i in range(26):
            assert cats[0, i] == (100 + i) + (i << 40)

    def test_missing_fields_and_negatives(self):
        line = "0\t-2\t\t3" + "\t" * 11 + "a\t\tb" + "\t" * 23 + "\n"
        rows, labels, dense, cats, _ = native.parse_criteo(
            line.encode(), 2, log_transform=False)
        assert rows == 1
        assert labels[0] == 0.0
        assert dense[0, 0] == -2.0 and dense[0, 1] == 0.0 \
            and dense[0, 2] == 3.0
        assert cats[0, 0] == 0xA + (0 << 40)
        assert cats[0, 1] == 0 + (1 << 40)
        assert cats[0, 2] == 0xB + (2 << 40)

    def test_partial_tail_carried(self):
        data = (self.LINE + self.LINE[: len(self.LINE) // 2]).encode()
        rows, _, _, _, consumed = native.parse_criteo(data, 10)
        assert rows == 1
        assert consumed == len(self.LINE)

    def test_nonhex_tokens_string_hash(self):
        # Arbitrary (non-hex) categorical strings must map to distinct
        # nonzero ids — the categorical_column_with_hash_bucket
        # behavior — identically in the C and numpy paths.
        toks = ["sig0a", "user_42", "68fd1e64", ""]
        line = ("1\t" + "\t".join(str(i) for i in range(13)) + "\t"
                + "\t".join(toks + ["a"] * 22) + "\n").encode()
        rows, _, _, cats, _ = native.parse_criteo(line, 2)
        assert rows == 1
        lo = cats[0, :4] & ((1 << 40) - 1)
        assert lo[0] != 0 and lo[1] != 0 and lo[0] != lo[1]
        assert lo[2] == 0x68FD1E64 and lo[3] == 0
        assert cats[0, 0] >> 40 == 0 and cats[0, 1] >> 40 == 1
        orig = native._build_and_load
        native._build_and_load = lambda: None
        try:
            _, _, _, cats_py, _ = native.parse_criteo(line, 2)
        finally:
            native._build_and_load = orig
        np.testing.assert_array_equal(cats, cats_py)

    def test_matches_python_parser(self):
        from deeprec_tpu.data.criteo import parse_criteo_lines
        lines = [self.LINE, "0\t5\t\t" + "\t" * 12
                 + "\t".join(f"{i:x}" for i in range(26)) + "\n"]
        rows, labels, dense, cats, _ = native.parse_criteo(
            "".join(lines).encode(), 10)
        ref_l, ref_i, ref_c = parse_criteo_lines(lines)
        np.testing.assert_allclose(labels[:rows], ref_l, rtol=1e-6)
        np.testing.assert_allclose(dense[:rows], ref_i, rtol=1e-6)
        np.testing.assert_array_equal(cats[:rows], ref_c)


class TestParseIdList:
    def test_idlist(self):
        data = b"1|2|3,7\n4,8|9\n"
        rows, ids, lens = native.parse_idlist(data, ncols=2, max_len=3,
                                              pad=-1)
        assert rows == 2
        assert ids[0, 0].tolist() == [1, 2, 3]
        assert ids[0, 1].tolist() == [7, -1, -1]
        assert ids[1, 0].tolist() == [4, -1, -1]
        assert ids[1, 1].tolist() == [8, 9, -1]
        assert lens.tolist() == [[3, 1], [1, 2]]

    def test_idlist_overflow_clips(self):
        data = b"1|2|3|4|5\n"
        rows, ids, lens = native.parse_idlist(data, ncols=1, max_len=2)
        assert ids[0, 0].tolist() == [1, 2]
        assert lens[0, 0] == 2


class TestParseKvList:
    def test_kvlist(self):
        data = b"0:1.5|3:2.25,1:4\n2:0.5\n"
        rows, dense = native.parse_kvlist(data, ncols=4)
        assert rows == 2
        np.testing.assert_allclose(dense[0], [1.5, 4.0, 0.0, 2.25])
        np.testing.assert_allclose(dense[1], [0.0, 0.0, 0.5, 0.0])

    def test_out_of_range_keys_dropped(self):
        rows, dense = native.parse_kvlist(b"9:1|1:2\n", ncols=3)
        np.testing.assert_allclose(dense[0], [0.0, 2.0, 0.0])


class TestHashOffsetUnique:
    def test_fused_matches_separate(self):
        rng = np.random.default_rng(2)
        ids = rng.integers(0, 100, size=(64, 4)).astype(np.int64)
        uniq, inverse, counts = native.hash_offset_unique(ids, salt=5,
                                                          hash=True)
        ref = native.hash64(ids, salt=5) + \
            (np.arange(4, dtype=np.int64) << 40)[None, :]
        np.testing.assert_array_equal(uniq[inverse].reshape(64, 4), ref)
        assert counts.sum() == ids.size

    def test_no_hash_mode(self):
        ids = np.array([[1, 1], [1, 2]], np.int64)
        uniq, inverse, counts = native.hash_offset_unique(ids)
        assert set(uniq.tolist()) == {1, 1 + (1 << 40), 2 + (1 << 40)}


class TestParseCriteoFallbackContract:
    """The numpy fallback must honor the same ``consumed`` contract as
    the C path: only the bytes of parsed lines (ADVICE r1 fix)."""

    def _lines(self, n):
        mk = lambda r: (f"{r % 2}\t" + "\t".join(str(r + i) for i in range(13))
                        + "\t" + "\t".join(format(r * 31 + i, "x")
                                           for i in range(26)))
        return "\n".join(mk(r) for r in range(n)) + "\n"

    def test_fallback_consumed_covers_only_parsed_lines(self, monkeypatch):
        monkeypatch.setattr(native, "_build_and_load", lambda: None)
        data = self._lines(5).encode()
        rows, labels, _, cats, consumed = native.parse_criteo(data, 2)
        assert rows == 2
        # consumed = end of line 2, not end of last complete line
        assert consumed == len(self._lines(2).encode())
        # the loop-on-consumed pattern recovers every remaining row
        rows2, labels2, _, _, c2 = native.parse_criteo(data[consumed:], 10)
        assert rows2 == 3
        assert consumed + c2 == len(data)
        np.testing.assert_array_equal(labels2[:3],
                                      np.array([0.0, 1.0, 0.0], np.float32))

    def test_fallback_matches_native_consumed(self, monkeypatch):
        if not native.have_native():
            pytest.skip("no native lib")
        data = self._lines(7).encode()
        r_n, _, _, c_n, cons_n = native.parse_criteo(data, 4)
        monkeypatch.setattr(native, "_build_and_load", lambda: None)
        r_f, _, _, c_f, cons_f = native.parse_criteo(data, 4)
        assert (r_n, cons_n) == (r_f, cons_f)
        np.testing.assert_array_equal(c_n[:4], c_f[:4])
