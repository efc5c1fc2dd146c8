"""Native host runtime: C++ input-pipeline ops via ctypes.

The reference implements its host hot paths in C++ kernels
(``core/kernels/trans_csv_ali_ops.cc``, ``unique_ali_op.cc``); here the
equivalents live in ``host_ops.cc``, compiled on first use with the
system ``g++`` into a cached shared library and bound through
``ctypes`` (no pybind11 in the image).  Every entry point has a numpy
fallback so the framework works without a toolchain; ``HAVE_NATIVE``
says which path is active.

Public API (all take/return numpy arrays):
  hash64(ids, salt)                 -> int64[n]
  hash_bytes(list[bytes], salt)     -> int64[n]
  unique(ids)                       -> (uniq, inverse int32, counts int32)
  parse_criteo(data, max_rows, ...) -> (rows, labels, dense13, cats26, consumed)
  parse_idlist(data, ...)           -> (rows, ids [R, C, L], lens [R, C])
  parse_kvlist(data, ...)           -> (rows, dense [R, C])
  hash_offset_unique(ids2d, ...)    -> (uniq, inverse, counts)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "host_ops.cc")

_lib = None
_lib_err: str | None = None
_lock = threading.Lock()


def _build_and_load():
    global _lib, _lib_err
    with _lock:
        if _lib is not None or _lib_err is not None:
            return _lib
        so_path = os.path.join(_HERE, f"_host_ops_py{sys.version_info[0]}"
                                      f"{sys.version_info[1]}.so")
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (not os.path.exists(so_path)
                    or os.path.getmtime(so_path) < src_mtime):
                with tempfile.TemporaryDirectory() as td:
                    tmp_so = os.path.join(td, "host_ops.so")
                    subprocess.run(
                        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                         "-o", tmp_so, _SRC],
                        check=True, capture_output=True, timeout=120)
                    os.replace(tmp_so, so_path)
            lib = ctypes.CDLL(so_path)
        except Exception as e:  # noqa: BLE001 — any failure => fallback
            _lib_err = f"{type(e).__name__}: {e}"
            return None

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        cp = ctypes.c_char_p
        lib.drt_hash64.argtypes = [i64p, ctypes.c_int64, ctypes.c_uint64,
                                   i64p]
        lib.drt_hash_bytes.argtypes = [cp, i64p, ctypes.c_int64,
                                       ctypes.c_uint64, i64p]
        lib.drt_unique_i64.restype = ctypes.c_int64
        lib.drt_unique_i64.argtypes = [i64p, ctypes.c_int64, i64p, i32p,
                                       i32p]
        lib.drt_parse_criteo.restype = ctypes.c_int64
        lib.drt_parse_criteo.argtypes = [
            cp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, f32p, f32p,
            i64p, i64p]
        lib.drt_parse_idlist.restype = ctypes.c_int64
        lib.drt_parse_idlist.argtypes = [
            cp, ctypes.c_int64, ctypes.c_char, ctypes.c_char,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i32p]
        lib.drt_parse_kvlist.restype = ctypes.c_int64
        lib.drt_parse_kvlist.argtypes = [
            cp, ctypes.c_int64, ctypes.c_char, ctypes.c_char, ctypes.c_char,
            ctypes.c_int64, ctypes.c_int64, f32p]
        lib.drt_hash_offset_unique.restype = ctypes.c_int64
        lib.drt_hash_offset_unique.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
            ctypes.c_int, i64p, i32p, i32p]
        _lib = lib
        return _lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def have_native() -> bool:
    return _build_and_load() is not None


def native_error() -> str | None:
    _build_and_load()
    return _lib_err


_SPLITMIX_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_C2 = np.uint64(0x94D049BB133111EB)
_SPLITMIX_INC = np.uint64(0x9E3779B97F4A7C15)


def _py_mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x + _SPLITMIX_INC)
        x = (x ^ (x >> np.uint64(30))) * _SPLITMIX_C1
        x = (x ^ (x >> np.uint64(27))) * _SPLITMIX_C2
        return x ^ (x >> np.uint64(31))


def hash64(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """splitmix64 of each id (matches the C++ drt_hash64 exactly)."""
    ids = np.ascontiguousarray(ids, np.int64)
    lib = _build_and_load()
    out = np.empty(ids.shape, np.int64)
    if lib is not None:
        lib.drt_hash64(_ptr(ids.reshape(-1), ctypes.c_int64), ids.size,
                       ctypes.c_uint64(salt & (2**64 - 1)),
                       _ptr(out.reshape(-1), ctypes.c_int64))
        return out
    u = ids.view(np.uint64) ^ np.uint64(salt & (2**64 - 1))
    return _py_mix64(u).view(np.int64).reshape(ids.shape)


def hash_bytes(tokens, salt: int = 0) -> np.ndarray:
    """FNV-1a + mix64 of each bytes/str token."""
    bs = [t.encode() if isinstance(t, str) else bytes(t) for t in tokens]
    lib = _build_and_load()
    n = len(bs)
    out = np.empty((n,), np.int64)
    if lib is not None:
        buf = b"".join(bs)
        offs = np.zeros((n + 1,), np.int64)
        np.cumsum([len(b) for b in bs], out=offs[1:])
        lib.drt_hash_bytes(buf, _ptr(offs, ctypes.c_int64), n,
                           ctypes.c_uint64(salt & (2**64 - 1)),
                           _ptr(out, ctypes.c_int64))
        return out
    M = (1 << 64) - 1
    for i, b in enumerate(bs):
        h = 0xCBF29CE484222325 ^ (salt & M)
        for c in b:
            h = ((h ^ c) * 0x100000001B3) & M
        out[i] = _py_mix64(np.array([h], np.uint64))[0:1].view(np.int64)[0]
    return out


def unique(ids: np.ndarray):
    """First-occurrence-ordered dedup: (uniq, inverse int32, counts)."""
    ids = np.ascontiguousarray(ids, np.int64).reshape(-1)
    n = ids.size
    lib = _build_and_load()
    if lib is not None and n:
        uniq = np.empty((n,), np.int64)
        inverse = np.empty((n,), np.int32)
        counts = np.empty((n,), np.int32)
        k = lib.drt_unique_i64(_ptr(ids, ctypes.c_int64), n,
                               _ptr(uniq, ctypes.c_int64),
                               _ptr(inverse, ctypes.c_int32),
                               _ptr(counts, ctypes.c_int32))
        return uniq[:k], inverse, counts[:k]
    uniq, first, inverse, counts = np.unique(
        ids, return_index=True, return_inverse=True, return_counts=True)
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(order.size)
    return (uniq[order], rank[inverse].astype(np.int32),
            counts[order].astype(np.int32))


def parse_criteo(data: bytes, max_rows: int, log_transform: bool = True):
    """Criteo-Kaggle TSV -> (rows, labels, dense13, cats26, consumed).

    ``consumed`` = bytes of whole lines parsed; re-feed the tail with
    the next chunk.
    """
    lib = _build_and_load()
    labels = np.zeros((max_rows,), np.float32)
    dense = np.zeros((max_rows, 13), np.float32)
    cats = np.zeros((max_rows, 26), np.int64)
    if lib is not None:
        consumed = np.zeros((1,), np.int64)
        rows = lib.drt_parse_criteo(
            data, len(data), max_rows, int(log_transform),
            _ptr(labels, ctypes.c_float),
            _ptr(dense.reshape(-1), ctypes.c_float),
            _ptr(cats.reshape(-1), ctypes.c_int64),
            _ptr(consumed, ctypes.c_int64))
        return rows, labels, dense, cats, int(consumed[0])
    # numpy fallback. ``consumed`` must cover only the lines actually
    # parsed (byte offset of the end of line min(max_rows, n_lines)),
    # matching the C path — callers loop on it to get the rest.
    spans = []
    start = 0
    while len(spans) < max_rows:
        nl = data.find(b"\n", start)
        if nl < 0:
            break
        spans.append((start, nl))
        start = nl + 1
    consumed = start
    for r, (s, e) in enumerate(spans):
        parts = data[s:e].decode("utf-8", "replace").split("\t")
        labels[r] = float(parts[0]) if parts and parts[0] else 0.0
        for i in range(13):
            v = parts[1 + i] if 1 + i < len(parts) else ""
            x = float(v) if v else 0.0
            if log_transform:
                x = np.sign(x) * np.log1p(abs(x))
            dense[r, i] = x
        for i in range(26):
            v = parts[14 + i] if 14 + i < len(parts) else ""
            mask40 = (1 << 40) - 1
            # Mirror the C path exactly: bare hex digits parse as hex;
            # anything else (incl. signs/0x prefixes) string-hashes so
            # arbitrary categorical strings stay distinct.
            if not v:
                h = 0
            elif all(c in "0123456789abcdefABCDEF" for c in v):
                h = int(v, 16) & mask40
            else:
                h = int(hash_bytes([v])[0]) & mask40
            cats[r, i] = h + (i << 40)
    return len(spans), labels, dense, cats, consumed


def parse_idlist(data: bytes, ncols: int, max_len: int,
                 field_delim: str = ",", list_delim: str = "|",
                 max_rows: int = 1 << 20, pad: int = 0):
    """TransCsvID2Dense analog: (rows, ids [R, C, L], lens [R, C])."""
    lib = _build_and_load()
    if lib is not None:
        out = np.empty((max_rows, ncols, max_len), np.int64)
        lens = np.zeros((max_rows, ncols), np.int32)
        rows = lib.drt_parse_idlist(
            data, len(data), field_delim.encode(), list_delim.encode(),
            max_rows, ncols, max_len, pad,
            _ptr(out.reshape(-1), ctypes.c_int64),
            _ptr(lens.reshape(-1), ctypes.c_int32))
        return rows, out[:rows], lens[:rows]
    lines = data.decode().split("\n")
    lines = [l for l in lines if l != ""][:max_rows]
    out = np.full((len(lines), ncols, max_len), pad, np.int64)
    lens = np.zeros((len(lines), ncols), np.int32)
    for r, line in enumerate(lines):
        for c, fld in enumerate(line.split(field_delim)[:ncols]):
            vals = [v for v in fld.split(list_delim) if v]
            for k, v in enumerate(vals[:max_len]):
                out[r, c, k] = int(v)
            lens[r, c] = min(len(vals), max_len)
    return len(lines), out, lens


def parse_kvlist(data: bytes, ncols: int, field_delim: str = ",",
                 list_delim: str = "|", kv_delim: str = ":",
                 max_rows: int = 1 << 20):
    """TransCsvKV2Dense analog: (rows, dense [R, C] float32)."""
    lib = _build_and_load()
    if lib is not None:
        out = np.zeros((max_rows, ncols), np.float32)
        rows = lib.drt_parse_kvlist(
            data, len(data), field_delim.encode(), list_delim.encode(),
            kv_delim.encode(), max_rows, ncols,
            _ptr(out.reshape(-1), ctypes.c_float))
        return rows, out[:rows]
    lines = [l for l in data.decode().split("\n") if l != ""][:max_rows]
    out = np.zeros((len(lines), ncols), np.float32)
    for r, line in enumerate(lines):
        for fld in line.split(field_delim):
            for pair in fld.split(list_delim):
                if kv_delim in pair:
                    k, v = pair.split(kv_delim, 1)
                    k = int(k)
                    if 0 <= k < ncols:
                        out[r, k] = float(v)
    return len(lines), out


def hash_offset_unique(ids: np.ndarray, salt: int = 0, hash: bool = False):
    """Fused (optional hash) + per-field offset (col << 40) + unique over
    a [rows, ncols] id matrix: (uniq, inverse int32 [rows*ncols], counts).
    """
    ids = np.ascontiguousarray(ids, np.int64)
    rows, ncols = ids.shape
    lib = _build_and_load()
    n = rows * ncols
    if lib is not None and n:
        uniq = np.empty((n,), np.int64)
        inverse = np.empty((n,), np.int32)
        counts = np.empty((n,), np.int32)
        k = lib.drt_hash_offset_unique(
            _ptr(ids.reshape(-1), ctypes.c_int64), rows, ncols,
            ctypes.c_uint64(salt & (2**64 - 1)), int(hash),
            _ptr(uniq, ctypes.c_int64), _ptr(inverse, ctypes.c_int32),
            _ptr(counts, ctypes.c_int32))
        return uniq[:k], inverse, counts[:k]
    x = hash64(ids, salt) if hash else ids
    x = x + (np.arange(ncols, dtype=np.int64) << 40)[None, :]
    return unique(x)
