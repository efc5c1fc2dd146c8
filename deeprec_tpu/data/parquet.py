"""ParquetDataset: columnar batch reader.

Rebuild of the reference's arrow-based ParquetDataset
(``core/kernels/data/parquet_dataset_ops.cc``,
``python/data/experimental/ops/parquet_dataset_ops.py:141``,
``docs/ParquetDataset.md``): selected-column reads (IO proportional to
the fields used, not the file width), batched iteration, and a
DataFrame-ish field spec mapping columns to the framework's batch dict
(numeric arrays + SparseIds).

Uses pyarrow when present; gated with a clear error otherwise.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from deeprec_tpu.feature_column.feature_column import SparseIds
from deeprec_tpu.utils import keys as keylib

try:  # pragma: no cover - environment probe
    import pyarrow.parquet as pq

    HAVE_PYARROW = True
except ImportError:  # pragma: no cover
    pq = None
    HAVE_PYARROW = False


@dataclasses.dataclass(frozen=True)
class Field:
    """How one parquet column lands in the batch dict.

    kind: 'numeric' (float32), 'id' (int64 -> SparseIds [B, 1]),
    'id_list' (list<int64> -> padded SparseIds [B, max_len]),
    'label' (float32 passthrough).
    """

    name: str
    kind: str = "numeric"
    max_len: int = 1
    key_offset: int = 0  # added to ids (per-field key-space separation)


class ParquetDataset:
    """Iterate a parquet file (or list of files) as framework batches."""

    def __init__(self, paths, fields: Sequence[Field], batch_size: int,
                 drop_remainder: bool = True):
        if not HAVE_PYARROW:
            raise ImportError(
                "ParquetDataset requires pyarrow, which is not available "
                "in this environment")
        self.paths = [paths] if isinstance(paths, str) else list(paths)
        self.fields = list(fields)
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder

    def _convert(self, table) -> Iterator[Dict]:
        n = table.num_rows
        B = self.batch_size
        cols = {f.name: table.column(f.name) for f in self.fields}
        stop = n - (n % B) if self.drop_remainder else n
        for start in range(0, stop, B):
            end = min(start + B, n)
            batch: Dict = {}
            for f in self.fields:
                arr = cols[f.name].slice(start, end - start)
                if f.kind == "numeric":
                    batch[f.name] = np.asarray(
                        arr.to_numpy(zero_copy_only=False), np.float32)
                elif f.kind == "label":
                    batch[f.name] = np.asarray(
                        arr.to_numpy(zero_copy_only=False), np.float32)
                elif f.kind == "id":
                    ids = np.asarray(
                        arr.to_numpy(zero_copy_only=False),
                        np.int64)[:, None] + f.key_offset
                    batch[f.name] = SparseIds.from_numpy(ids)
                elif f.kind == "id_list":
                    pylist = arr.to_pylist()
                    out = np.full((end - start, f.max_len),
                                  keylib.EMPTY_ID, np.int64)
                    for r, row in enumerate(pylist):
                        row = (row or [])[: f.max_len]
                        if row:
                            out[r, : len(row)] = np.asarray(
                                row, np.int64) + f.key_offset
                    batch[f.name] = SparseIds.from_numpy(out)
                else:
                    raise ValueError(f"unknown field kind {f.kind!r}")
            yield batch

    def __iter__(self) -> Iterator[Dict]:
        columns = [f.name for f in self.fields]
        for path in self.paths:
            table = pq.read_table(path, columns=columns)
            yield from self._convert(table)
