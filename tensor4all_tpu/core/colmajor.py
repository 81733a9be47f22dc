"""Column-major array interchange (ref tensor4all-core/src/
col_major_array.rs): the layout contract shared by the C API, the HDF5
schema (ITensors.jl/Julia), and tree-TCI batch buffers.

Everything device-side is row-major jax; this type is the explicit,
validated boundary object — it owns a flat Fortran-ordered buffer plus
dims and converts exactly (no silent stride games).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


class ColMajorArray:
    """Flat column-major buffer + dims (ref ColMajorArray)."""

    def __init__(self, data: np.ndarray, dims: Sequence[int]):
        data = np.ascontiguousarray(np.asarray(data).reshape(-1))
        dims = tuple(int(d) for d in dims)
        n = int(np.prod(dims, dtype=np.int64)) if dims else 1
        if data.size != n:
            raise ValueError(
                f"buffer has {data.size} elements, dims {dims} need {n}")
        self._data = data
        self._dims = dims

    # ------------------------------------------------------------------
    @staticmethod
    def from_array(a) -> "ColMajorArray":
        a = np.asarray(a)
        return ColMajorArray(a.flatten(order="F"), a.shape)

    def to_array(self) -> np.ndarray:
        return self._data.reshape(self._dims, order="F")

    # ------------------------------------------------------------------
    @property
    def dims(self) -> Tuple[int, ...]:
        return self._dims

    @property
    def rank(self) -> int:
        return len(self._dims)

    @property
    def flat(self) -> np.ndarray:
        """The raw column-major buffer (what crosses the C boundary)."""
        return self._data

    @property
    def strides(self) -> Tuple[int, ...]:
        """Column-major strides in ELEMENTS."""
        out = []
        acc = 1
        for d in self._dims:
            out.append(acc)
            acc *= d
        return tuple(out)

    def __getitem__(self, multi_index: Sequence[int]):
        if len(multi_index) != self.rank:
            raise IndexError("rank mismatch")
        flat = 0
        for v, d, s in zip(multi_index, self._dims, self.strides):
            if not 0 <= v < d:
                raise IndexError(f"index {v} out of range for dim {d}")
            flat += v * s
        return self._data[flat]

    def __len__(self):
        return self._data.size
