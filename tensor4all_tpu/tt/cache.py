"""Cached partial contractions for repeated TT evaluation.

TPU-native rebuild of tensor4all-simplett/src/cache.rs:1-679 (`TTCache`):
left-prefix environment vectors are memoized host-side keyed by the index
prefix tuple, so repeated evaluations that share prefixes (the access
pattern of TCI pivot enumeration) cost only the suffix matvecs. Batch
evaluation falls back to the fully batched device path when the cache
cannot help.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .tensortrain import TensorTrain


class TTCache:
    """Prefix-environment cache over a fixed TT."""

    def __init__(self, tt: TensorTrain):
        self.tt = tt
        self._left: Dict[Tuple[int, ...], np.ndarray] = {
            (): np.ones((1,), dtype=np.result_type(np.asarray(tt.cores[0])))
        }
        self.hits = 0
        self.misses = 0

    def _left_env(self, prefix: Tuple[int, ...]) -> np.ndarray:
        env = self._left.get(prefix)
        if env is not None:
            self.hits += 1
            return env
        self.misses += 1
        parent = self._left_env(prefix[:-1])
        core = np.asarray(self.tt.cores[len(prefix) - 1])
        env = parent @ core[:, prefix[-1], :]
        self._left[prefix] = env
        return env

    def evaluate(self, idx: Sequence[int]) -> complex:
        idx = tuple(int(i) for i in idx)
        L = len(self.tt)
        if len(idx) != L:
            raise ValueError(f"index length {len(idx)} != {L}")
        # reuse the longest cached prefix; cache up to the second-to-last site
        env = self._left_env(idx[: L - 1])
        core = np.asarray(self.tt.cores[L - 1])
        v = env @ core[:, idx[-1], :]
        return v[0]

    def evaluate_batch(self, idx) -> np.ndarray:
        idx = np.asarray(idx)
        if idx.shape[0] > 64:  # large batches: fully-batched device path
            return np.asarray(self.tt.evaluate_batch(idx))
        return np.array([self.evaluate(row) for row in idx])

    @property
    def cache_size(self) -> int:
        return len(self._left)
