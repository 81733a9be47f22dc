"""Bidirectional pivot multi-index <-> position map.

Ref: tensor4all-tcicore/src/indexset.rs:34 `IndexSet`.
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

MultiIndex = Tuple[int, ...]


class IndexSet:
    """Ordered set of multi-indices with O(1) position lookup."""

    def __init__(self, items: Iterable[Sequence[int]] = ()):  # noqa: D401
        self._items: List[MultiIndex] = []
        self._pos: dict = {}
        for it in items:
            self.add(it)

    def add(self, item: Sequence[int]) -> int:
        """Add if absent; return position."""
        # fast path only for tuples that are entirely plain ints — any
        # numpy scalar must be coerced so stored items stay canonical
        # (json-serializable, type-stable)
        t = (item if type(item) is tuple
             and all(type(v) is int for v in item)
             else tuple(map(int, item)))
        p = self._pos.get(t)
        if p is not None:
            return p
        p = len(self._items)
        self._items.append(t)
        self._pos[t] = p
        return p

    def position(self, item: Sequence[int]) -> Optional[int]:
        t = item if type(item) is tuple else tuple(map(int, item))
        return self._pos.get(t)

    def __contains__(self, item) -> bool:
        t = item if type(item) is tuple else tuple(map(int, item))
        return t in self._pos

    def __getitem__(self, pos: int) -> MultiIndex:
        return self._items[pos]

    def __len__(self) -> int:
        return len(self._items)

    def __iter__(self):
        return iter(self._items)

    def items(self) -> List[MultiIndex]:
        return list(self._items)

    def union(self, other: "IndexSet") -> "IndexSet":
        out = IndexSet(self._items)
        for it in other:
            out.add(it)
        return out

    def __repr__(self):
        return f"IndexSet({self._items!r})"
