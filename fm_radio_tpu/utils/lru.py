"""Small LRU cache.

Parity: ``LRU_Cache`` (``src/utility/lru_cache.h``).  The reference ships it
unused on the main path; here it earns its keep memoizing filter-coefficient
redesigns — the GUI-style runtime controls (``update_controls``, mirroring
``EditableControl`` + ``UpdateFilters`` at ``broadcast_fm_demod.cpp:330-389``)
toggle between a handful of configs, and each distinct config's full designer
pass runs once.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Hashable


class LRUCache:
    """Bounded mapping with least-recently-used eviction."""

    def __init__(self, capacity: int = 16):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: Hashable, default=None):
        if key not in self._d:
            self.misses += 1
            return default
        self.hits += 1
        self._d.move_to_end(key)
        return self._d[key]

    def put(self, key: Hashable, value) -> None:
        if key in self._d:
            self._d.move_to_end(key)
        self._d[key] = value
        if len(self._d) > self.capacity:
            self._d.popitem(last=False)

    def get_or_create(self, key: Hashable, create: Callable[[], object]):
        """Return the cached value, computing and inserting it on a miss."""
        val = self.get(key, _MISS)
        if val is _MISS:
            val = create()
            self.put(key, val)
        return val

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._d


_MISS = object()
