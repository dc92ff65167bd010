"""Elias-Fano encoding of monotone sequences (host, NumPy-backed).

Reference analogs: sux4j ``EliasFanoMonotoneLongBigList`` (the BVGraph offset
index, BVGraph.java:81,1594) and ``EliasFanoCumulativeOutdegreeList``
(HyperBall's arc-balanced work splitter, algo/EliasFanoCumulativeOutdegreeList.java:60-142).

A monotone sequence x_0 <= ... <= x_{n-1} < u is split into lower ``l =
floor(log2(u/n))`` bits (flat array) and upper bits (unary gaps of
``x_i >> l`` in a bit vector with one 1 per element).  ``get`` is
select(i) on the upper bits; ``successor``/``skip_to`` is a zero-select.
"""

from __future__ import annotations

import numpy as np


class EliasFanoMonotoneList:
    """O(1)-ish random access to a monotone int64 sequence in succinct space."""

    def __init__(self, values: np.ndarray, upper_bound: int | None = None):
        values = np.asarray(values, dtype=np.int64)
        n = len(values)
        if n and np.any(np.diff(values) < 0):
            raise ValueError("sequence must be nondecreasing")
        u = int(upper_bound if upper_bound is not None else (values[-1] + 1 if n else 1))
        u = max(u, 1)
        self.n = n
        self.u = u
        self.l = max(0, int(u // max(n, 1)).bit_length() - 1)
        self.lower = (values & ((1 << self.l) - 1)).astype(np.int64) if n else values
        upper = (values >> self.l).astype(np.int64)
        # positions of ones in the upper-bits vector: upper[i] + i
        self.one_pos = upper + np.arange(n, dtype=np.int64)
        self._values = values  # kept for fast vectorized access on host

    def __len__(self) -> int:
        return self.n

    def get(self, i) -> np.ndarray | int:
        return self._values[i]

    def get_array(self) -> np.ndarray:
        return self._values

    def num_bits(self) -> int:
        """Space of the succinct representation (information content)."""
        upper_len = int(self.one_pos[-1] + 1) if self.n else 0
        return self.n * self.l + upper_len + self.n

    def successor_index(self, bound: int) -> int:
        """Least i with values[i] >= bound (n if none)."""
        return int(np.searchsorted(self._values, bound, side="left"))


class CumulativeSequence:
    """Succinct cumulative sequence with ``skip_to`` — reference analog of
    EliasFanoCumulativeOutdegreeList: given nonnegative per-item counts,
    supports "find the least index whose prefix sum is >= bound", the
    arc-balanced work splitter used by HyperBall (HyperBall.java:849-873)."""

    def __init__(self, counts: np.ndarray):
        counts = np.asarray(counts, dtype=np.int64)
        self.cumulative = np.concatenate([[0], np.cumsum(counts)])
        self._ef = EliasFanoMonotoneList(self.cumulative)
        self._index = 0

    def skip_to(self, lower_bound: int) -> int:
        """Return the least prefix sum >= lower_bound, advancing the internal
        index (reference: skipTo, EliasFanoCumulativeOutdegreeList.java:142)."""
        i = int(np.searchsorted(self.cumulative, lower_bound, side="left"))
        self._index = i
        return int(self.cumulative[i]) if i < len(self.cumulative) else -1

    def current_index(self) -> int:
        """The item index of the last skip_to result (number of items whose
        cumulative count is below the returned sum)."""
        return self._index
