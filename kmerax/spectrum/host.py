"""Host-resident exact k-mer spectrum (SURVEY.md §2 #9 at configs 4-5 scale).

The device-materialized exact array caps out at one chip's HBM (~10^9
distinct k-mers x 2 words x 4B does not fit); real-genome runs keep the
spectrum on the HOST as one sorted (N, W) uint32 array + int64 counts and
stream device work over *partitions* (contiguous sorted ranges). Counting
already accumulates here (pipeline/run.py pend-buffer host flushes); this
module gives the accumulated spectrum a first-class type with the
operations the later stages need:

  * histogram / solid threshold        (replaces device count_histogram)
  * batched membership/count lookup    (np.searchsorted on packed keys)
  * partition iteration                (assembly streams solid ranges)
  * optional device materialization    (small runs keep the old fast path)

Order contract: rows are in DESIGN.md §6 global order (little-endian words
compared most-significant-word first), the same order np_merge_counted and
the device sort_kmers produce, so device-built and host-built spectra are
interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def pack_rows(rows: np.ndarray) -> np.ndarray:
    """(N, W) uint32 rows -> comparable packed keys.

    W<=2 packs to one uint64 (order-isomorphic to the word compare);
    W<=4 packs to (N, 2) uint64 [hi, lo]. Used for O(log N) lookups.
    """
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    n, w = rows.shape
    if w == 1:
        return rows[:, 0].astype(np.uint64)
    if w == 2:
        return (rows[:, 1].astype(np.uint64) << np.uint64(32)) \
            | rows[:, 0].astype(np.uint64)
    if w <= 4:
        pad = np.zeros((n, 4 - w), dtype=np.uint32)
        r = np.concatenate([rows, pad], axis=1)
        lo = (r[:, 1].astype(np.uint64) << np.uint64(32)) \
            | r[:, 0].astype(np.uint64)
        hi = (r[:, 3].astype(np.uint64) << np.uint64(32)) \
            | r[:, 2].astype(np.uint64)
        return np.stack([hi, lo], axis=1)
    raise ValueError(f"unsupported word count {w}")


def searchsorted_packed(keys, queries):
    """Lower-bound indices of `queries` in sorted `keys` (pack_rows forms)."""
    if keys.ndim == 1:
        return np.searchsorted(keys, queries)
    # two-level search for (N, 2) [hi, lo] keys
    hi_k, lo_k = keys[:, 0], keys[:, 1]
    hi_q, lo_q = queries[:, 0], queries[:, 1]
    left = np.searchsorted(hi_k, hi_q, side="left")
    right = np.searchsorted(hi_k, hi_q, side="right")
    # within the equal-hi run, lower-bound on lo
    idx = left.copy()
    run = right > left
    if run.any():
        # vectorized binary search restricted to [left, right)
        lo = left[run]
        hi = right[run]
        q = lo_q[run]
        while True:
            active = lo < hi
            if not active.any():
                break
            mid = (lo + hi) // 2
            less = np.where(active, lo_k[np.minimum(mid, len(lo_k) - 1)] < q,
                            False)
            lo = np.where(active & less, mid + 1, lo)
            hi = np.where(active & ~less, mid, hi)
        idx[run] = lo
    return idx


@dataclass
class HostSpectrum:
    """Sorted exact spectrum on the host. uniq (N, W) uint32, counts (N,)
    int64, k static."""

    uniq: np.ndarray
    counts: np.ndarray
    k: int

    def __post_init__(self):
        assert self.uniq.ndim == 2 and self.uniq.dtype == np.uint32
        self._keys = None

    @property
    def n_unique(self) -> int:
        return len(self.uniq)

    @property
    def keys(self) -> np.ndarray:
        if self._keys is None:
            self._keys = pack_rows(self.uniq)
        return self._keys

    def histogram(self, max_count: int = 1024) -> np.ndarray:
        c = np.clip(self.counts, 0, max_count)
        return np.bincount(c.astype(np.int64), minlength=max_count + 1)

    def lookup(self, rows: np.ndarray):
        """(counts int64, found bool) for (M, W) query rows."""
        if len(self.uniq) == 0:
            return (np.zeros(len(rows), np.int64),
                    np.zeros(len(rows), bool))
        q = pack_rows(rows)
        idx = searchsorted_packed(self.keys, q)
        idx = np.minimum(idx, self.n_unique - 1)
        if q.ndim == 1:
            found = self.keys[idx] == q
        else:
            found = np.all(self.keys[idx] == q, axis=1)
        return np.where(found, self.counts[idx], 0), found

    def solid_indices(self, t: int) -> np.ndarray:
        return np.nonzero(self.counts >= t)[0]

    def partitions(self, max_rows: int):
        """Yield (start, end) contiguous row ranges of at most max_rows."""
        n = self.n_unique
        for s in range(0, max(n, 1), max_rows):
            yield s, min(s + max_rows, n)

    def to_device(self, capacity: int | None = None):
        """Sentinel-padded device arrays (uniq, counts, n_unique) in the
        CountState.exact form. capacity defaults to the next 128-multiple."""
        import jax.numpy as jnp
        from kmerax.spectrum.exact import SENTINEL_WORD

        n, w = self.uniq.shape
        cap = capacity or max(128, -(-n // 128) * 128)
        if n > cap:
            raise ValueError(f"{n} distinct k-mers exceed capacity {cap}")
        uniq_dev = jnp.asarray(np.concatenate(
            [self.uniq, np.full((cap - n, w), SENTINEL_WORD, np.uint32)]))
        counts_dev = jnp.asarray(np.concatenate(
            [np.clip(self.counts, 0, 2 ** 31 - 1).astype(np.int32),
             np.zeros(cap - n, np.int32)]))
        return uniq_dev, counts_dev, jnp.asarray(n, jnp.int32)
