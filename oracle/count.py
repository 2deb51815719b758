"""Oracle spectra: exact counts, counting Bloom, histogram, threshold.

Frozen semantics: DESIGN.md §§5-7.
"""

from __future__ import annotations

import numpy as np

from oracle.codec import (
    HASH_SEED_1, HASH_SEED_2, canonical_int, kmer_hash_int, kmer_int,
    num_words,
)

COUNT_SATURATE = 1 << 30


class ExactSpectrum:
    """Exact multiset of canonical k-mers (DESIGN.md §6)."""

    def __init__(self, k: int):
        self.k = k
        self.counts: dict[int, int] = {}

    def add_read(self, bases: np.ndarray) -> None:
        k = self.k
        n = len(bases)
        v = 0
        run = 0  # number of consecutive valid bases ending here
        for i in range(n):
            b = int(bases[i])
            if b >= 4:
                run = 0
                v = 0
                continue
            v = ((v << 2) | b) & ((1 << (2 * k)) - 1)
            run += 1
            if run >= k:
                c = canonical_int(v, k)
                self.counts[c] = self.counts.get(c, 0) + 1

    def add_reads(self, reads) -> None:
        for r in reads:
            self.add_read(r)

    def query(self, canon: int) -> int:
        if canon < 0:
            return 0
        return self.counts.get(canon, 0)

    def sorted_items(self):
        """(sorted unique canonical kmer ints, counts) per DESIGN.md §6."""
        keys = sorted(self.counts)
        return keys, [self.counts[x] for x in keys]


class CountingBloomOracle:
    """Register-blocked counting Bloom: one 128-lane block per k-mer inside
    its minimizer-bucket segment, d lanes within the block (DESIGN.md §5)."""

    def __init__(self, k: int, log2_width: int, num_hashes: int = 4,
                 minimizer_m: int = 11, log2_buckets: int = 8,
                 bucket_scheme: str = "hash"):
        assert log2_buckets <= log2_width - 7 and log2_width <= 31
        assert num_hashes <= 4
        assert bucket_scheme in ("hash", "minimizer")
        self.k = k
        self.log2_width = log2_width
        self.width = 1 << log2_width
        self.seg_blocks_bits = log2_width - 7 - log2_buckets
        self.m = minimizer_m
        self.nbuckets = 1 << log2_buckets
        self.d = num_hashes
        self.bucket_scheme = bucket_scheme
        self.table = np.zeros(self.width, dtype=np.int64)

    def _probes(self, canon: int):
        h1 = kmer_hash_int(canon, self.k, HASH_SEED_1)
        h2 = kmer_hash_int(canon, self.k, HASH_SEED_2)
        if self.bucket_scheme == "hash":
            # DESIGN.md §5a: bucket + block offset = low bits of h1
            block = h1 & ((1 << (self.log2_width - 7)) - 1)
        else:
            from oracle.codec import minimizer_of
            bucket = minimizer_of(canon, self.k, self.m) % self.nbuckets
            block = (bucket << self.seg_blocks_bits) \
                | (h1 & ((1 << self.seg_blocks_bits) - 1))
        return [(block << 7) | ((h2 >> (7 * i)) & 127)
                for i in range(self.d)]

    def insert(self, canon: int) -> None:
        for idx in self._probes(canon):
            self.table[idx] += 1

    def add_read(self, bases: np.ndarray) -> None:
        k = self.k
        v = 0
        run = 0
        mask = (1 << (2 * k)) - 1
        for i in range(len(bases)):
            b = int(bases[i])
            if b >= 4:
                run = 0
                v = 0
                continue
            v = ((v << 2) | b) & mask
            run += 1
            if run >= k:
                self.insert(canonical_int(v, k))

    def add_reads(self, reads) -> None:
        for r in reads:
            self.add_read(r)

    def query(self, canon: int) -> int:
        if canon < 0:
            return 0
        c = min(int(self.table[idx]) for idx in self._probes(canon))
        return min(c, COUNT_SATURATE)


def histogram_of(counts, max_count: int = 255) -> np.ndarray:
    """h[c] = number of unique kmers with count clipped to [1, max_count]."""
    h = np.zeros(max_count + 1, dtype=np.int64)
    for c in counts:
        h[min(max(int(c), 1), max_count)] += 1
    return h


def auto_threshold(hist: np.ndarray) -> int:
    """First-valley rule (DESIGN.md §7): smallest c in [2,128) with h[c] <= h[c+1]."""
    hi = min(128, len(hist) - 1)
    for c in range(2, hi):
        if hist[c] <= hist[c + 1]:
            return c
    return 2
