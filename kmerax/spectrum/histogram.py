"""Coverage histogram & solid threshold (SURVEY.md §2 #12; DESIGN.md §7)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

HIST_MAX = 255


def count_histogram(counts: jnp.ndarray, n_unique=None) -> jnp.ndarray:
    """h[c] for c in [0, 255]; counts are per-unique-kmer (clip to [1,255]).

    Rows past n_unique (sentinel padding, count 0) land in bin 0 — callers
    ignore bin 0. jit-safe.
    """
    c = jnp.clip(counts, 0, HIST_MAX)
    # int32 bins: fine per shard (<2^31 uniques/shard); host sums as int64.
    return jnp.zeros(HIST_MAX + 1, dtype=jnp.int32).at[c].add(
        (counts > 0).astype(jnp.int32))


def solid_threshold(hist, override: int | None = None) -> int:
    """First-valley rule on host (DESIGN.md §7): smallest c in [2,128) with
    h[c] <= h[c+1]; fallback 2. An explicit override wins."""
    if override is not None:
        return int(override)
    h = np.asarray(hist)
    hi = min(128, len(h) - 1)
    for c in range(2, hi):
        if h[c] <= h[c + 1]:
            return c
    return 2
