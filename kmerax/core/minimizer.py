"""Minimizer computation & bucket assignment (SURVEY.md §2 #3).

minimizer = min over m-mer offsets of mix32(m-mer value), computed on the
canonical-orientation words (DESIGN.md §4). Scheme after KMC2/MSPKmerCounter
(PAPERS.md) — consecutive k-mers share minimizers, giving shard locality.
All m-mer extractions use static shifts; no gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from kmerax.core.codec import num_words
from kmerax.core.hash import mix32


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def _extract_bits(words: jnp.ndarray, p: int, nbits: int, w: int) -> jnp.ndarray:
    """bits [p, p+nbits) of the little-endian multi-word value (static p)."""
    wi, sb = p // 32, p % 32
    mask = _u32((1 << nbits) - 1)
    lo = words[..., wi]
    if sb == 0:
        return lo & mask
    val = lo >> sb
    if sb + nbits > 32 and wi + 1 < w:
        val = val | (words[..., wi + 1] << (32 - sb))
    return val & mask


def minimizers(canon_words: jnp.ndarray, k: int, m: int) -> jnp.ndarray:
    """Minimizer of each canonical k-mer; canon_words (..., W) -> (...) uint32."""
    assert 0 < m <= 15 and m < k
    w = num_words(k)
    best = jnp.full(canon_words.shape[:-1], 0xFFFFFFFF, dtype=jnp.uint32)
    for j in range(k - m + 1):
        p = 2 * (k - m - j)               # bit offset of m-mer at offset j
        val = _extract_bits(canon_words, p, 2 * m, w)
        best = jnp.minimum(best, mix32(val))
    return best


def buckets(canon_words: jnp.ndarray, k: int, m: int,
            nbuckets: int) -> jnp.ndarray:
    """bucket = minimizer mod nbuckets (DESIGN.md §4), int32."""
    return (minimizers(canon_words, k, m) % _u32(nbuckets)).astype(jnp.int32)
