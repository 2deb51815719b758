"""K-mer hashing for Bloom probes and bucketing (SURVEY.md §2 #4).

murmur3 fmix32 over uint32 lanes; semantics frozen in DESIGN.md §3 and
bit-exact vs oracle.codec.mix32 / kmer_hash_words.
"""

from __future__ import annotations

import jax.numpy as jnp

HASH_SEED_1 = 0x9E3779B1
HASH_SEED_2 = 0x85EBCA77


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.uint32)


def mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer; wrapping uint32 arithmetic."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * _u32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * _u32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def kmer_hash(words: jnp.ndarray, seed: int) -> jnp.ndarray:
    """h = mix32(seed); for w in words: h = mix32(h ^ w). words: (..., W)."""
    h = mix32(jnp.full(words.shape[:-1], seed, dtype=jnp.uint32))
    for i in range(words.shape[-1]):
        h = mix32(h ^ words[..., i])
    return h


def bloom_indices(words: jnp.ndarray, log2_width: int, d: int,
                  buckets: jnp.ndarray | None = None,
                  log2_buckets: int = 0) -> jnp.ndarray:
    """Kirsch–Mitzenmacher double-hashed probe indices (DESIGN.md §5).

    With `buckets` (the k-mers' minimizer buckets, (...)-shaped) the probes
    land inside the bucket's contiguous segment of the global table —
    the property that makes the spectrum bucket-shardable (DESIGN.md §12).
    Returns (..., d) int32 GLOBAL indices into a 2^log2_width table.
    """
    seg_bits = log2_width - log2_buckets
    mask = _u32((1 << seg_bits) - 1)
    h1 = kmer_hash(words, HASH_SEED_1)
    h2 = kmer_hash(words, HASH_SEED_2) | _u32(1)
    offs = [(h1 + _u32(i) * h2) & mask for i in range(d)]
    idx = jnp.stack(offs, axis=-1)
    if buckets is not None:
        idx = idx | (buckets.astype(jnp.uint32)[..., None] << seg_bits)
    return idx.astype(jnp.int32)
