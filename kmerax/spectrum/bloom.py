"""Device-HBM counting-Bloom spectrum (SURVEY.md §2 #10; DESIGN.md §5).

The "sharded device-HBM counting array" of BASELINE.json: a d-hash counting
Bloom held as one int32 array in HBM, updated with scatter-adds. Insert uses
a sort + segment-sum dedup so the final scatter has mostly-unique indices
(BASELINE.json "JAX segment-sum scatters"), which XLA parallelizes far better
than a collision-heavy scatter.

All functions are pure and jit-safe; the table threads through functionally.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from kmerax.core.hash import bloom_indices

COUNT_SATURATE = 1 << 30


@dataclass(frozen=True)
class BloomParams:
    k: int
    log2_width: int
    num_hashes: int = 4

    @property
    def width(self) -> int:
        return 1 << self.log2_width


def make_table(params: BloomParams) -> jnp.ndarray:
    return jnp.zeros(params.width, dtype=jnp.int32)


def _flat_probe_increments(params: BloomParams, canon_words, valid):
    """Flattened (indices, increments) for all probes of all valid k-mers."""
    idx = bloom_indices(canon_words, params.log2_width, params.num_hashes)
    inc = jnp.broadcast_to(valid[..., None], idx.shape)
    return idx.reshape(-1), inc.reshape(-1).astype(jnp.int32)


def insert(params: BloomParams, table: jnp.ndarray,
           canon_words: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Add one batch of canonical k-mers to the table.

    Sort+segment-sum dedups probe indices first: identical probes collapse to
    one (index, count) pair, then a single scatter-add applies them.
    Commutative integer adds keep this deterministic (SURVEY.md §5 races).
    """
    idx, inc = _flat_probe_increments(params, canon_words, valid)
    # push masked-out probes to a dead slot? No: inc==0 contributes nothing,
    # so they can keep their index — add of 0 is a no-op.
    order = jnp.argsort(idx)
    idx_s = idx[order]
    inc_s = inc[order]
    # segment boundaries over equal indices
    is_start = jnp.concatenate(
        [jnp.ones(1, dtype=bool), idx_s[1:] != idx_s[:-1]])
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    nseg = idx.shape[0]  # upper bound on segments
    sums = jax.ops.segment_sum(inc_s, seg_id, num_segments=nseg)
    # representative index per segment (first element of each run)
    rep = jax.ops.segment_max(
        jnp.where(is_start, idx_s, -1), seg_id, num_segments=nseg)
    rep = jnp.where(rep < 0, 0, rep)  # empty segments -> slot 0 with sum 0
    return table.at[rep].add(sums, mode="drop")


def query(params: BloomParams, table: jnp.ndarray,
          canon_words: jnp.ndarray,
          valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """count = min over d probes, saturated; invalid lanes -> 0."""
    idx = bloom_indices(canon_words, params.log2_width, params.num_hashes)
    counts = jnp.min(table[idx], axis=-1)
    counts = jnp.minimum(counts, COUNT_SATURATE)
    if valid is not None:
        counts = jnp.where(valid, counts, 0)
    return counts
