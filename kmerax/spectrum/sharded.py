"""Bucket-sharded spectrum over the ("data","bucket") mesh (SURVEY.md §2 #11).

The count path (SURVEY.md §3.1, BASELINE.json:5):
  reads sharded over BOTH mesh axes → each device extracts k-mers from its
  sub-batch → k-mers are lax.all_to_all-routed to their minimizer-bucket
  owner column (the Ulysses-shaped reshard of SURVEY.md §2) → the owner
  scatter-adds into its range shard of the GLOBAL segmented Bloom table
  (DESIGN.md §§5,12) → partial shards are psum-merged over "data" at stage
  end and all-gathered back to one replicated global table.

Because probe indices are global and mesh-independent and scatter-adds
commute, the merged table is bit-identical for every mesh shape — the §13
determinism contract.

Routing uses fixed-capacity per-destination slots (static shapes under jit);
overflow is *counted* and surfaced — the pipeline asserts it is zero.
Capacity = route_safety × fair share.

The exact spectrum is accumulated per shard from the same routed stream and
host-merged at stage end (distinct buckets hold disjoint k-mer sets).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.core.minimizer import minimizers
from kmerax.dist.mesh import AXIS_BUCKET, AXIS_DATA
from kmerax.spectrum.bloom import BloomParams, insert, query
from kmerax.spectrum.exact import (
    SENTINEL_WORD, merge_sorted, sentinel_rows, sort_kmers, unique_counts,
)


@dataclass(frozen=True)
class ShardedParams:
    bloom: BloomParams              # GLOBAL table params
    n_shards: int                   # S = mesh "bucket" size (power of 2)
    route_safety: int = 4           # per-destination capacity multiplier

    def __post_init__(self):
        S = self.n_shards
        assert S & (S - 1) == 0, "bucket shards must be a power of two"
        assert S <= (1 << self.bloom.log2_buckets), \
            "more shards than minimizer buckets"

    @property
    def shard_bits(self) -> int:
        return self.n_shards.bit_length() - 1

    @property
    def local_bits(self) -> int:
        """log2 of the per-shard table slice width (DESIGN.md §12)."""
        return self.bloom.log2_width - self.shard_bits


def _shard_of(canon_flat, sp: ShardedParams):
    """shard = bucket >> (TB - SB): contiguous segment-range owner."""
    from kmerax.spectrum.bloom import bucket_of
    b = sp.bloom
    bucket = bucket_of(b, canon_flat)
    return (bucket >> (b.log2_buckets - sp.shard_bits)).astype(jnp.int32)


def _route(canon_flat, valid_flat, sp: ShardedParams):
    """All-to-all route k-mers to bucket owners. Runs INSIDE shard_map.

    Returns (recv (S*C, W) kmer rows, recv_valid (S*C,), overflow scalar,
    route_meta for answer-return paths).
    """
    S = sp.n_shards
    n, w = canon_flat.shape
    cap = -(-n * sp.route_safety // S)           # ceil, per-destination slots
    dst = jnp.where(valid_flat, _shard_of(canon_flat, sp), S)
    order = jnp.argsort(dst, stable=True)
    dsts = dst[order]
    kms = canon_flat[order]
    counts = jnp.bincount(dsts, length=S + 1)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    pos = jnp.arange(n, dtype=jnp.int32) - starts[dsts]
    ok = (dsts < S) & (pos < cap)
    slot = jnp.where(ok, dsts * cap + pos, S * cap)
    send = jnp.full((S * cap, w), SENTINEL_WORD, dtype=jnp.uint32
                    ).at[slot].set(kms, mode="drop")
    svalid = jnp.zeros(S * cap, dtype=bool).at[slot].set(ok, mode="drop")
    overflow = jnp.sum(jnp.maximum(counts[:S] - cap, 0))

    recv = jax.lax.all_to_all(send.reshape(S, cap, w), AXIS_BUCKET, 0, 0)
    rvalid = jax.lax.all_to_all(svalid.reshape(S, cap), AXIS_BUCKET, 0, 0)
    meta = (order, slot, ok, cap)
    return recv.reshape(-1, w), rvalid.reshape(-1), overflow, meta


def _route_back(values, meta):
    """Return per-kmer answers to senders (inverse of _route). values: (S*C,)."""
    order, slot, ok, cap = meta
    S = values.shape[0] // cap
    back = jax.lax.all_to_all(values.reshape(S, cap), AXIS_BUCKET, 0, 0)
    flat = back.reshape(-1)
    got = jnp.where(ok, flat[jnp.clip(slot, 0, S * cap - 1)], 0)
    n = order.shape[0]
    return jnp.zeros(n, dtype=values.dtype).at[order].set(got)


# partition rules for the distributed count state (leaf-path regex ->
# PartitionSpec), consumed via dist.partition.shard_tree — the DP axis holds
# per-replica partials, the bucket axis range-shards the spectrum
SHARDED_STATE_RULES = [
    (r"^table$", P(AXIS_DATA, AXIS_BUCKET, None)),
    (r"^exact/uniq$", P(AXIS_DATA, AXIS_BUCKET, None, None)),
    (r"^exact/counts$", P(AXIS_DATA, AXIS_BUCKET, None)),
    (r"^exact/n$", P(AXIS_DATA, AXIS_BUCKET)),
]


def make_sharded_state(sp: ShardedParams, mesh, exact_capacity: int | None,
                       k: int):
    """Initial per-device state, placed via the partition-rule engine
    (SHARDED_STATE_RULES + dist.partition, SURVEY.md §2 #21).

    The global-width table is represented (D, S, width/S): row d holds data
    replica d's partial counts of the S range shards.
    """
    from kmerax.dist.partition import shard_tree

    D = mesh.shape[AXIS_DATA]
    S = mesh.shape[AXIS_BUCKET]
    w = (k + 15) // 16
    perw = sp.bloom.width // S

    tree = {"table": np.zeros((D, S, perw), np.int32)}
    if exact_capacity is not None:
        tree["exact"] = {
            "uniq": np.broadcast_to(
                np.asarray(sentinel_rows(exact_capacity, w))[None, None],
                (D, S, exact_capacity, w)),
            "counts": np.zeros((D, S, exact_capacity), np.int32),
            "n": np.zeros((D, S), np.int32),
        }
    placed = shard_tree(mesh, tree, SHARDED_STATE_RULES)
    if exact_capacity is None:
        return placed["table"], None
    ex = placed["exact"]
    return placed["table"], (ex["uniq"], ex["counts"], ex["n"])


def sharded_insert_step(sp: ShardedParams, mesh, k: int,
                        exact_capacity: int | None):
    """Build the jitted per-batch distributed count step.

    step(table, exact, bases) -> (table, exact, n_kmers, overflow)
      table (D,S,width/S) sharded; exact = (uniq, counts, n) or None;
      bases (Bg, L) sharded over ("data","bucket").
    """
    w = (k + 15) // 16

    def inner(table_ds, bases_blk, *exact_blk):
        words, valid = extract_kmers(bases_blk, k)
        canon, _ = canonical_words(words, k)
        flat = canon.reshape(-1, w)
        fvalid = valid.reshape(-1)
        recv, rvalid, overflow, _ = _route(flat, fvalid, sp)
        tbl = insert(sp.bloom, table_ds[0, 0], recv, rvalid,
                     local_bits=sp.local_bits)
        nk = jax.lax.psum(jnp.sum(fvalid.astype(jnp.int32)),
                          (AXIS_DATA, AXIS_BUCKET))
        ovf = jax.lax.psum(overflow, (AXIS_DATA, AXIS_BUCKET))
        outs = (tbl[None, None], nk, ovf)
        if exact_blk:
            uniq, counts, n = exact_blk
            masked = jnp.where(rvalid[:, None], recv,
                               jnp.uint32(SENTINEL_WORD))
            bu, bc, _ = unique_counts(sort_kmers(masked))
            mu, mc, mn = merge_sorted(uniq[0, 0], counts[0, 0], bu, bc)
            outs = outs + (mu[None, None, :exact_capacity],
                           mc[None, None, :exact_capacity],
                           mn[None, None])
        return outs

    in_specs = [P(AXIS_DATA, AXIS_BUCKET, None), P((AXIS_DATA, AXIS_BUCKET))]
    out_specs = [P(AXIS_DATA, AXIS_BUCKET, None), P(), P()]
    if exact_capacity is not None:
        in_specs += [P(AXIS_DATA, AXIS_BUCKET, None, None),
                     P(AXIS_DATA, AXIS_BUCKET, None),
                     P(AXIS_DATA, AXIS_BUCKET)]
        out_specs += [P(AXIS_DATA, AXIS_BUCKET, None, None),
                      P(AXIS_DATA, AXIS_BUCKET, None),
                      P(AXIS_DATA, AXIS_BUCKET)]

    sm = shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=tuple(out_specs), check_vma=False)

    @jax.jit
    def step(table, exact, bases):
        if exact is not None:
            t, nk, ovf, mu, mc, mn = sm(table, bases, *exact)
            return t, (mu, mc, mn), nk, ovf
        t, nk, ovf = sm(table, bases)
        return t, None, nk, ovf

    return step


def merge_and_replicate(mesh):
    """Partial (D,S,width/S) table -> replicated GLOBAL (width,) table
    (psum over "data", all-gather over "bucket"; BASELINE.json:5)."""

    def inner(table_ds):
        t = jax.lax.psum(table_ds[0, 0], AXIS_DATA)          # (width/S,)
        full = jax.lax.all_gather(t, AXIS_BUCKET, axis=0)    # (S, width/S)
        return full.reshape(-1)                              # global (width,)

    sm = shard_map(
        inner, mesh=mesh,
        in_specs=(P(AXIS_DATA, AXIS_BUCKET, None),),
        out_specs=P(None), check_vma=False)                  # replicated

    return jax.jit(sm)


def routed_query_fn(sp: ShardedParams, table_shard, k: int):
    """query_fn that all-to-all routes probes to their bucket-owner shard and
    routes the counts back (for spectra too large to replicate). Must run
    inside shard_map over the same mesh; table_shard is this device's
    (width/S,) merged slice."""

    def qf(canon, valid):
        shape = canon.shape[:-1]
        flat = canon.reshape(-1, canon.shape[-1])
        fvalid = valid.reshape(-1)
        recv, rvalid, _, meta = _route(flat, fvalid, sp)
        counts = query(sp.bloom, table_shard, recv, rvalid,
                       local_bits=sp.local_bits)
        return _route_back(counts, meta).reshape(shape)

    return qf


def merge_keep_sharded(mesh):
    """Partial (D,S,width/S) -> merged but still bucket-sharded (S, width/S)
    slices, for the routed-query correction path."""

    def inner(table_ds):
        t = jax.lax.psum(table_ds[0, 0], AXIS_DATA)
        return t[None]

    sm = shard_map(
        inner, mesh=mesh,
        in_specs=(P(AXIS_DATA, AXIS_BUCKET, None),),
        out_specs=P(AXIS_BUCKET, None), check_vma=False)

    return jax.jit(sm)


def gather_exact_host(exact, k: int):
    """Host-merge per-(data,bucket) exact shards into one global spectrum.

    Bucket columns hold disjoint k-mer sets; data rows of one column overlap
    and are deduped here (summing counts). Returns (uniq (N,W) np.uint32,
    counts (N,) np.int64) in global sorted order (DESIGN.md §6).
    """
    def _host(x):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    uniq, counts, n = exact
    uniq = _host(uniq)
    counts = _host(counts)
    n = _host(n)
    D, S, cap, w = uniq.shape
    rows = []
    cnts = []
    for d in range(D):
        for s in range(S):
            m = int(n[d, s])
            rows.append(uniq[d, s, :m])
            cnts.append(counts[d, s, :m])
    from kmerax.spectrum.exact import np_merge_counted

    allrows = np.concatenate(rows, axis=0)
    allcnts = np.concatenate(cnts, axis=0).astype(np.int64)
    if len(allrows) == 0:
        return allrows.reshape(0, w), allcnts
    return np_merge_counted(allrows, allcnts)
