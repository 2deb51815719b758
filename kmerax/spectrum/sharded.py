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
from kmerax.spectrum.exact import SENTINEL_WORD, sentinel_rows


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
        assert self.bloom.counter == "i32", \
            "sharded spectra keep i32 counters (packed-halfword psum carries)"

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


def _route(canon_flat, valid_flat, sp: ShardedParams, cap: int | None = None):
    """All-to-all route k-mers to bucket owners. Runs INSIDE shard_map.

    Returns (recv (S*C, W) kmer rows, recv_valid (S*C,), overflow scalar,
    route_meta for answer-return paths). Default capacity is the
    route_safety fair share (overflow counted); cap=n is LOSSLESS — no
    destination can overflow — which query paths require (a dropped probe
    would silently read as weak).
    """
    S = sp.n_shards
    n, w = canon_flat.shape
    if cap is None:
        cap = -(-n * sp.route_safety // S)       # ceil, per-destination slots
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
    (r"^pending$", P(AXIS_DATA, AXIS_BUCKET, None, None)),
]


def make_sharded_state(sp: ShardedParams, mesh, pend_rows: int | None,
                       k: int):
    """Initial per-device state, placed via the partition-rule engine
    (SHARDED_STATE_RULES + dist.partition, SURVEY.md §2 #21).

    The global-width table is represented (D, S, width/S): row d holds data
    replica d's partial counts of the S range shards. `pend_rows` sizes the
    per-device raw-kmer pending buffer for the exact spectrum (flushed to
    the HOST by the pipeline — no per-device capacity wall; round-3
    scale design, spectrum/host.py); None skips the exact spectrum.
    """
    from kmerax.dist.partition import shard_tree

    D = mesh.shape[AXIS_DATA]
    S = mesh.shape[AXIS_BUCKET]
    w = (k + 15) // 16
    perw = sp.bloom.width // S

    tree = {"table": np.zeros((D, S, perw), np.int32)}
    if pend_rows is not None:
        tree["pending"] = np.broadcast_to(
            np.asarray(sentinel_rows(pend_rows, w))[None, None],
            (D, S, pend_rows, w))
    placed = shard_tree(mesh, tree, SHARDED_STATE_RULES)
    return placed["table"], placed.get("pending")


def sharded_insert_step(sp: ShardedParams, mesh, k: int,
                        with_pending: bool):
    """Build the jitted per-batch distributed count step.

    step(table, pending, bases, off) -> (table, pending, n_kmers, overflow)
      table (D,S,width/S) sharded; pending (D,S,P,W) raw-row buffer (the
      exact-spectrum accumulator, flushed to the HOST by the pipeline at
      `off` wraparound — sentinel rows mark invalid lanes); bases (Bg, L)
      sharded over ("data","bucket"); off = replicated row offset.

    Per-device routed rows per batch (the pending append width) =
    S * route_capacity; the caller advances off by `recv_rows(sp, n)`.
    """
    w = (k + 15) // 16

    def inner(table_ds, bases_blk, off, *pending_blk):
        words, valid = extract_kmers(bases_blk.astype(jnp.int32), k)
        canon, _ = canonical_words(words, k)
        flat = canon.reshape(-1, w)
        fvalid = valid.reshape(-1)
        recv, rvalid, overflow, _ = _route(flat, fvalid, sp)
        tbl = insert(sp.bloom, table_ds[0, 0], recv, rvalid,
                     local_bits=sp.local_bits)
        nk = jax.lax.psum(jnp.sum(fvalid.astype(jnp.int32)),
                          (AXIS_DATA, AXIS_BUCKET))
        ovf = jax.lax.psum(overflow, (AXIS_DATA, AXIS_BUCKET))
        # overflow => the WHOLE batch is a no-op (table and pending keep
        # their pre-batch state) so the driver can double route_safety and
        # replay the batch without double counting (SURVEY.md §7
        # hard-parts: recirculated overflow handling)
        ok = ovf == 0
        tbl = jnp.where(ok, tbl, table_ds[0, 0])
        outs = (tbl[None, None], nk, ovf)
        if pending_blk:
            pend = pending_blk[0]
            masked = jnp.where(rvalid[:, None], recv,
                               jnp.uint32(SENTINEL_WORD))
            new_pend = jax.lax.dynamic_update_slice(
                pend[0, 0], masked, (off, 0))
            new_pend = jnp.where(ok, new_pend, pend[0, 0])
            outs = outs + (new_pend[None, None],)
        return outs

    in_specs = [P(AXIS_DATA, AXIS_BUCKET, None), P((AXIS_DATA, AXIS_BUCKET)),
                P()]
    out_specs = [P(AXIS_DATA, AXIS_BUCKET, None), P(), P()]
    if with_pending:
        in_specs += [P(AXIS_DATA, AXIS_BUCKET, None, None)]
        out_specs += [P(AXIS_DATA, AXIS_BUCKET, None, None)]

    sm = shard_map(inner, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=tuple(out_specs), check_vma=False)

    # table and pending are DONATED: the step's functional update reuses
    # their buffers in place (the caller always rebinds to the outputs, so
    # the old generation is never read again — including the overflow
    # replay, which replays with the RETURNED unchanged arrays). Without
    # donation every batch allocates a fresh table+pending generation
    # (hundreds of MB to GBs at config-4/5 widths) and allocator churn
    # inflates RSS far past the live set.
    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(table, pending, bases, off=0):
        off = jnp.asarray(off, jnp.int32)
        if pending is not None:
            t, nk, ovf, pend = sm(table, bases, off, pending)
            return t, pend, nk, ovf
        t, nk, ovf = sm(table, bases, off)
        return t, None, nk, ovf

    return step


def recv_rows(sp: ShardedParams, n_flat: int) -> int:
    """Routed rows landing on each device per batch (= pending append
    width): S destinations x per-destination capacity."""
    S = sp.n_shards
    return S * (-(-n_flat * sp.route_safety // S))


def flush_pending_local(pending, off: int, k: int):
    """Read THIS process's pending shards off the mesh and return their raw
    (rows, ones) for host merging. Each (d, s) block lives on exactly one
    device, so the union over processes is exactly the routed stream."""
    w = (k + 15) // 16
    rows = []
    for shard in pending.addressable_shards:
        blk = np.asarray(shard.data).reshape(-1, w)[:off]
        blk = blk[~np.all(blk == np.uint32(SENTINEL_WORD), axis=1)]
        rows.append(blk)
    if not rows:
        return np.zeros((0, w), np.uint32)
    return np.concatenate(rows, axis=0)


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
    (width/S,) merged slice. LOSSLESS routing (cap = n): a dropped probe
    would silently read as count 0, so query paths never use the
    fair-share capacity."""

    def qf(canon, valid):
        shape = canon.shape[:-1]
        flat = canon.reshape(-1, canon.shape[-1])
        fvalid = valid.reshape(-1)
        recv, rvalid, _, meta = _route(flat, fvalid, sp, cap=flat.shape[0])
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


def allgather_spectrum(rows: np.ndarray, counts: np.ndarray):
    """Union per-process host spectra into one global sorted spectrum on
    every process (replaces the old device exact-shard gather).

    Each process passes its locally merged (rows (N_p, W) uint32, counts
    (N_p,) int64); sizes may differ across processes — padded allgather,
    then one host radix merge (deterministic, so every process derives the
    identical global spectrum)."""
    from kmerax.spectrum.exact import np_merge_counted

    if jax.process_count() == 1:
        return rows, counts
    from jax.experimental import multihost_utils as mh

    w = rows.shape[1]
    n = np.asarray(mh.process_allgather(np.array([len(rows)])))  # (P, 1)
    maxn = int(n.max())
    pr = np.full((maxn, w), SENTINEL_WORD, np.uint32)
    pr[:len(rows)] = rows
    pc = np.zeros(maxn, np.int64)
    pc[:len(rows)] = counts
    allr = np.asarray(mh.process_allgather(pr))        # (P, maxn, W)
    allc = np.asarray(mh.process_allgather(pc))
    parts_r = [allr[p, :int(n[p, 0])] for p in range(len(n))]
    parts_c = [allc[p, :int(n[p, 0])] for p in range(len(n))]
    return np_merge_counted(np.concatenate(parts_r, axis=0),
                            np.concatenate(parts_c, axis=0))
