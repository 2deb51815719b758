"""Fused Pallas correction kernel: variant generation + spectrum lookup
(the "C++ SIMD correction loop -> Pallas vectorized spectrum lookup+edit"
of BASELINE.json:5; SURVEY.md §2 #13).

The XLA candidate evaluation (`ops.correct._eval_entries`) spends most of
its time in an element-wise (Q, 2k-1) window gather (~11 cyc/element on
v5e, experiments/fused_lab2.py E1) plus the canonical/hash passes that
materialize (Q, 4, k, W) intermediates through HBM. This module replaces
all of it with two Pallas stages:

  stage 1 (`_prep_kernel`, VPU-vectorized, no serial loads):
    * per-entry window alignment by a BARREL-SHIFT roll: the bases row is
      rolled left by the per-entry window start using 8 masked power-of-two
      `pltpu.roll`s — full-row row-gathers in XLA are free
      (experiments/fused_lab2.py E1b), so the gather disappears entirely;
    * window validity via a log-tree windowed sum of bad-base flags;
    * the k-mer shift-or fold with WINDOWS ON THE LANE AXIS: lane
      l = v*k + j holds variant v of window j, so all 4*k (variant, window)
      probes of an entry occupy one 128-lane vector row;
    * center-base XOR variants, canonicalization (complement + 2-bit-group
      reversal + word swap + funnel shift), and the murmur3 probe hash —
      all uint32 lane ops, bit-exact vs core.codec/core.hash.
  stage 2: the existing VMEM-resident solidity probe kernel
    (spectrum.pallas_bloom._query_pallas_flat) over the packed lanes.

Scores come back as one (Q, 128) solidity plane -> (Q, 4, k) sums; the
accept rule is unchanged from ops.correct. Results are bit-identical to
the XLA `_eval_entries` path (tests/unit/test_pallas_correct.py runs both).

Only the "hash" bucket scheme is supported in-kernel (block = low h1 bits,
DESIGN.md §5a — the default); the XLA path remains for "minimizer".
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the lane building blocks are the ONE shared implementation (SURVEY.md §2
# #4): murmur3 fmix32 from core.hash, 2-bit-group reversal from core.codec —
# both are plain uint32 jnp ops, legal inside Mosaic kernels, so the kernel
# can never drift from the XLA path's hashing/canonicalization
from kmerax.core.codec import _reverse_pairs_u32 as _revpairs
from kmerax.core.hash import HASH_SEED_1, HASH_SEED_2, mix32 as _mix32

TR = 128                      # entries per grid step
VALID_BIT = 28                # must match spectrum.pallas_bloom.VALID_BIT
LP = 256                      # padded row length (max_read_len + k - 1 <= 256)


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


def _roll_l(x, i, n):
    """Roll lanes left by static i (lane m <- lane m+i), axis size n."""
    if i % n == 0:
        return x
    return pltpu.roll(x, shift=n - (i % n), axis=1)


def _roll_r(x, i, n):
    """Roll lanes right by static i (lane m <- lane m-i)."""
    if i % n == 0:
        return x
    return pltpu.roll(x, shift=i % n, axis=1)


def _prep_kernel(k: int, d: int, nvar: int, vbase: int, block_mask: int,
                 rows_ref, meta_ref, blk_ref, lp_ref):
    """One grid step: build probe addressing for TR entries.

    rows_ref: (TR, LP) int32 bases rows (padded with 4 past read length).
    meta_ref: (TR, 2) int32 — lane 0 = window start c (= ic - (k-1), may be
      negative), lane 1 = lj' (last valid window of the read; -1 disables
      the whole entry).
    Outputs blk_ref/lp_ref (TR, 128): lane l = vbase-relative variant
    v = l // k, window j = l % k; lanes >= nvar*k are dead.
    """
    W = (k + 15) // 16
    c = meta_ref[:, 0:1]                                   # (TR, 1)
    lj = meta_ref[:, 1:2]

    # ---- barrel-shift roll left by (c mod LP): lane m <- row[(c+m) % LP].
    # Negative c wraps into the row's 4-padding (LP >= L + k - 1), so no
    # explicit out-of-bounds masking is needed (matches the XLA path's
    # "oob -> base 4" exactly).
    x = rows_ref[:]
    cm = c & (LP - 1)
    for b in range((LP - 1).bit_length()):
        r = pltpu.roll(x, shift=LP - (1 << b), axis=1)     # left by 2^b
        x = jnp.where(((cm >> b) & 1) == 1, r, x)
    wb = x[:, :128]                                        # lanes 0..2k-2 live

    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, 128), 1)

    # ---- window validity: window j (lane j) is valid iff no bad base in
    # wb[j .. j+k-1], with the CENTER (lane k-1) forced valid — every
    # variant writes a real base there (ops.correct._eval_entries).
    bad = jnp.where((wb >= 4) & (lane != k - 1), 1, 0)
    # log-tree windowed sum: pow2 prefix widths, then compose k.
    pw = {1: bad}
    w2 = 1
    while w2 * 2 <= k:
        pw[w2 * 2] = pw[w2] + _roll_l(pw[w2], w2, 128)
        w2 *= 2
    acc = None
    off = 0
    rem = k
    for width in sorted(pw, reverse=True):
        while rem >= width:
            part = _roll_l(pw[width], off, 128)
            acc = part if acc is None else acc + part
            off += width
            rem -= width
    wvalid = acc == 0                                      # lanes 0..k-1

    # ---- k-mer shift-or fold, windows on lanes: word wi of window j folds
    # bases wb[j+i] for i in [lo, hi) (little-endian, leftmost base highest
    # — core.kmers.extract_kmers).
    b2 = (wb & 3).astype(jnp.uint32)
    words0 = []
    for wi in range(W):
        lo, hi = max(k - 16 * (wi + 1), 0), k - 16 * wi
        acc_w = jnp.zeros((TR, 128), jnp.uint32)
        for i in range(lo, hi):
            acc_w = (acc_w << 2) | _roll_l(b2, i, 128).astype(jnp.uint32)
        words0.append(acc_w)

    # ---- replicate window lanes j -> variant lanes l = v*k + j.
    in_k = lane < k

    def rep(x, zero):
        x0 = jnp.where(in_k, x, zero)
        out = x0
        for v in range(1, nvar):
            out = out | _roll_r(x0, v * k, 128)
        return out

    words_r = [rep(w, _u32(0)) for w in words0]
    wvalid_r = rep(wvalid.astype(jnp.int32), 0) == 1
    jl = lane % k                                           # window j per lane
    vl = lane // k + vbase                                  # variant base value

    # ---- center XOR variants: window j sees the center at window-relative
    # position q = k-1-j, which lives at bit shift 2*(hi-1-q) of word wi_j
    # (all static per lane — ops.correct._eval_entries derivation).
    q = k - 1 - jl
    wi_l = jnp.zeros((TR, 128), jnp.int32)
    sh_l = jnp.zeros((TR, 128), jnp.int32)
    for wi in range(W):
        lo, hi = max(k - 16 * (wi + 1), 0), k - 16 * wi
        in_w = (q >= lo) & (q < hi)
        wi_l = jnp.where(in_w, wi, wi_l)
        sh_l = jnp.where(in_w, 2 * (hi - 1 - q), sh_l)
    old_c = (wb[:, k - 1:k] & 3).astype(jnp.uint32)        # (TR, 1)
    delta = (old_c ^ vl.astype(jnp.uint32)) << sh_l.astype(jnp.uint32)
    words4 = [w ^ jnp.where(wi_l == wi, delta, _u32(0))
              for wi, w in enumerate(words_r)]

    # ---- canonical = min(fwd, revcomp) (core.codec.canonical_words)
    rx = [_revpairs(words4[W - 1 - i] ^ _u32(0xFFFFFFFF)) for i in range(W)]
    s = 32 * W - 2 * k
    if s:
        rc = [(rx[i] >> s) | ((rx[i + 1] << (32 - s)) if i + 1 < W else _u32(0))
              for i in range(W)]
    else:
        rc = rx
    fwd_le = jnp.zeros((TR, 128), bool)
    eq = jnp.ones((TR, 128), bool)
    for i in range(W - 1, -1, -1):                         # high word dominates
        fwd_le = fwd_le | (eq & (words4[i] < rc[i]))
        eq = eq & (words4[i] == rc[i])
    fwd_le = fwd_le | eq
    canon = [jnp.where(fwd_le, words4[i], rc[i]) for i in range(W)]

    # ---- murmur3 probe hash + hash-scheme block addressing (core.hash)
    h1 = _mix32(jnp.full((TR, 128), HASH_SEED_1, jnp.uint32))
    h2 = _mix32(jnp.full((TR, 128), HASH_SEED_2, jnp.uint32))
    for i in range(W):
        h1 = _mix32(h1 ^ canon[i])
        h2 = _mix32(h2 ^ canon[i])
    block = (h1 & _u32(block_mask)).astype(jnp.int32)
    lp = h2 & _u32(127)
    for j in range(1, d):
        lp = lp | (((h2 >> (7 * j)) & _u32(127)) << (7 * j))

    # ---- lane validity: real window, probe in the read's window range
    jg = c + jl                                             # global window idx
    valid = wvalid_r & (jg >= 0) & (jg <= lj) & (lane < nvar * k)
    blk_ref[:] = jnp.where(valid, block, 0)
    lp_ref[:] = jnp.where(valid, lp.astype(jnp.int32) | (1 << VALID_BIT), 0)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 7))
def _prep_pallas(k: int, d: int, nvar: int, vbase: int, block_mask: int,
                 rows, meta, interpret: bool):
    """rows (Q, LP) int32, meta (Q, 2) int32; Q a multiple of TR.
    Returns (block (Q, 128) int32, lanepack (Q, 128) int32)."""
    Q = rows.shape[0]
    f = pl.pallas_call(
        functools.partial(_prep_kernel, k, d, nvar, vbase, block_mask),
        out_shape=(jax.ShapeDtypeStruct((Q, 128), jnp.int32),
                   jax.ShapeDtypeStruct((Q, 128), jnp.int32)),
        grid=(Q // TR,),
        in_specs=[
            pl.BlockSpec((TR, LP), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 2), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((TR, 128), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((TR, 128), lambda s: (s, 0),
                                memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=Q * 128 * 260, bytes_accessed=Q * (LP + 3 * 128) * 4,
            transcendentals=0),
        interpret=interpret,
    )
    return f(rows, meta)


def eval_entries_fused(params, table, t, bases, lengths, last_j,
                       ent_r, ent_i, *, interpret: bool = False):
    """Drop-in fused replacement for ops.correct._eval_entries: score all
    four substitutions per (read, position) entry against the VMEM-resident
    count table. Bit-identical to the XLA path (same accept rule)."""
    from kmerax.spectrum.pallas_bloom import _query_pallas_flat

    k = params.k
    d = params.num_hashes
    B, L = bases.shape
    Q = ent_r.shape[0]
    nvar = 4 if 4 * k <= 128 else 2
    nslab = 4 // nvar
    block_mask = (1 << (params.log2_width - 7)) - 1

    ic = jnp.clip(ent_i, 0, L - 1)
    c = ic - (k - 1)
    lj_e = jnp.where(ent_i >= 0, last_j[ent_r], -1)

    rows_all = jnp.pad(bases, ((0, 0), (0, LP - L)), constant_values=4)
    rows = rows_all[jnp.clip(ent_r, 0, B - 1)]             # (Q, LP) row gather
    meta = jnp.stack([c, lj_e], axis=1)                    # (Q, 2)

    qpad = (-Q) % TR
    if qpad:
        rows = jnp.concatenate(
            [rows, jnp.full((qpad, LP), 4, jnp.int32)])
        meta = jnp.concatenate(
            [meta, jnp.stack([jnp.zeros(qpad, jnp.int32),
                              jnp.full(qpad, -1, jnp.int32)], axis=1)])
    Qp = Q + qpad

    nrows = table.shape[0] // 128
    lanes_parts = []
    for slab in range(nslab):
        blk, lp = _prep_pallas(k, d, nvar, slab * nvar, block_mask,
                               rows, meta, interpret)
        solid = _query_pallas_flat(
            d, nrows, jnp.asarray(t, jnp.int32), blk.reshape(-1),
            lp.reshape(-1), interpret, params.counter == "p16",
            table.reshape(nrows, 128))
        lanes_parts.append(
            solid.reshape(Qp, 128)[:Q, :nvar * k].reshape(Q, nvar, k))
    scores = jnp.sum(jnp.concatenate(lanes_parts, axis=1), axis=-1,
                     dtype=jnp.int32)                      # (Q, 4)

    # accept rule — identical to ops.correct._eval_entries
    cur = bases[ent_r, ic]
    cur_score = jnp.where(
        cur < 4,
        jnp.take_along_axis(
            scores, jnp.clip(cur, 0, 3)[:, None].astype(jnp.int32),
            axis=1)[:, 0],
        0)
    best_s = jnp.max(scores, axis=1)
    best_b = jnp.argmax(scores, axis=1).astype(bases.dtype)
    accept = ((ent_i >= 0) & (best_b != cur)
              & (best_s > cur_score) & (best_s >= 1))
    return best_b, accept


def make_fused_eval(params, table, t, *, interpret: bool = False):
    """Return an `eval_fn(bases, lengths, last_j, ent_r, ent_i)` for
    correct_batch when the fused path applies, else None.

    Requirements: hash bucket scheme (block = low h1 bits), table fits the
    probe kernel's VMEM budget, TPU backend (or interpret=True for tests),
    read length + k - 1 within the padded row.
    """
    from kmerax.spectrum.pallas_bloom import pallas_insert_ok

    if params.bucket_scheme != "hash":
        return None
    if not (interpret or pallas_insert_ok(params,
                                          table_entries=table.shape[0])):
        return None

    def eval_fn(bases, lengths, last_j, ent_r, ent_i):
        if bases.shape[1] + params.k - 1 > LP:
            raise ValueError(
                f"read length {bases.shape[1]} + k - 1 exceeds LP={LP}")
        return eval_entries_fused(params, table, t, bases, lengths, last_j,
                                  ent_r, ent_i, interpret=interpret)

    return eval_fn
