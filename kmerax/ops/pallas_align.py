"""Pallas TPU kernel for banded seed-extend alignment (the last of the four
reference compute stages mandated as a kernel: BASELINE.json:5 "seed-extend
banded alignment run as Pallas kernels"; SURVEY.md §2 #14).

Formulation is bit-identical to ops.align.banded_align_scores (itself
bit-exact vs oracle.align): diagonal-coordinate band rows with the linear-gap
within-row dependency solved by the max-plus cummax identity.

Layout: TRANSPOSED relative to the XLA path — the band diagonal d lives on
the SUBLANE axis (W = 2*band+1 <= SUB sublanes) and reads live on the LANE
axis (TR = 128 reads per grid step). Wins over the XLA path:

  * each DP row is a (SUB, 128) register plane — for the default band=15
    that is 32x128, 4x fewer elements than a lane-major (128, 128) plane,
    and the whole (B, n+1, W) rows tensor the XLA path pushes through HBM
    never exists;
  * the target window for DP row i is ONE dynamic sublane slice
    tpadT[i:i+SUB] — no per-row gathers, no rolling of full-width planes;
  * the within-row cummax is a log2(W)-step shift tree of static sublane
    rolls;
  * the final cell is harvested on the fly: at row i each read with
    qlen == i snapshots its diagonal tlen - qlen + band, so no post-hoc
    gather exists at all.

Scoring constants (MATCH/MISMATCH/GAP/NEG_INF) are imported from ops.align
so the two paths can never drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.ops.align import GAP, MATCH, MISMATCH, NEG_INF

TR = 128                       # reads per grid step (lane axis)
_SEL_MIN = -(1 << 31) + 1      # below NEG_INF: select identity for max


def _sub(w: int) -> int:
    """Band sublane count: W rounded up to the 8-sublane tile."""
    return -(-w // 8) * 8


def _align_kernel(n: int, band: int, SUB: int,
                  tpadT_ref, qT_ref, meta_ref, out_ref):
    """One grid step: score TR banded alignments.

    tpadT_ref: (1, LT, TR) int32 — transposed target rows padded with
      base-4 sentinels, band+1 on top (so band sublane d of DP row i reads
      target[j-1] for j = i + d - band), enough below that the SUB-sublane
      window stays in-range for every row i <= n.
    qT_ref: (1, LQ, TR) int32 — transposed query rows (4-padded past qlen).
    meta_ref: (1, 8, TR) int32 — sublane 0 = qlen, sublane 1 = tlen.
    out_ref: (1, 8, TR) int32 — sublane 0 = final DP cell S[qlen][tlen]
      (NEG_INF when no in-band path reaches it). The |tlen-qlen| <= band
      gate is applied by the wrapper, as in ops.align.banded_align_scores.
    """
    W = 2 * band + 1
    d_sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, TR), 0)
    ninf = jnp.full((SUB, TR), NEG_INF, jnp.int32)

    qlen = meta_ref[0, 0:1, :]                             # (1, TR)
    tl = meta_ref[0, 1:2, :]

    # row 0: S[0][j] = GAP*j for 0 <= j <= min(band, tlen), else -inf
    j0 = d_sub - band
    row0 = jnp.where((j0 >= 0) & (j0 <= tl) & (d_sub < W), GAP * j0, NEG_INF)

    # dfin: diagonal of the final cell in row qlen
    dfin = jnp.clip(tl - qlen + band, 0, W - 1)

    def select(row, cond):
        """max over sublanes of row where (d == dfin) & cond."""
        picked = jnp.where((d_sub == dfin) & cond, row, _SEL_MIN)
        return jnp.max(picked, axis=0, keepdims=True)

    score0 = jnp.where(qlen == 0, select(row0, qlen == 0),
                       jnp.full((1, TR), NEG_INF, jnp.int32))

    shifts = []
    s = 1
    while s < W:
        shifts.append(s)
        s *= 2

    def body(i, carry):
        prev, score = carry
        # band sublane d of row i reads tpadT[i + d] = target[j-1],
        # j = i + d - band (the band+1 top padding supplies j <= 0)
        tslc = tpadT_ref[0, pl.ds(i, SUB), :]
        qi = qT_ref[0, pl.ds(i - 1, 1), :]                 # query[i-1], (1,TR)
        sub = jnp.where((tslc == qi) & (qi < 4), MATCH, MISMATCH)

        diag = prev + sub                                  # S[i-1][j-1]
        up = jnp.where(d_sub >= W - 1, ninf,
                       pltpu.roll(prev, shift=SUB - 1, axis=0)) + GAP
        j = i + d_sub - band
        valid = (j >= 1) & (j <= tl) & (d_sub < W)
        Mv = jnp.where(valid, jnp.maximum(diag, up), NEG_INF)
        col0 = jnp.where((j == 0) & (i <= band), GAP * i, NEG_INF)
        f = jnp.maximum(Mv, col0) - GAP * d_sub
        # cummax over the band: log-shift tree (shift down, -inf fill)
        for sh in shifts:
            f = jnp.maximum(f, jnp.where(d_sub < sh, ninf,
                                         pltpu.roll(f, shift=sh, axis=0)))
        row = f + GAP * d_sub
        row = jnp.where(valid | ((j == 0) & (i <= band)), row, NEG_INF)

        score = jnp.where(qlen == i, select(row, qlen == i), score)
        return (row, score)

    _, score = jax.lax.fori_loop(1, n + 1, body, (row0, score0))
    s8 = jax.lax.broadcasted_iota(jnp.int32, (8, TR), 0)
    out_ref[0] = jnp.where(s8 == 0, jnp.broadcast_to(score, (8, TR)),
                           NEG_INF)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5))
def _align_pallas(n: int, band: int, SUB: int, tpadT, qT, interpret, meta):
    NB = tpadT.shape[0]
    LT, LQ = tpadT.shape[1], qT.shape[1]
    f = pl.pallas_call(
        functools.partial(_align_kernel, n, band, SUB),
        out_shape=jax.ShapeDtypeStruct((NB, 8, TR), jnp.int32),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, LT, TR), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LQ, TR), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TR), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=NB * TR * n * SUB * 30,
            bytes_accessed=NB * TR * (LT + LQ + 16) * 4, transcendentals=0),
        interpret=interpret,
    )
    return f(tpadT, qT, meta)


def banded_align_scores_pallas(query, target, qlen, tlen, band: int, *,
                               interpret: bool = False):
    """Pallas drop-in for ops.align.banded_align_scores: (B,) int32 scores,
    bit-identical (same recurrence, same NEG_INF contract)."""
    B, n = query.shape
    m = target.shape[1]
    W = 2 * band + 1
    assert W <= 128, "band must fit the sublane window"
    SUB = _sub(W)

    bpad = (-B) % TR
    if bpad:
        zr = lambda a, v: jnp.concatenate(
            [a, jnp.full((bpad,) + a.shape[1:], v, a.dtype)])
        query, target = zr(query, 4), zr(target, 4)
        qlen, tlen = zr(qlen, 0), zr(tlen, 0)
    Bp = B + bpad
    NB = Bp // TR

    # top pad band+1 sentinels; bottom pad so window [i, i+SUB) is in-range
    # for i <= n AND every in-band index i + W - 1 <= n + 2*band is covered
    LT = -(-max(band + 1 + m, n + SUB) // 8) * 8
    rpad = LT - (band + 1 + m)
    tpad = jnp.concatenate(
        [jnp.full((Bp, band + 1), 4, jnp.int32), target.astype(jnp.int32),
         jnp.full((Bp, rpad), 4, jnp.int32)], axis=1)
    LQ = -(-n // 8) * 8
    qpad = jnp.concatenate(
        [query.astype(jnp.int32), jnp.full((Bp, LQ - n), 4, jnp.int32)],
        axis=1)

    tpadT = tpad.reshape(NB, TR, LT).transpose(0, 2, 1)
    qT = qpad.reshape(NB, TR, LQ).transpose(0, 2, 1)
    meta = jnp.zeros((NB, 8, TR), jnp.int32)
    meta = meta.at[:, 0, :].set(qlen.astype(jnp.int32).reshape(NB, TR))
    meta = meta.at[:, 1, :].set(tlen.astype(jnp.int32).reshape(NB, TR))

    out = _align_pallas(n, band, SUB, tpadT, qT, interpret, meta)
    score = out[:, 0, :].reshape(-1)[:B]
    return jnp.where(jnp.abs(tlen[:B] - qlen[:B]) <= band, score, NEG_INF)


def pallas_align_ok(band: int, backend: str | None = None) -> bool:
    """True when the Pallas aligner applies: TPU backend, band fits the
    sublane window."""
    import os

    if os.environ.get("KMERAX_NO_PALLAS"):
        return False
    backend = backend or jax.default_backend()
    return backend == "tpu" and 2 * band + 1 <= 128


def banded_align_scores_auto(query, target, qlen, tlen, band: int):
    """Backend-dispatched banded scores: the Pallas kernel on TPU, the XLA
    max-plus-scan path elsewhere (both bit-exact vs oracle.align)."""
    from kmerax.ops.align import banded_align_scores

    if pallas_align_ok(band):
        return banded_align_scores_pallas(query, target, qlen, tlen, band)
    return banded_align_scores(query, target, qlen, tlen, band)
