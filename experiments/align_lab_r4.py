"""Round-4 lab: Pallas banded-aligner variants, measured on the v5e chip.

Variants over the baseline transposed kernel (ops/pallas_align.py):
  A  baseline (TR=128, per-row select reduction, misaligned dynamic slice)
  B  TR=256 lanes (amortize per-op issue overhead)
  C  score-PLANE accumulation (one reduce at the end, 2 ops/row instead of
     a masked reduction per row)
  D  aligned target loads: outer loop over 8-row chunks, one aligned
     (SUB+8) window load, 8 static-offset inner steps
All variants asserted bit-equal to the XLA path before timing.
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.ops.align import GAP, MATCH, MISMATCH, NEG_INF, \
    banded_align_scores

_SEL_MIN = -(1 << 31) + 1
NEG_INF16 = -(1 << 14)          # int16 sentinel; deltas preserved (max-plus
_SEL_MIN16 = -(1 << 15)         # algebra is shift-invariant)


def make_kernel16(n, band, SUB, TR, aligned):
    """int16 variant: same recurrence in the shifted tropical semiring;
    no-path values live at NEG_INF16 + delta with delta bit-identical to
    the int32 path's NEG_INF + delta (no saturation anywhere). All scalar /
    index math stays int32 (Mosaic supports only i32 scalars); DP values
    are int16 planes. The first CH rows (which need the column-0 boundary)
    are peeled and unrolled with static i, so the traced steady-state body
    has no col0 and no j >= 1 test (i > band implies both)."""
    del aligned
    W = 2 * band + 1
    CH = 16
    assert band + 1 <= CH and n % CH == 0
    shifts = []
    s = 1
    while s < W:
        shifts.append(s)
        s *= 2
    i16 = jnp.int16

    def kernel(tpadT_ref, qT_ref, meta_ref, out_ref):
        d_sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, TR), 0)
        ninf = jnp.full((SUB, TR), NEG_INF16, i16)
        gapd = (GAP * d_sub).astype(i16)
        match_p = jnp.full((SUB, TR), MATCH, i16)
        mism_p = jnp.full((SUB, TR), MISMATCH, i16)
        gap_p = jnp.full((SUB, TR), GAP, i16)
        dmask = d_sub < W
        upmask = d_sub >= W - 1
        qlen = meta_ref[0, 0:1, :].astype(jnp.int32)
        tl = meta_ref[0, 1:2, :].astype(jnp.int32)
        j0 = d_sub - band
        row0 = jnp.where((j0 >= 0) & (j0 <= tl) & dmask,
                         (GAP * j0).astype(i16), NEG_INF16)
        dfin = jnp.clip(tl - qlen + band, 0, W - 1)
        deq = d_sub == dfin
        acc0 = jnp.where(deq & (qlen == 0), row0,
                         jnp.full((SUB, TR), _SEL_MIN16, i16))

        ninf_top = jnp.full((1, TR), NEG_INF16, i16)

        def shift_dn(f, sh):
            """out[d] = f[d-sh] for d >= sh, -inf below (static sublanes)."""
            return jnp.concatenate(
                [jnp.full((sh, TR), NEG_INF16, i16),
                 jax.lax.slice_in_dim(f, 0, SUB - sh, axis=0)], axis=0)

        def tree(f):
            for sh in shifts:
                f = jnp.maximum(f, shift_dn(f, sh))
            return f

        def row_core(i, prev, acc, tslc, qi, boundary):
            sub = jnp.where((tslc == qi) & (qi < 4), match_p, mism_p)
            diag = prev + sub
            up = jnp.concatenate(
                [jax.lax.slice_in_dim(prev, 1, SUB, axis=0), ninf_top],
                axis=0) + gap_p
            up = jnp.where(upmask, ninf, up)
            j = (i - band) + d_sub
            if boundary:
                valid = (j >= 1) & (j <= tl) & dmask
            else:
                valid = (j <= tl) & dmask
            Mv = jnp.where(valid, jnp.maximum(diag, up), ninf)
            if boundary:
                col0 = jnp.where((j == 0) & (i <= band),
                                 jnp.full((SUB, TR), GAP, jnp.int32) * i,
                                 NEG_INF16).astype(i16)
                Mv = jnp.maximum(Mv, col0)
                keep = valid | ((j == 0) & (i <= band))
            else:
                keep = valid
            row = tree(Mv - gapd) + gapd
            row = jnp.where(keep, row, ninf)
            acc = jnp.where(deq & (qlen == i), row, acc)
            return row, acc

        # peeled boundary chunk: static i in 1..CH
        win = tpadT_ref[0, 0:SUB + CH, :]
        qwin = qT_ref[0, 0:CH, :]
        prev, acc = row0, acc0
        for u in range(CH):
            tslc = jax.lax.slice_in_dim(win, u + 1, u + 1 + SUB, axis=0)
            qi = jax.lax.slice_in_dim(qwin, u, u + 1, axis=0)
            prev, acc = row_core(u + 1, prev, acc, tslc, qi,
                                 boundary=u + 1 <= band)

        def body(c, carry):
            prev, acc = carry
            base = pl.multiple_of(c * CH, CH)
            win = tpadT_ref[0, pl.ds(base, SUB + CH), :]
            qwin = qT_ref[0, pl.ds(base, CH), :]
            for u in range(CH):
                i = base + u + 1
                tslc = jax.lax.slice_in_dim(win, u + 1, u + 1 + SUB, axis=0)
                qi = jax.lax.slice_in_dim(qwin, u, u + 1, axis=0)
                prev, acc = row_core(i, prev, acc, tslc, qi, boundary=False)
            return prev, acc

        prev, acc = jax.lax.fori_loop(1, n // CH, body, (prev, acc))

        score = jnp.max(acc.astype(jnp.int32), axis=0,
                        keepdims=True).astype(i16)
        s8 = jax.lax.broadcasted_iota(jnp.int32, (16, TR), 0)
        out_ref[0] = jnp.where(s8 == 0, jnp.broadcast_to(score, (16, TR)),
                               NEG_INF16)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def run16(n, band, SUB, TR, aligned, tpadT, qT, meta):
    NB, LT = tpadT.shape[0], tpadT.shape[1]
    LQ = qT.shape[1]
    f = pl.pallas_call(
        make_kernel16(n, band, SUB, TR, aligned),
        out_shape=jax.ShapeDtypeStruct((NB, 16, TR), jnp.int16),
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, LT, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LQ, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return f(tpadT, qT, meta)


def prep16(q, t, qlen, tlen, band, TR, n_round=16):
    B, n = q.shape
    m = t.shape[1]
    W = 2 * band + 1
    SUB = -(-W // 16) * 16
    n_p = -(-n // n_round) * n_round
    bpad = (-B) % TR
    Bp = B + bpad
    NB = Bp // TR
    qp = np.full((Bp, n_p), 4, np.int16); qp[:B, :n] = q
    LT = -(-max(band + 1 + m, n_p + SUB + 16) // 16) * 16
    tp = np.full((Bp, LT), 4, np.int16); tp[:B, band + 1:band + 1 + m] = t
    qlp = np.zeros(Bp, np.int16); qlp[:B] = qlen
    tlp = np.zeros(Bp, np.int16); tlp[:B] = tlen
    tpadT = jnp.asarray(tp.reshape(NB, TR, LT).transpose(0, 2, 1).copy())
    qT = jnp.asarray(qp.reshape(NB, TR, n_p).transpose(0, 2, 1).copy())
    meta = np.zeros((NB, 16, TR), np.int16)
    meta[:, 0] = qlp.reshape(NB, TR)
    meta[:, 1] = tlp.reshape(NB, TR)
    return n_p, SUB, tpadT, qT, jnp.asarray(meta)


def make_kernel(n, band, SUB, TR, plane_acc, aligned):
    W = 2 * band + 1
    shifts = []
    s = 1
    while s < W:
        shifts.append(s)
        s *= 2

    def kernel(tpadT_ref, qT_ref, meta_ref, out_ref):
        d_sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, TR), 0)
        ninf = jnp.full((SUB, TR), NEG_INF, jnp.int32)
        qlen = meta_ref[0, 0:1, :]
        tl = meta_ref[0, 1:2, :]
        j0 = d_sub - band
        row0 = jnp.where((j0 >= 0) & (j0 <= tl) & (d_sub < W), GAP * j0,
                         NEG_INF)
        dfin = jnp.clip(tl - qlen + band, 0, W - 1)
        deq = d_sub == dfin

        def select(row, cond):
            picked = jnp.where(deq & cond, row, _SEL_MIN)
            return jnp.max(picked, axis=0, keepdims=True)

        if plane_acc:
            acc0 = jnp.where(deq & (qlen == 0), row0, _SEL_MIN)
        else:
            acc0 = jnp.where(qlen == 0, select(row0, qlen == 0),
                             jnp.full((1, TR), NEG_INF, jnp.int32))

        def row_step(i, prev, acc, tslc):
            qi = qT_ref[0, pl.ds(i - 1, 1), :]
            sub = jnp.where((tslc == qi) & (qi < 4), MATCH, MISMATCH)
            diag = prev + sub
            up = jnp.where(d_sub >= W - 1, ninf,
                           pltpu.roll(prev, shift=SUB - 1, axis=0)) + GAP
            j = i + d_sub - band
            valid = (j >= 1) & (j <= tl) & (d_sub < W)
            Mv = jnp.where(valid, jnp.maximum(diag, up), NEG_INF)
            col0 = jnp.where((j == 0) & (i <= band), GAP * i, NEG_INF)
            f = jnp.maximum(Mv, col0) - GAP * d_sub
            for sh in shifts:
                f = jnp.maximum(
                    f, jnp.where(d_sub < sh, ninf,
                                 pltpu.roll(f, shift=sh, axis=0)))
            row = f + GAP * d_sub
            row = jnp.where(valid | ((j == 0) & (i <= band)), row, NEG_INF)
            if plane_acc:
                acc = jnp.where(deq & (qlen == i), row, acc)
            else:
                acc = jnp.where(qlen == i, select(row, qlen == i), acc)
            return row, acc

        if not aligned:
            def body(i, carry):
                prev, acc = carry
                tslc = tpadT_ref[0, pl.ds(i, SUB), :]
                return row_step(i, prev, acc, tslc)
            prev, acc = jax.lax.fori_loop(1, n + 1, body, (row0, acc0))
        else:
            def body(c, carry):
                prev, acc = carry
                base = pl.multiple_of(c * 8, 8)
                win = tpadT_ref[0, pl.ds(base, SUB + 8), :]
                for u in range(8):
                    i = base + u + 1
                    tslc = jax.lax.slice_in_dim(win, u + 1, u + 1 + SUB,
                                                axis=0)
                    prev, acc = row_step(i, prev, acc, tslc)
                return prev, acc
            assert n % 8 == 0
            prev, acc = jax.lax.fori_loop(0, n // 8, body, (row0, acc0))

        if plane_acc:
            score = jnp.max(acc, axis=0, keepdims=True)
        else:
            score = acc
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, TR), 0)
        out_ref[0] = jnp.where(s8 == 0, jnp.broadcast_to(score, (8, TR)),
                               NEG_INF)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def run(n, band, SUB, TR, plane_acc, aligned, tpadT, qT, meta):
    NB, LT = tpadT.shape[0], tpadT.shape[1]
    LQ = qT.shape[1]
    f = pl.pallas_call(
        make_kernel(n, band, SUB, TR, plane_acc, aligned),
        out_shape=jax.ShapeDtypeStruct((NB, 8, TR), jnp.int32),
        grid=(NB,),
        in_specs=[pl.BlockSpec((1, LT, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, LQ, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, TR), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return f(tpadT, qT, meta)


def prep(q, t, qlen, tlen, band, TR, n_round=8):
    B, n = q.shape
    m = t.shape[1]
    W = 2 * band + 1
    SUB = -(-W // 8) * 8
    n_p = -(-n // n_round) * n_round
    bpad = (-B) % TR
    Bp = B + bpad
    NB = Bp // TR
    qp = np.full((Bp, n_p), 4, np.int32); qp[:B, :n] = q
    LT = -(-max(band + 1 + m, n_p + SUB + 8) // 8) * 8
    tp = np.full((Bp, LT), 4, np.int32); tp[:B, band + 1:band + 1 + m] = t
    qlp = np.zeros(Bp, np.int32); qlp[:B] = qlen
    tlp = np.zeros(Bp, np.int32); tlp[:B] = tlen
    tpadT = jnp.asarray(tp.reshape(NB, TR, LT).transpose(0, 2, 1).copy())
    qT = jnp.asarray(qp.reshape(NB, TR, n_p).transpose(0, 2, 1).copy())
    meta = np.zeros((NB, 8, TR), np.int32)
    meta[:, 0] = qlp.reshape(NB, TR)
    meta[:, 1] = tlp.reshape(NB, TR)
    return n_p, SUB, tpadT, qT, jnp.asarray(meta)


def main():
    from kmerax.utils.compile_cache import enable
    enable()
    rng = np.random.default_rng(0)
    B, n, band = 4096, 150, 15
    q = rng.integers(0, 5, (B, n)).astype(np.int32)
    t = np.where(rng.random((B, n)) < 0.05,
                 rng.integers(0, 4, (B, n)), q).astype(np.int32)
    qlen = rng.integers(100, n + 1, B).astype(np.int32)
    tlen = qlen.copy()
    ref = np.asarray(jax.jit(lambda *a: banded_align_scores(*a, band))(
        *map(jnp.asarray, (q, t, qlen, tlen))))

    def bench(f, args):
        for _ in range(2):
            np.asarray(f(*args))[:1]
        t0 = time.perf_counter(); R = 10
        for _ in range(R):
            r = f(*args)
        np.asarray(r)[:1]
        return (time.perf_counter() - t0) / R

    for name, TR, aligned in [("H16 tr128", 128, True),
                              ("H16 tr256", 256, True),
                              ("H16 tr512", 512, True)]:
        n_p, SUB, tpadT, qT, meta = prep16(q, t, qlen, tlen, band, TR)
        fn = lambda a, b, c: run16(n_p, band, SUB, TR, True, a, b, c)
        out16 = np.asarray(fn(tpadT, qT, meta))[:, 0, :].reshape(-1)[:B]
        out = out16.astype(np.int64)
        out = np.where(out > -8192, out, out - NEG_INF16 + NEG_INF)
        out = np.where(np.abs(tlen - qlen) <= band, out,
                       NEG_INF).astype(np.int64)
        ok = np.array_equal(out, ref.astype(np.int64))
        dt = bench(fn, (tpadT, qT, meta))
        print(f"{name:22s} parity={ok} {dt*1e3:7.3f} ms "
              f"{B/dt:12,.0f} reads/s")

    for name, TR, plane_acc, aligned in [
            ("A base", 128, False, False),
            ("D align8", 128, True, True),
            ("F tr256+plane+align8", 256, True, True)]:
        n_p, SUB, tpadT, qT, meta = prep(q, t, qlen, tlen, band, TR)
        fn = lambda a, b, c: run(n_p, band, SUB, TR, plane_acc, aligned,
                                 a, b, c)
        out = np.asarray(fn(tpadT, qT, meta))[:, 0, :].reshape(-1)[:B]
        out = np.where(np.abs(tlen - qlen) <= band, out, NEG_INF)
        ok = np.array_equal(out, ref)
        dt = bench(fn, (tpadT, qT, meta))
        print(f"{name:22s} parity={ok} {dt*1e3:7.3f} ms "
              f"{B/dt:12,.0f} reads/s")


if __name__ == "__main__":
    main()
