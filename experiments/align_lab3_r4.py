"""Round-4 lab 3: int16 banded-align kernel (the winning design candidate).

Mosaic facts measured in this environment (see /tmp probes, summarized):
  * arith.maxsi is not legalized for int16 -> max emulated as cmp+select;
  * int16 row-broadcast compares fail relayout -> base compares stay int32
    (bases are int32 planes; only DP values are int16);
  * pltpu.roll rejects non-32-bit data -> sublane shifts via static
    slice+concat (legal for int16);
  * int16 reductions unimplemented -> final reduce in int32.

DP values ride the shifted tropical semiring at NEG_INF16 = -(1<<14): all
real-path arithmetic is bit-identical to the int32 path, and no-path values
keep their exact delta from the sentinel (max-plus algebra is
shift-invariant, nothing saturates), so the wrapper maps deltas back to the
int32 NEG_INF contract exactly.
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

NEG_INF16 = -(1 << 14)
_SEL_MIN16 = -(1 << 15)
i16 = jnp.int16


def make_kernel16(n, band, SUB, TR):
    W = 2 * band + 1
    CH = 16
    assert band + 1 <= CH and n % CH == 0 and W <= SUB
    shifts = []
    s = 1
    while s < W:
        shifts.append(s)
        s *= 2

    def kernel(tpadT_ref, qT_ref, meta_ref, out_ref):
        d_sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, TR), 0)
        ninf = jnp.full((SUB, TR), NEG_INF16, i16)
        gapd = (GAP * d_sub).astype(i16)
        match_p = jnp.full((SUB, TR), MATCH, i16)
        mism_p = jnp.full((SUB, TR), MISMATCH, i16)
        gap_p = jnp.full((SUB, TR), GAP, i16)
        dmask = d_sub < W
        upmask = d_sub >= W - 1
        # (1, TR) rows broadcast to full planes ONCE: every mask must be
        # full-shape — (1, TR) i1 masks need a replicated relayout that
        # Mosaic rejects for 16-bit select operands (probe-verified).
        qlen = jnp.broadcast_to(meta_ref[0, 0:1, :], (SUB, TR))
        tl = jnp.broadcast_to(meta_ref[0, 1:2, :], (SUB, TR))
        j0 = d_sub - band
        row0 = jnp.where((j0 >= 0) & (j0 <= tl) & dmask,
                         (GAP * j0).astype(i16), ninf)
        dfin = jnp.clip(tl - qlen + band, 0, W - 1)
        deq = d_sub == dfin
        acc0 = jnp.where(deq & (qlen == 0), row0,
                         jnp.full((SUB, TR), _SEL_MIN16, i16))

        def vmax(a, b):
            return jnp.where(a > b, a, b)

        def shift_dn(f, sh):
            return jnp.concatenate(
                [jnp.full((sh, TR), NEG_INF16, i16),
                 jax.lax.slice_in_dim(f, 0, SUB - sh, axis=0)], axis=0)

        def row_core(i, prev, acc, tslc, qi, boundary):
            qib = jnp.broadcast_to(qi, (SUB, TR))
            sub = jnp.where((tslc == qib) & (qib < 4), match_p, mism_p)
            diag = prev + sub
            up = jnp.concatenate(
                [jax.lax.slice_in_dim(prev, 1, SUB, axis=0),
                 jnp.full((1, TR), NEG_INF16, i16)], axis=0) + gap_p
            up = jnp.where(upmask, ninf, up)
            j = (i - band) + d_sub
            if boundary:
                valid = (j >= 1) & (j <= tl) & dmask
            else:
                valid = (j <= tl) & dmask
            Mv = jnp.where(valid, vmax(diag, up), ninf)
            if boundary:
                col0 = jnp.where(
                    (j == 0) & (i <= band),
                    jnp.full((SUB, TR), GAP, jnp.int32) * i,
                    NEG_INF16).astype(i16)
                Mv = vmax(Mv, col0)
                keep = valid | ((j == 0) & (i <= band))
            else:
                keep = valid
            f = Mv - gapd
            for sh in shifts:
                f = vmax(f, shift_dn(f, sh))
            row = jnp.where(keep, f + gapd, ninf)
            acc = jnp.where(deq & (qlen == i), row, acc)
            return row, acc

        # peeled boundary chunk: static i in 1..CH covers every row that
        # can touch column 0 or j < 1
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

        score = jnp.max(acc.astype(jnp.int32), axis=0, keepdims=True)
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, TR), 0)
        out_ref[0] = jnp.where(s8 == 0, jnp.broadcast_to(score, (8, TR)),
                               NEG_INF)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def run16(n, band, SUB, TR, tpadT, qT, meta):
    NB, LT = tpadT.shape[0], tpadT.shape[1]
    LQ = qT.shape[1]
    f = pl.pallas_call(
        make_kernel16(n, band, SUB, TR),
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


def prep(q, t, qlen, tlen, band, TR, SUB):
    B, n = q.shape
    m = t.shape[1]
    CH = 16
    n_p = -(-n // CH) * CH
    bpad = (-B) % TR
    Bp = B + bpad
    NB = Bp // TR
    qp = np.full((Bp, n_p), 4, np.int32); qp[:B, :n] = q
    LT = -(-max(band + 1 + m, n_p + SUB + CH) // CH) * CH
    tp = np.full((Bp, LT), 4, np.int32); tp[:B, band + 1:band + 1 + m] = t
    qlp = np.zeros(Bp, np.int32); qlp[:B] = qlen
    tlp = np.zeros(Bp, np.int32); tlp[:B] = tlen
    tpadT = jnp.asarray(tp.reshape(NB, TR, LT).transpose(0, 2, 1).copy())
    qT = jnp.asarray(qp.reshape(NB, TR, n_p).transpose(0, 2, 1).copy())
    meta = np.zeros((NB, 8, TR), np.int32)
    meta[:, 0] = qlp.reshape(NB, TR)
    meta[:, 1] = tlp.reshape(NB, TR)
    return n_p, tpadT, qT, jnp.asarray(meta)


def main():
    from kmerax.utils.compile_cache import enable
    enable()
    rng = np.random.default_rng(0)
    B, n, band = 4096, 150, 15
    W = 2 * band + 1
    SUB = 32
    q = rng.integers(0, 5, (B, n)).astype(np.int32)
    t = np.where(rng.random((B, n)) < 0.05,
                 rng.integers(0, 4, (B, n)), q).astype(np.int32)
    qlen = rng.integers(100, n + 1, B).astype(np.int32)
    tlen = qlen.copy()
    args32 = tuple(map(jnp.asarray, (q, t, qlen, tlen)))
    fx = jax.jit(lambda *a: banded_align_scores(*a, band))
    ref = np.asarray(fx(*args32))

    def bench(f, args):
        for _ in range(2):
            np.asarray(f(*args)).ravel()[:1]
        t0 = time.perf_counter(); R = 20
        for _ in range(R):
            r = f(*args)
        np.asarray(r).ravel()[:1]
        return (time.perf_counter() - t0) / R

    dx = bench(fx, args32)
    print(f"XLA                {dx*1e3:7.3f} ms  {B/dx:12,.0f} reads/s")

    for TR in (128, 256):
        n_p, tpadT, qT, meta = prep(q, t, qlen, tlen, band, TR, SUB)
        fn = lambda a, b, c: run16(n_p, band, SUB, TR, a, b, c)
        out = np.asarray(fn(tpadT, qT, meta))[:, 0, :].reshape(-1)[:B]
        out = out.astype(np.int64)
        out = np.where(out > -8192, out, out - NEG_INF16 + NEG_INF)
        out = np.where(np.abs(tlen - qlen) <= band, out, NEG_INF)
        ok = np.array_equal(out, ref.astype(np.int64))
        dt = bench(fn, (tpadT, qT, meta))
        print(f"i16 TR={TR:<4d} parity={ok} {dt*1e3:7.3f} ms "
              f"{B/dt:12,.0f} reads/s   vs XLA {dx/dt:.2f}x")


if __name__ == "__main__":
    main()
