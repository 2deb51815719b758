"""Round-4 lab 2: cost breakdown of the transposed banded-align kernel.

Variants drop components (results intentionally wrong except 'full') to see
where the cycles go: the shift tree, the windowed loads, the row masks, the
accumulate. Timing only.
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

from kmerax.ops.align import GAP, MATCH, MISMATCH, NEG_INF

_SEL_MIN = -(1 << 31) + 1


def make_kernel(n, band, SUB, TR, use_tree, use_loads, use_masks, use_acc):
    W = 2 * band + 1
    shifts = []
    s = 1
    while s < W:
        shifts.append(s)
        s *= 2

    def kernel(tpadT_ref, qT_ref, meta_ref, out_ref):
        d_sub = jax.lax.broadcasted_iota(jnp.int32, (SUB, TR), 0)
        ninf = jnp.full((SUB, TR), NEG_INF, jnp.int32)
        gapd = GAP * d_sub
        dmask = d_sub < W
        upmask = d_sub >= W - 1
        shmasks = [d_sub < sh for sh in shifts]
        qlen = meta_ref[0, 0:1, :]
        tl = meta_ref[0, 1:2, :]
        row0 = jnp.where((d_sub - band >= 0) & (d_sub - band <= tl) & dmask,
                         GAP * (d_sub - band), NEG_INF)
        dfin = jnp.clip(tl - qlen + band, 0, W - 1)
        deq = d_sub == dfin
        acc0 = jnp.where(deq & (qlen == 0), row0, _SEL_MIN)

        fixed_tslc = tpadT_ref[0, 0:SUB, :]
        fixed_qi = qT_ref[0, 0:1, :]

        def body(c, carry):
            prev, acc = carry
            base = pl.multiple_of(c * 8, 8)
            if use_loads:
                win = tpadT_ref[0, pl.ds(base, SUB + 8), :]
                qwin = qT_ref[0, pl.ds(base, 8), :]
            for u in range(8):
                i = base + u + 1
                if use_loads:
                    tslc = jax.lax.slice_in_dim(win, u + 1, u + 1 + SUB,
                                                axis=0)
                    qi = jax.lax.slice_in_dim(qwin, u, u + 1, axis=0)
                else:
                    tslc, qi = fixed_tslc, fixed_qi
                sub = jnp.where((tslc == qi) & (qi < 4), MATCH, MISMATCH)
                diag = prev + sub
                up = jnp.where(upmask, ninf,
                               pltpu.roll(prev, shift=SUB - 1, axis=0)) + GAP
                j = (i - band) + d_sub
                if use_masks:
                    valid = (j >= 1) & (j <= tl) & dmask
                    Mv = jnp.where(valid, jnp.maximum(diag, up), NEG_INF)
                    col0 = jnp.where((j == 0) & (i <= band), GAP * i,
                                     NEG_INF)
                    f = jnp.maximum(Mv, col0) - gapd
                else:
                    f = jnp.maximum(diag, up) - gapd
                if use_tree:
                    for sh, sm in zip(shifts, shmasks):
                        f = jnp.maximum(
                            f, jnp.where(sm, ninf,
                                         pltpu.roll(f, shift=sh, axis=0)))
                row = f + gapd
                if use_masks:
                    row = jnp.where(valid | ((j == 0) & (i <= band)), row,
                                    NEG_INF)
                if use_acc:
                    acc = jnp.where(deq & (qlen == i), row, acc)
                prev = row
            return prev, acc

        prev, acc = jax.lax.fori_loop(0, n // 8, body, (row0, acc0))
        score = jnp.max(acc, axis=0, keepdims=True)
        s8 = jax.lax.broadcasted_iota(jnp.int32, (8, TR), 0)
        out_ref[0] = jnp.where(s8 == 0, jnp.broadcast_to(score, (8, TR)),
                               NEG_INF)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def run(n, band, SUB, TR, use_tree, use_loads, use_masks, use_acc,
        tpadT, qT, meta):
    NB, LT = tpadT.shape[0], tpadT.shape[1]
    LQ = qT.shape[1]
    f = pl.pallas_call(
        make_kernel(n, band, SUB, TR, use_tree, use_loads, use_masks,
                    use_acc),
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


def main():
    from kmerax.utils.compile_cache import enable
    enable()
    rng = np.random.default_rng(0)
    B, n, band = 4096, 152, 15
    TR = 128
    W = 2 * band + 1
    SUB = 32
    NB = B // TR
    LT = -(-max(band + 1 + n, n + SUB + 8) // 8) * 8
    tpadT = jnp.asarray(rng.integers(0, 4, (NB, LT, TR)).astype(np.int32))
    qT = jnp.asarray(rng.integers(0, 4, (NB, n, TR)).astype(np.int32))
    meta = np.zeros((NB, 8, TR), np.int32)
    meta[:, 0] = 150
    meta[:, 1] = 150
    meta = jnp.asarray(meta)

    def bench(f):
        for _ in range(2):
            np.asarray(f())[:1]
        t0 = time.perf_counter(); R = 20
        for _ in range(R):
            r = f()
        np.asarray(r)[:1]
        return (time.perf_counter() - t0) / R

    for name, tr, ld, mk, ac in [
            ("full", True, True, True, True),
            ("-tree", False, True, True, True),
            ("-loads", True, False, True, True),
            ("-masks", True, True, False, True),
            ("-acc", True, True, True, False),
            ("bare(add only)", False, False, False, False)]:
        fn = lambda: run(n, band, SUB, TR, tr, ld, mk, ac, tpadT, qT, meta)
        dt = bench(fn)
        print(f"{name:16s} {dt*1e3:7.3f} ms   {B/dt:12,.0f} reads/s")


if __name__ == "__main__":
    main()
