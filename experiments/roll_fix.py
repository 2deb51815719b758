"""Pin down pltpu.roll semantics with a traced shift (P1v3 follow-up)."""

import sys
import time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.utils.compile_cache import enable
enable()

B, Lp, E, Q = 8192, 256, 512, 2048
rng = np.random.default_rng(0)
basespad = jnp.asarray(rng.integers(0, 5, (B, Lp)).astype(np.int32))
ent_r = jnp.asarray(rng.integers(0, B, Q).astype(np.int32))
cstart = jnp.asarray(rng.integers(0, Lp - 1, Q).astype(np.int32))


def mk(loader, name):
    def kern(r_ref, c_ref, bases_hbm, out_ref, bvmem, sem):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            cp = pltpu.make_async_copy(bases_hbm, bvmem, sem)
            cp.start()
            cp.wait()

        def body(g, _):
            for u in range(8):
                e = g * 8 + u
                r = r_ref[0, u, g]
                c = c_ref[0, u, g]
                loader(bvmem, out_ref, e, r, c)
            return 0

        jax.lax.fori_loop(0, E // 8, body, 0)

    @jax.jit
    def run(r, c, bp):
        nsteps = r.shape[0] // E
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 8, E // 8), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, E // 8), lambda s: (s, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((E, 128), lambda s: (s, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, Lp), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((r.shape[0], 128), jnp.int32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=B * Lp * 4 + 32 * 1024 * 1024),
        )(r.reshape(-1, 8, E // 8), c.reshape(-1, 8, E // 8), bp)

    try:
        out = np.asarray(run(ent_r, cstart, basespad))
        ref_rows = np.asarray(basespad)[np.asarray(ent_r)]
        c = np.asarray(cstart)
        # reference: circular window starting at c
        idx = (c[:, None] + np.arange(128)[None, :]) % Lp
        ref = ref_rows[np.arange(Q)[:, None], idx]
        ok = (out == ref).all()
        print(f"{name}: correct={ok}")
        if not ok:
            bad = np.nonzero(~(out == ref).all(axis=1))[0][:3]
            for e in bad:
                print("  e", e, "c", c[e], "got", out[e, :6],
                      "want", ref[e, :6])
        return ok
    except Exception as ex:
        print(f"{name} FAILED: {type(ex).__name__}: {str(ex)[:200]}")
        return False


def v3a(bv, o, e, r, c):   # roll by positive (Lp - c)
    row = bv[pl.ds(r, 1), :]
    rolled = pltpu.roll(row, shift=Lp - c, axis=1)
    o[pl.ds(e, 1), :] = rolled[:, :128]


def v3b(bv, o, e, r, c):   # roll by -c (original failing variant)
    row = bv[pl.ds(r, 1), :]
    rolled = pltpu.roll(row, shift=-c, axis=1)
    o[pl.ds(e, 1), :] = rolled[:, :128]


def v3c(bv, o, e, r, c):   # roll by +c (maybe roll is "left by shift")
    row = bv[pl.ds(r, 1), :]
    rolled = pltpu.roll(row, shift=c, axis=1)
    o[pl.ds(e, 1), :] = rolled[:, :128]


v3a_ok = mk(v3a, "v3a roll(Lp-c)")
v3b_ok = mk(v3b, "v3b roll(-c)")
v3c_ok = mk(v3c, "v3c roll(+c)")
