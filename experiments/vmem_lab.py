"""Microbench: VMEM-resident table RMW/query kernels (counting-insert floor).

scatter_lab: XLA row scatter ~54M rows/s (18 cyc), XLA 4-probe gather 25M/s.
dma_lab: per-element HBM DMA tops out ~22M rows/s (issue overhead) — dead.
Question here: with the table tile RESIDENT in VMEM, how many cycles/element
does Mosaic need for
  R1  serial one-hot row RMW  (insert floor)
  Q1  serial row read + 4-lane min, packed 128/row output (query floor)

Table tile (4096, 128) int32 = 2MB in VMEM; n = 2M elements. SMEM windows
are (1, 8, C/8)-shaped (large 2-D SMEM blocks get lane-padded past the 1MB
SMEM budget) and the 4 probe lanes are packed into one int32 (4x7 bits).
"""

import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.utils.compile_cache import enable
enable()

TROWS = 4096            # 2MB tile
N = 1 << 21
C = 2048
SUB = C // 8
NSTEPS = N // C


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, args, name, reps=5):
    t0 = time.perf_counter(); out = fn(*args); _sync(out)
    comp = time.perf_counter() - t0
    out = fn(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    cyc = dt * 940e6 / N
    print(f"{name:30s} {dt*1e3:9.3f} ms  ({N/dt/1e6:7.1f} M elem/s, "
          f"{cyc:5.1f} cyc/elem)  compile {comp:5.1f}s", flush=True)
    return dt


def _smem_spec():
    return pl.BlockSpec((1, 8, SUB), lambda c: (c, 0, 0),
                        memory_space=pltpu.SMEM)


def _el(ref, i):
    return ref[0, i // SUB, jax.lax.rem(i, SUB)]


def rmw_kernel(blocks_ref, lp_ref, tbl_in, tbl_ref, acc_ref):
    del tbl_in
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def body(i, _):
        b = _el(blocks_ref, i)
        v = _el(lp_ref, i)
        oh = (((v & 127) == pos).astype(jnp.int32)
              + (((v >> 7) & 127) == pos).astype(jnp.int32)
              + (((v >> 14) & 127) == pos).astype(jnp.int32)
              + (((v >> 21) & 127) == pos).astype(jnp.int32))
        tbl_ref[pl.ds(b, 1), :] = tbl_ref[pl.ds(b, 1), :] + oh
        return 0

    jax.lax.fori_loop(0, C, body, 0)


def make_rmw():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NSTEPS,),
        in_specs=[
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec((TROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        rmw_kernel,
        out_shape=[jax.ShapeDtypeStruct((TROWS, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=N * 512, bytes_accessed=N * 1024, transcendentals=0),
    )


def query_kernel(blocks_ref, lp_ref, tbl_ref, out_ref):
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    big = jnp.int32(1 << 30)

    def body(i, acc):
        b = _el(blocks_ref, i)
        v = _el(lp_ref, i)
        row = tbl_ref[pl.ds(b, 1), :]            # (1,128)
        m = jnp.minimum(
            jnp.minimum(
                jnp.where((v & 127) == pos, row, big),
                jnp.where(((v >> 7) & 127) == pos, row, big)),
            jnp.minimum(
                jnp.where(((v >> 14) & 127) == pos, row, big),
                jnp.where(((v >> 21) & 127) == pos, row, big)))
        cnt = jnp.min(m)
        acc = jnp.where(pos == (i & 127), cnt, acc)   # pack result lane

        @pl.when((i & 127) == 127)                    # flush every 128
        def _():
            out_ref[pl.ds(i >> 7, 1), :] = acc
        return acc

    jax.lax.fori_loop(0, C, body, jnp.zeros((1, 128), jnp.int32))


def make_query():
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NSTEPS,),
        in_specs=[
            _smem_spec(),
            _smem_spec(),
            pl.BlockSpec((TROWS, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C // 128, 128), lambda c: (c, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        query_kernel,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=N * 512, bytes_accessed=N * 1024, transcendentals=0),
    )


def main():
    rng = np.random.default_rng(0)
    blocks_np = rng.integers(0, TROWS, N).astype(np.int32)
    lanes_np = rng.integers(0, 128, (N, 4)).astype(np.int32)
    lp_np = (lanes_np[:, 0] | (lanes_np[:, 1] << 7)
             | (lanes_np[:, 2] << 14) | (lanes_np[:, 3] << 21))
    blocks = jnp.asarray(blocks_np.reshape(NSTEPS, 8, SUB))
    lp = jnp.asarray(lp_np.astype(np.int32).reshape(NSTEPS, 8, SUB))
    tbl = jnp.zeros((TROWS, 128), jnp.int32)

    try:
        f = make_rmw()
        timeit(jax.jit(lambda b, l, t: f(b, l, t)[1]),
               (blocks, lp, tbl), "R1 serial rmw")
    except Exception as e:
        print(f"R1 failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    try:
        q = make_query()
        timeit(jax.jit(lambda b, l, t: q(b, l, t)), (blocks, lp, tbl),
               "Q1 serial query")
        got_q = np.asarray(jax.jit(lambda b, l, t: q(b, l, t))(
            blocks, lp, tbl + 7)).reshape(-1)
        print("Q1 correctness:", "OK" if (got_q == 7).all() else "MISMATCH",
              flush=True)
    except Exception as e:
        print(f"Q1 failed: {type(e).__name__}: {str(e)[:300]}", flush=True)

    f = make_rmw()
    tbl2 = jax.jit(lambda b, l, t: f(b, l, t)[0])(blocks, lp, tbl)
    got = np.asarray(tbl2)
    want = np.zeros((TROWS, 128), np.int64)
    for j in range(4):
        np.add.at(want, (blocks_np, lanes_np[:, j]), 1)
    ok = (got == want).all()
    print("R1 correctness:", "OK" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
