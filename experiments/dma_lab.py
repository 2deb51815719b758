"""Microbench: Pallas DMA-pipelined random row access over an HBM table.

Questions (sizing the redesign of insert/query around manual DMA):
  G1  pipelined random row GATHER (512B rows), PIPE in {8, 16}
  G2  row dtype int8 (128B DMA) gather — DMA-size sensitivity
  W1  pipelined random row RMW (read+add+write), conflict-oblivious timing

Table 64MB (2^17 rows x 128 lanes int32), n = 2M random rows, same scale as
the counting batch (16384 PE150 reads -> 1.97M k-mers). XLA baselines from
experiments/scatter_lab.py: row scatter 54M rows/s, 4-probe gather 25M/s.

Blocks are fed as a (nsteps, 2C) overlapped-window int32 array in SMEM so a
grid step can start reads for the first PIPE elements of the next chunk
(pipeline never drains at chunk boundaries).
"""

import sys, time, functools
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.utils.compile_cache import enable
enable()

NROWS = 1 << 17
N = 1 << 21
C = 1024            # elements per grid step
NSTEPS = N // C


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def timeit(fn, args, name, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    comp = time.perf_counter() - t0
    out = fn(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:9.3f} ms  ({N/dt/1e6:7.1f} M rows/s)"
          f"   compile {comp:5.1f}s", flush=True)
    return dt


def windows(blocks_np):
    """(NSTEPS, 2C) overlapped windows of the block stream."""
    pad = np.zeros(2 * C, np.int32)
    b = np.concatenate([blocks_np[:N], pad])
    return np.stack([b[c * C:c * C + 2 * C] for c in range(NSTEPS)])


def gather_kernel(pipe, blocks_ref, tbl_ref, out_ref, rows, sem):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        for s in range(pipe):
            pltpu.make_async_copy(
                tbl_ref.at[blocks_ref[0, s]], rows.at[s], sem.at[s]).start()

    def body(i, acc):
        slot = jax.lax.rem(i, pipe)
        pltpu.make_async_copy(
            tbl_ref.at[blocks_ref[0, i]], rows.at[slot], sem.at[slot]).wait()
        acc = acc + rows[slot, :].astype(jnp.int32)
        nxt = i + pipe

        @pl.when((nxt < C) | (c + 1 < NSTEPS))
        def _():
            pltpu.make_async_copy(
                tbl_ref.at[blocks_ref[0, nxt]], rows.at[slot],
                sem.at[slot]).start()
        return acc

    acc = jax.lax.fori_loop(0, C, body, jnp.zeros((128,), jnp.int32))
    out_ref[0, :] = out_ref[0, :] + acc


def make_gather(pipe, dtype=jnp.int32):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((1, 2 * C), lambda c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pipe, 128), dtype),
            pltpu.SemaphoreType.DMA((pipe,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(gather_kernel, pipe),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=N * 128, bytes_accessed=N * 512, transcendentals=0),
    )


def rmw_kernel(pipe, blocks_ref, tbl_in, tbl_ref, out_ref,
               rows, wbuf, rsem, wsem):
    c = pl.program_id(0)
    del tbl_in  # aliased with tbl_ref

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        for s in range(pipe):
            pltpu.make_async_copy(
                tbl_ref.at[blocks_ref[0, s]], rows.at[s], rsem.at[s]).start()

    def body(i, _):
        slot = jax.lax.rem(i, pipe)
        g = c * C + i

        @pl.when(g >= pipe)      # drain write from g-pipe (frees wbuf[slot])
        def _():
            pltpu.make_async_copy(
                wbuf.at[slot], tbl_ref.at[blocks_ref[0, i]],
                wsem.at[slot]).wait()
        pltpu.make_async_copy(
            tbl_ref.at[blocks_ref[0, i]], rows.at[slot], rsem.at[slot]).wait()
        wbuf[slot, :] = rows[slot, :] + 1
        pltpu.make_async_copy(
            wbuf.at[slot], tbl_ref.at[blocks_ref[0, i]], wsem.at[slot]).start()
        nxt = i + pipe

        @pl.when((nxt < C) | (c + 1 < NSTEPS))
        def _():
            pltpu.make_async_copy(
                tbl_ref.at[blocks_ref[0, nxt]], rows.at[slot],
                rsem.at[slot]).start()
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    @pl.when(c == NSTEPS - 1)    # drain the last PIPE writes
    def _():
        for s in range(pipe):
            pltpu.make_async_copy(
                wbuf.at[s], tbl_ref.at[blocks_ref[0, 0]], wsem.at[s]).wait()


def make_rmw(pipe):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((1, 2 * C), lambda c: (c, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((pipe, 128), jnp.int32),
            pltpu.VMEM((pipe, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((pipe,)),
            pltpu.SemaphoreType.DMA((pipe,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(rmw_kernel, pipe),
        out_shape=[jax.ShapeDtypeStruct((NROWS, 128), jnp.int32),
                   jax.ShapeDtypeStruct((1, 128), jnp.int32)],
        grid_spec=grid_spec,
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=N * 128, bytes_accessed=N * 1024, transcendentals=0),
    )


def main():
    rng = np.random.default_rng(0)
    blocks_np = rng.integers(0, NROWS, N).astype(np.int32)
    blocks2d = jnp.asarray(windows(blocks_np))
    tbl = jnp.zeros((NROWS, 128), jnp.int32)
    tbl8 = jnp.zeros((NROWS, 128), jnp.int8)

    for pipe in (8, 16):
        g = make_gather(pipe)
        timeit(jax.jit(g), (blocks2d, tbl), f"G1 gather pipe={pipe}")

    try:
        g8 = make_gather(16, jnp.int8)
        timeit(jax.jit(g8), (blocks2d, tbl8), "G2 gather int8 rows pipe=16")
    except Exception as e:
        print(f"G2 failed: {type(e).__name__}: {str(e)[:200]}", flush=True)

    for pipe in (8, 16):
        try:
            r = make_rmw(pipe)
            f = jax.jit(lambda b, t: r(b, t)[1])
            timeit(f, (blocks2d, tbl), f"W1 rmw pipe={pipe}")
        except Exception as e:
            print(f"W1 pipe={pipe} failed: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
