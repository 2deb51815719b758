"""Decompose pallas insert cost: XLA preprocessing vs stage A vs stage B."""
import sys, time, functools
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from kmerax.utils.compile_cache import enable
enable()
from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import make_table, blocks_lanepack
from kmerax.spectrum import pallas_bloom as pb
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31, bloom_log2_width=24)
k = cfg.k
params = _bloom_params(cfg, k)
n_reads, read_len = 16384, 150
bases = jnp.asarray(_sim_batch(n_reads, read_len, seed=0))
nk = n_reads * (read_len - k + 1)

def timeit(fn, args, name, reps=5):
    t0 = time.perf_counter(); out = fn(*args); _sync(out); comp = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.2f} ms ({nk/dt/1e6:7.1f} M/s) compile {comp:4.1f}s",
          flush=True)

# P0: XLA preprocessing only
@jax.jit
def prep(bases):
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    b, lp = blocks_lanepack(params, canon)
    return b.sum() + lp.sum() + valid.sum()
timeit(prep, (bases,), "P0 xla preprocessing")

# variant kernels: stage A only / stage B only
def make_variant(stage):
    d = params.num_hashes
    CHUNK, SUB = pb.CHUNK, pb.SUB
    def kern(blocks_ref, lp_ref, tbl_hbm, out_hbm, tbl_ref, oh_ref, sem):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            cp = pltpu.make_async_copy(tbl_hbm, tbl_ref, sem); cp.start(); cp.wait()
        nsub = CHUNK // 128
        pos_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        eye = jnp.eye(128, dtype=jnp.bfloat16)
        if stage in ("A", "AB"):
            for sub in range(nsub):
                row = lp_ref[sub:sub+1, :]
                lpb = jnp.broadcast_to(row, (128, 128))
                oht = jnp.zeros((128, 128), jnp.int32)
                for j in range(d):
                    oht = oht + ((lpb >> (7*j)) & 127 == pos_s).astype(jnp.int32)
                vmask = (lpb >> pb.VALID_BIT) & 1
                oht = (oht * vmask).astype(jnp.bfloat16)
                oh = jax.lax.dot_general(oht, eye, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
                oh_ref[sub*128:(sub+1)*128, :] = oh.astype(jnp.int32)
        if stage in ("B", "AB"):
            def body(g, _):
                base = g * 8
                for u in range(8):
                    b = blocks_ref[0, u, g]
                    tbl_ref[pl.ds(b,1),:] = tbl_ref[pl.ds(b,1),:] + oh_ref[pl.ds(base+u,1),:]
                return 0
            jax.lax.fori_loop(0, CHUNK // 8, body, 0)
        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            cp = pltpu.make_async_copy(tbl_ref, out_hbm, sem); cp.start(); cp.wait()
    return kern

def run_variant(stage):
    CHUNK, SUB = pb.CHUNK, pb.SUB
    nrows = (1 << params.log2_width) // 128
    @jax.jit
    def step(table, bases):
        words, valid = extract_kmers(bases, k)
        canon, _ = canonical_words(words, k)
        block, lp = blocks_lanepack(params, canon)
        fb = jnp.where(valid, block, 0).reshape(-1)
        fl = jnp.where(valid, lp | (1 << pb.VALID_BIT), 0).reshape(-1)
        n = fb.shape[0]
        pad = (-n) % CHUNK
        if pad:
            fb = jnp.concatenate([fb, jnp.zeros(pad, jnp.int32)])
            fl = jnp.concatenate([fl, jnp.zeros(pad, jnp.int32)])
        nsteps = fb.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 8, SUB), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((CHUNK//128, 128), lambda c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.int32),
                            pltpu.VMEM((CHUNK, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())])
        f = pl.pallas_call(
            make_variant(stage),
            out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(nrows*128*4 + 16*1024*1024),
                has_side_effects=True),
            cost_estimate=pl.CostEstimate(flops=n*600, bytes_accessed=n*1100,
                                          transcendentals=0))
        return f(fb.reshape(nsteps, SUB, 8).swapaxes(1, 2),
                 fl.reshape(-1, 128), table.reshape(nrows, 128))
    timeit(step, (make_table(params), bases), f"stage {stage}")

run_variant("A")
run_variant("B")
run_variant("AB")
