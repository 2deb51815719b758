"""Bisect the 10x lab-kernel regression: .at[:nrows] DMA slice vs +0 add."""
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

CHUNK, SUB = pb.CHUNK, pb.SUB
n_reads, read_len = 16384, 150
k = 31
nk = n_reads * (read_len - k + 1)
bases = jnp.asarray(_sim_batch(n_reads, read_len, seed=0))
cfg = KmeraxConfig(k=31, bloom_log2_width=24)
params = _bloom_params(cfg, k)
nrows = (1 << 24) // 128

def make_kernel(d, slice_dma, add_zero):
    def kern(blocks_ref, lp_ref, tbl_hbm, out_hbm, tbl_ref, oh_ref, sem):
        c = pl.program_id(0)
        @pl.when(c == 0)
        def _():
            dst = tbl_ref.at[:nrows] if slice_dma else tbl_ref
            cp = pltpu.make_async_copy(tbl_hbm, dst, sem); cp.start(); cp.wait()
        pos_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        eye = jnp.eye(128, dtype=jnp.bfloat16)
        for sub in range(CHUNK // 128):
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
        def body(g, _):
            for v in range(2):
                col = 2*g + v
                for u in range(8):
                    b = blocks_ref[0, u, col]
                    if add_zero:
                        b = b + 0 * nrows
                    tbl_ref[pl.ds(b,1),:] = (tbl_ref[pl.ds(b,1),:]
                                             + oh_ref[pl.ds(u*SUB+col,1),:])
            return 0
        jax.lax.fori_loop(0, SUB // 2, body, 0)
        @pl.when(c == pl.num_programs(0) - 1)
        def _():
            src = tbl_ref.at[:nrows] if slice_dma else tbl_ref
            cp = pltpu.make_async_copy(src, out_hbm, sem); cp.start(); cp.wait()
    return kern

def run(name, slice_dma, add_zero):
    @jax.jit
    def step(table, bases):
        words, valid = extract_kmers(bases, k)
        canon, _ = canonical_words(words, k)
        block, lp = blocks_lanepack(params, canon)
        fb = jnp.where(valid, block, 0).reshape(-1)
        fl = jnp.where(valid, lp | (1 << pb.VALID_BIT), 0).reshape(-1)
        nsteps = fb.shape[0] // CHUNK
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(nsteps,),
            in_specs=[
                pl.BlockSpec((1, 8, SUB), lambda c: (c, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((CHUNK//128, 128), lambda c: (c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.int32),
                            pltpu.VMEM((CHUNK, 128), jnp.int32),
                            pltpu.SemaphoreType.DMA(())])
        f = pl.pallas_call(
            make_kernel(params.num_hashes, slice_dma, add_zero),
            out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
            grid_spec=grid_spec,
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(nrows*128*4 + 16*1024*1024),
                has_side_effects=True),
            cost_estimate=pl.CostEstimate(flops=nk*600, bytes_accessed=nk*1100,
                                          transcendentals=0))
        return f(fb.reshape(nsteps, 8, SUB), fl.reshape(-1, 128),
                 table.reshape(nrows, 128))
    t0 = time.perf_counter(); out = step(make_table(params), bases); _sync(out)
    comp = time.perf_counter() - t0
    t = make_table(params)
    t0 = time.perf_counter()
    for _ in range(5):
        t = step(t, bases)
    _sync(t)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name:24s} {dt*1e3:8.2f} ms ({nk/dt/1e6:7.1f} M/s) compile {comp:.0f}s",
          flush=True)

run("baseline (prod-exact)", False, False)
run("slice_dma", True, False)
run("add_zero", False, True)
