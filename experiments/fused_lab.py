"""Round-3 lab: pin down the correction glue costs + test fused-kernel
primitives.

X1  extract_kmers alone on (B, L)
X2  + canonical_words
X3  + blocks_lanepack (the full XLA probe-prep of window solidity)
X4  the (Q, 2k-1) base-window gather of _eval_entries
X5  full _eval_entries XLA prep WITHOUT the probe (solid_fn = const)
P1  pallas: serial dynamic 2-D window loads bases[ds(r,1), ds(c,128)]
P2  pallas: vectorized canonical+hash kernel (words -> block/lanepack)
"""

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

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import blocks_lanepack
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31)
k = cfg.k
params = _bloom_params(cfg, k)
B, L = 8192, 150
bases = jnp.asarray(_sim_batch(B, L, seed=0, genome_len=1 << 15))
lengths = jnp.full(B, L, dtype=jnp.int32)


def timeit(name, fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:38s} {dt*1e3:9.2f} ms")
    return dt


timeit("X1 extract_kmers (B,L)",
       jax.jit(lambda b: extract_kmers(b, k)), bases)
timeit("X2 extract+canonical",
       jax.jit(lambda b: canonical_words(extract_kmers(b, k)[0], k)), bases)


def x3(b):
    words, valid = extract_kmers(b, k)
    canon, _ = canonical_words(words, k)
    return blocks_lanepack(params, canon)


timeit("X3 extract+canon+blocks_lanepack", jax.jit(x3), bases)

Q = 16384
rng = np.random.default_rng(0)
ent_r = jnp.asarray(rng.integers(0, B, Q).astype(np.int32))
ent_i = jnp.asarray(rng.integers(0, L, Q).astype(np.int32))


def x4(b, er, ei):
    ic = jnp.clip(ei, 0, L - 1)
    offs = ic[:, None] + jnp.arange(-(k - 1), k, dtype=jnp.int32)
    oob = (offs < 0) | (offs >= L)
    wb = b[er[:, None], jnp.clip(offs, 0, L - 1)]
    return jnp.where(oob, 4, wb)


timeit("X4 (Q,2k-1) window gather", jax.jit(x4), bases, ent_r, ent_i)

from kmerax.ops.correct import _eval_entries

last_j = lengths - k
const_sf = lambda cw, v: jnp.ones(cw.shape[:-1], dtype=bool) & v
timeit("X5 _eval_entries, no-op solid_fn",
       jax.jit(lambda b, er, ei: _eval_entries(b, lengths, last_j, er, ei,
                                               k, const_sf)),
       bases, ent_r, ent_i)

# ---- P1: serial dynamic 2-D window loads in pallas ----
E = 2048   # entries per grid step
Lp = 256   # padded row length


def p1_kernel(r_ref, c_ref, bases_hbm, out_ref, bvmem, sem):
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
            out_ref[pl.ds(e, 1), :] = bvmem[pl.ds(r, 1), pl.ds(c, 128)]
        return 0

    jax.lax.fori_loop(0, E // 8, body, 0)


@jax.jit
def p1(r, c, basespad):
    nsteps = r.shape[0] // E
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 8, E // 8), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, E // 8), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((E, 128), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, Lp), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return pl.pallas_call(
        p1_kernel,
        out_shape=jax.ShapeDtypeStruct((r.shape[0], 128), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=B * Lp * 4 + 32 * 1024 * 1024),
    )(r.reshape(-1, 8, E // 8), c.reshape(-1, 8, E // 8), basespad)


basespad = jnp.pad(bases, ((0, 0), (0, Lp - L)), constant_values=4)
cstart = jnp.clip(ent_i - (k - 1), 0, Lp - 129)
try:
    dt = timeit("P1 serial 2-D window loads (Q rows)", p1, ent_r, cstart,
                basespad)
    print(f"   -> {Q/dt/1e6:,.2f} M window-loads/s "
          f"({dt*940e6/Q:.1f} cyc/load at 940MHz)")
    # correctness spot check
    out = np.asarray(p1(ent_r, cstart, basespad))
    ref = np.asarray(basespad)[np.asarray(ent_r)[:, None],
                               np.asarray(cstart)[:, None] + np.arange(128)]
    assert (out == ref).all(), "P1 mismatch"
    print("   P1 correctness OK")
except Exception as ex:
    print(f"P1 FAILED: {type(ex).__name__}: {str(ex)[:300]}")


# ---- P2: vectorized canonical+hash kernel ----
from kmerax.core.hash import HASH_SEED_1, HASH_SEED_2

W = 2
N = Q * 4 * k  # eval-scale probe volume
words_in = jnp.asarray(rng.integers(0, 1 << 31, (N, W)).astype(np.uint32))


def _mix32(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _revpairs(w):
    w = ((w & jnp.uint32(0x33333333)) << 2) | ((w >> 2) & jnp.uint32(0x33333333))
    w = ((w & jnp.uint32(0x0F0F0F0F)) << 4) | ((w >> 4) & jnp.uint32(0x0F0F0F0F))
    w = ((w & jnp.uint32(0x00FF00FF)) << 8) | ((w >> 8) & jnp.uint32(0x00FF00FF))
    return (w << 16) | (w >> 16)


def p2_kernel(w0_ref, w1_ref, blk_ref, lp_ref):
    w0 = w0_ref[:].astype(jnp.uint32)
    w1 = w1_ref[:].astype(jnp.uint32)
    # revcomp for k=31, W=2: complement, revpairs, swap words, shift s=2
    x0 = _revpairs(w1 ^ jnp.uint32(0xFFFFFFFF))
    x1 = _revpairs(w0 ^ jnp.uint32(0xFFFFFFFF))
    s = 64 - 2 * k
    r0 = (x0 >> s) | (x1 << (32 - s))
    r1 = x1 >> s
    # canonical: min((w1,w0),(r1,r0)) big-endian compare
    fwd_le = (w1 < r1) | ((w1 == r1) & (w0 <= r0))
    c0 = jnp.where(fwd_le, w0, r0)
    c1 = jnp.where(fwd_le, w1, r1)
    h1 = _mix32(_mix32(_mix32(jnp.full_like(c0, HASH_SEED_1)) ^ c0) ^ c1)
    h2 = _mix32(_mix32(_mix32(jnp.full_like(c0, HASH_SEED_2)) ^ c0) ^ c1)
    blk_ref[:] = (h1 & jnp.uint32((1 << (params.log2_width - 7)) - 1)
                  ).astype(jnp.int32)
    lp = (h2 & jnp.uint32(127))
    for j in range(1, 4):
        lp = lp | (((h2 >> (7 * j)) & jnp.uint32(127)) << (7 * j))
    lp_ref[:] = lp.astype(jnp.int32)


@jax.jit
def p2(words):
    n = words.shape[0]
    w0 = words[:, 0].reshape(-1, 128)
    w1 = words[:, 1].reshape(-1, 128)
    R = w0.shape[0]
    TR = 512
    return pl.pallas_call(
        p2_kernel,
        out_shape=(jax.ShapeDtypeStruct((R, 128), jnp.int32),
                   jax.ShapeDtypeStruct((R, 128), jnp.int32)),
        grid=(R // TR,),
        in_specs=[pl.BlockSpec((TR, 128), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=(pl.BlockSpec((TR, 128), lambda s: (s, 0),
                                memory_space=pltpu.VMEM),) * 2,
    )(w0, w1)


try:
    dt = timeit("P2 canonical+hash kernel (N probes)", p2, words_in)
    print(f"   -> {N/dt/1e6:,.1f} M kmers/s")
    blk, lp = p2(words_in)
    canon, _ = canonical_words(words_in, k)
    rb, rlp = blocks_lanepack(params, canon)
    assert (np.asarray(blk) == np.asarray(rb)).all(), "block mismatch"
    assert (np.asarray(lp) == np.asarray(rlp)).all(), "lanepack mismatch"
    print("   P2 correctness OK")
except Exception as ex:
    print(f"P2 FAILED: {type(ex).__name__}: {str(ex)[:300]}")
