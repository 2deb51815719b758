"""Round-3 lab 2: separate axon dispatch latency from device time, and
find a working in-kernel dynamic window load.

D1   trivial jit            -> dispatch floor
D2   8 back-to-back raw-probe calls, one sync -> do dispatches pipeline?
W*   window-stage composites (one dispatch each; real = t - D1)
E*   eval-stage composites
P1b  dynamic window load variants in pallas
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
from kmerax.spectrum.bloom import blocks_lanepack, insert, make_table, \
    make_solid_fn
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31)
k = cfg.k
params = _bloom_params(cfg, k)
B, L = 8192, 150
bases = jnp.asarray(_sim_batch(B, L, seed=0, genome_len=1 << 15))
lengths = jnp.full(B, L, dtype=jnp.int32)
last_j = lengths - k

table = make_table(params)
bld = jax.jit(lambda t, b: insert(
    params, t, *canonical_words(extract_kmers(b, k)[0], k)[0:1],
    extract_kmers(b, k)[1]))
# simpler: build via two explicit steps
@jax.jit
def bld(t, b):
    w, v = extract_kmers(b, k)
    c, _ = canonical_words(w, k)
    return insert(params, t, c, v)
table = bld(table, bases)
_sync(table)
sf = make_solid_fn(params, table, 3)


def timeit(name, fn, *args, reps=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return dt


d1 = timeit("D1 trivial jit (x+1 on (8,128))",
            jax.jit(lambda x: x + 1), jnp.zeros((8, 128), jnp.int32))

# D2: do dispatches pipeline? run the same probe jit 8x, sync once
rng = np.random.default_rng(0)
N = 2031616
w = 2
pw = jnp.asarray(rng.integers(0, 1 << 30, (N, w)).astype(np.uint32))
pv = jnp.ones(N, dtype=bool)
probe = jax.jit(lambda cw, v: sf(cw, v))
out = probe(pw, pv); _sync(out)
t0 = time.perf_counter()
outs = [probe(pw, pv) for _ in range(8)]
_sync(outs[-1])
d2 = (time.perf_counter() - t0) / 8
print(f"{'D2 raw probes x8 pipelined, per call':44s} {d2*1e3:9.2f} ms"
      f"  -> {N/d2/1e6:,.0f} M probes/s")

# W: window-stage composites
timeit("W1 extract", jax.jit(lambda b: extract_kmers(b, k)), bases)


def w2(b):
    words, valid = extract_kmers(b, k)
    canon, _ = canonical_words(words, k)
    return blocks_lanepack(params, canon)


timeit("W2 extract+canon+lanepack", jax.jit(w2), bases)


def w3(b):
    words, valid = extract_kmers(b, k)
    canon, _ = canonical_words(words, k)
    return sf(canon, valid)


timeit("W3 window solidity (extract+canon+probe)", jax.jit(w3), bases)

# E: eval composites
Q = 16384
ent_r = jnp.asarray(rng.integers(0, B, Q).astype(np.int32))
ent_i = jnp.asarray(rng.integers(0, L, Q).astype(np.int32))

from kmerax.ops.correct import _eval_entries

timeit("E2 _eval_entries full",
       jax.jit(lambda b, er, ei: _eval_entries(b, lengths, last_j, er, ei,
                                               k, sf)),
       bases, ent_r, ent_i)
const_sf = lambda cw, v: jnp.ones(cw.shape[:-1], dtype=bool) & v
timeit("E3 _eval_entries const solid_fn",
       jax.jit(lambda b, er, ei: _eval_entries(b, lengths, last_j, er, ei,
                                               k, const_sf)),
       bases, ent_r, ent_i)


def e1(b, er, ei):
    ic = jnp.clip(ei, 0, L - 1)
    offs = ic[:, None] + jnp.arange(-(k - 1), k, dtype=jnp.int32)
    oob = (offs < 0) | (offs >= L)
    wb = b[er[:, None], jnp.clip(offs, 0, L - 1)]
    return jnp.where(oob, 4, wb)


timeit("E1 (Q,2k-1) window gather", jax.jit(e1), bases, ent_r, ent_i)
timeit("E1b (Q,) row gather bases[ent_r]",
       jax.jit(lambda b, er: b[er]), bases, ent_r)

# ---- P1b: dynamic window load variants ----
E = 2048
Lp = 256
basespad = jnp.pad(bases, ((0, 0), (0, Lp - L)), constant_values=4)
cstart = jnp.clip(ent_i - (k - 1), 0, Lp - 129)


def mk_p1(loader):
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

    return run


def check(name, run):
    try:
        dt = timeit(name, run, ent_r, cstart, basespad, reps=4, warmup=1)
        out = np.asarray(run(ent_r, cstart, basespad))
        ref = np.asarray(basespad)[
            np.asarray(ent_r)[:, None],
            np.asarray(cstart)[:, None] + np.arange(128)]
        ok = (out == ref).all()
        print(f"   -> {(dt-d1)*940e6/Q:.1f} cyc/load, correct={ok}")
    except Exception as ex:
        print(f"{name} FAILED: {type(ex).__name__}: {str(ex)[:200]}")


# v1: dynamic 2-D slice (retry)
check("P1v1 bvmem[ds(r,1), ds(c,128)]",
      mk_p1(lambda bv, o, e, r, c:
            o.__setitem__((pl.ds(e, 1), slice(None)),
                          bv[pl.ds(r, 1), pl.ds(c, 128)])))

# v2: full-row load + in-register dynamic lane slice
def v2(bv, o, e, r, c):
    row = bv[pl.ds(r, 1), :]                       # (1, 256)
    o[pl.ds(e, 1), :] = jax.lax.dynamic_slice(row, (0, c), (1, 128))
check("P1v2 row load + lax.dynamic_slice", mk_p1(v2))

# v3: full-row load + roll by traced amount
def v3(bv, o, e, r, c):
    row = bv[pl.ds(r, 1), :]
    rolled = pltpu.roll(row, shift=-c, axis=1)
    o[pl.ds(e, 1), :] = rolled[:, :128]
check("P1v3 row load + pltpu.roll(-c)", mk_p1(v3))
