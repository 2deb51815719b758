"""Measure counting-insert design space on the real chip (north-star metric).

Variants timed on identical inputs (16384 PE150 reads, k=31 -> ~1.97M k-mers):
  V0 current insert (one-hot row scatter)              -- baseline
  V1 lax.sort of block ids alone                       -- sort cost floor
  V2 lax.sort of (block, lane0..3)                     -- sort cost w/ payload
  V3 flat scalar scatter, sorted, indices_are_sorted   -- scalar adds
  V3u flat scalar scatter unsorted                     -- scalar adds unsorted
  V4 sorted one-hot row scatter, indices_are_sorted    -- sorted rows
  V5 sort + dedup(segment-sum one-hot) + unique scatter
  V6 query gather throughput (4 probes/kmer + min)     -- correction floor
"""

import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.utils.compile_cache import enable
enable()

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.core.minimizer import minimizers
from kmerax.core.hash import bloom_blocks_lanes
from kmerax.spectrum.bloom import BloomParams, insert, make_table
from kmerax.bench.runners import _sim_batch, _sync

K = 31
P = BloomParams(k=K, log2_width=24)
NROWS = P.width // 128


def timeit(fn, args, warmup=2, reps=5, name=""):
    t_c0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t_c0
    for _ in range(warmup - 1):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:9.3f} ms   (compile {compile_s:6.1f}s)",
          flush=True)
    return dt


def main():
    bases = jnp.asarray(_sim_batch(16384, 150, seed=0))
    n_km = 16384 * (150 - K + 1)

    @jax.jit
    def prep(bases):
        words, valid = extract_kmers(bases, K)
        canon, _ = canonical_words(words, K)
        buckets = (minimizers(canon, K, P.minimizer_m)
                   % jnp.uint32(1 << P.log2_buckets))
        block, lanes = bloom_blocks_lanes(
            canon, P.log2_width, P.num_hashes, buckets, P.log2_buckets)
        block = jnp.where(valid, block, NROWS).reshape(-1)
        return block, lanes.reshape(-1, 4)

    block, lanes = jax.device_get(prep(bases))
    block = jnp.asarray(block); lanes = jnp.asarray(lanes)
    n = block.shape[0]
    print(f"n kmers (incl invalid) = {n}", flush=True)

    @jax.jit
    def v0(b):
        words, valid = extract_kmers(b, K)
        canon, _ = canonical_words(words, K)
        return insert(P, make_table(P), canon, valid)
    dt0 = timeit(v0, (bases,), name="V0 current insert")
    print(f"   -> {n_km/dt0/1e6:8.1f} M kmers/s", flush=True)

    dt1 = timeit(jax.jit(lambda b: jax.lax.sort([b], dimension=0)[0]),
                 (block,), name="V1 sort block only")

    @jax.jit
    def v2(block, lanes):
        ops = [block] + [lanes[:, j] for j in range(4)]
        return jax.lax.sort(ops, dimension=0, num_keys=1)
    dt2 = timeit(v2, (block, lanes), name="V2 sort block+lanes")

    @jax.jit
    def v3(block, lanes):
        flat = (block[:, None] * 128 + lanes).reshape(-1)
        flat = jax.lax.sort([flat], dimension=0)[0]
        t = jnp.zeros(P.width + 128, jnp.int32)
        return t.at[flat].add(1, mode="drop", indices_are_sorted=True)
    dt3 = timeit(v3, (block, lanes), name="V3 flat sorted scalar")
    print(f"   -> {n_km/dt3/1e6:8.1f} M kmers/s", flush=True)

    @jax.jit
    def v3u(block, lanes):
        flat = (block[:, None] * 128 + lanes).reshape(-1)
        t = jnp.zeros(P.width + 128, jnp.int32)
        return t.at[flat].add(1, mode="drop")
    dt3u = timeit(v3u, (block, lanes), name="V3u flat unsorted scalar")
    print(f"   -> {n_km/dt3u/1e6:8.1f} M kmers/s", flush=True)

    pos = jnp.arange(128, dtype=jnp.int32)[None, :]

    @jax.jit
    def v4(block, lanes):
        sb, l0, l1, l2, l3 = jax.lax.sort(
            [block] + [lanes[:, j] for j in range(4)], dimension=0, num_keys=1)
        oh = sum(((l[:, None] == pos).astype(jnp.int32)
                  for l in (l0, l1, l2, l3)))
        t = jnp.zeros((NROWS + 1, 128), jnp.int32)
        return t.at[sb].add(oh, mode="drop", indices_are_sorted=True)
    dt4 = timeit(v4, (block, lanes), name="V4 sorted row scatter")
    print(f"   -> {n_km/dt4/1e6:8.1f} M kmers/s", flush=True)

    @jax.jit
    def v5(block, lanes):
        sb, l0, l1, l2, l3 = jax.lax.sort(
            [block] + [lanes[:, j] for j in range(4)], dimension=0, num_keys=1)
        oh = sum(((l[:, None] == pos).astype(jnp.int32)
                  for l in (l0, l1, l2, l3)))
        is_start = jnp.concatenate(
            [jnp.ones(1, bool), sb[1:] != sb[:-1]])
        seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        rows = jax.ops.segment_sum(oh, seg, num_segments=n)
        ub = jnp.full(n, NROWS, jnp.int32).at[seg].set(sb, mode="drop",
                                                       unique_indices=False)
        t = jnp.zeros((NROWS + 1, 128), jnp.int32)
        return t.at[ub].add(rows, mode="drop", unique_indices=True)
    dt5 = timeit(v5, (block, lanes), name="V5 dedup rows scatter")
    print(f"   -> {n_km/dt5/1e6:8.1f} M kmers/s", flush=True)

    table = jnp.zeros(P.width, jnp.int32)

    @jax.jit
    def v6(block, lanes):
        idx = jnp.minimum(block[:, None] * 128 + lanes, P.width - 1)
        return jnp.min(table[idx], axis=-1)
    dt6 = timeit(v6, (block, lanes), name="V6 query gather min4")
    print(f"   -> {n_km/dt6/1e6:8.1f} M kmers/s", flush=True)


if __name__ == "__main__":
    main()
