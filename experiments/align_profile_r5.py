"""Round-5 lab: where does the align stage's wall time go?

BENCH_r04: stage 314.9k reads/s (52ms @ B=16384) while the Pallas DP kernel
does 10.5M reads/s (1.6ms). Break the stage into its pieces and time each
with the chained-dispatch methodology (bench.runners policy).
"""

import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.utils import compile_cache  # noqa: F401
from kmerax.bench.runners import _sim_batch, _sync
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.align import build_contig_index, seed_positions, NEG_INF
from kmerax.spectrum.exact import prefix_table, searchsorted_words_pref

k, band = 31, 15
B, L = 16384, 150
N_FRESH = 8

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1 << 17).astype(np.uint8)
cat, uniq, pay = build_contig_index([genome], k)
cat_dev = jnp.asarray(cat.astype(np.int8))
ptab, psteps = prefix_table(uniq)
print("index rows:", uniq.shape, "psteps:", psteps)

batches = [jnp.asarray(_sim_batch(B, L, seed=s)) for s in range(N_FRESH + 1)]
lengths = jnp.full(B, L, dtype=jnp.int32)


def timeit(name, fn, state0=0):
    st = jnp.zeros((), jnp.int32)
    for _ in range(2):
        st = fn(st, batches[0])
    _sync(st)
    t0 = time.perf_counter()
    for b in batches[1:]:
        st = fn(st, b)
    _sync(st)
    dt = (time.perf_counter() - t0) / (len(batches) - 1)
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch  {B/dt/1e3:9.1f} kreads/s")
    return dt


# 1. extract + canonical only
@jax.jit
def f_extract(st, bases):
    words, valid = extract_kmers(bases, k)
    canon, is_fwd = canonical_words(words, k)
    return st + canon[0, 0, 0].astype(jnp.int32)

timeit("extract+canonical", f_extract)


# 2. + seed search (searchsorted_words_pref over all nk positions)
@jax.jit
def f_seed(st, bases):
    words, valid = extract_kmers(bases, k)
    canon, is_fwd = canonical_words(words, k)
    off, payload, found = seed_positions(canon, valid, uniq, pay,
                                         pref=(ptab, psteps))
    return st + jnp.sum(found.astype(jnp.int32))

timeit("+ seed search", f_seed)


# 3. + window build (strand select, T gather) but NO DP
@jax.jit
def f_window(st, bases):
    bases = bases.astype(jnp.int32)
    words, valid = extract_kmers(bases, k)
    canon, is_fwd = canonical_words(words, k)
    off, payload, found = seed_positions(canon, valid, uniq, pay,
                                         pref=(ptab, psteps))
    rfwd = jnp.take_along_axis(is_fwd, off[:, None], axis=1)[:, 0]
    cfwd = (payload & 1) == 1
    pos = payload >> 1
    strand = (found & (rfwd != cfwd)).astype(jnp.int32)
    irev = lengths[:, None] - 1 - jnp.arange(L, dtype=jnp.int32)[None, :]
    rcb = bases[jnp.arange(B)[:, None], jnp.clip(irev, 0, L - 1)]
    rcb = jnp.where((irev >= 0) & (rcb < 4), 3 - rcb, 4)
    Q = jnp.where((strand == 1)[:, None], rcb, bases)
    jq = jnp.where(strand == 1, lengths - k - off, off)
    start = pos - jq
    M = cat_dev.shape[0]
    tidx = start[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
    oob = (tidx < 0) | (tidx >= M) | ~found[:, None]
    T = jnp.where(oob, 4, cat_dev[jnp.clip(tidx, 0, M - 1)].astype(jnp.int32))
    return st + jnp.sum(T[:, 0]) + jnp.sum(Q[:, 0])

timeit("+ window build (no DP)", f_window)


# 4. full validate_batch (the bench stage)
from kmerax.ops.align import validate_batch

@jax.jit
def f_full(st, bases):
    found, strand, pos, score = validate_batch(
        cat_dev, uniq, pay, bases, lengths, k, band,
        index_pref=(ptab, psteps))
    return st + jnp.sum(found.astype(jnp.int32))

timeit("full validate_batch", f_full)


# 5. cuckoo-hash seed search (round-5: ops.seed_hash)
from kmerax.ops.seed_hash import build_seed_hash

sh = build_seed_hash(uniq, pay)
print("cuckoo: S =", sh.n_slots, "attempt", sh.attempt)


@jax.jit
def f_seed_hash(st, bases):
    words, valid = extract_kmers(bases, k)
    canon, is_fwd = canonical_words(words, k)
    off, payload, found = seed_positions(
        canon, valid, uniq, pay, shash=(sh.tab, sh.n_slots, sh.attempt))
    return st + jnp.sum(found.astype(jnp.int32))

timeit("+ seed search (cuckoo)", f_seed_hash)


# 6. full validate_batch through the cuckoo index
@jax.jit
def f_full_hash(st, bases):
    found, strand, pos, score = validate_batch(
        cat_dev, uniq, pay, bases, lengths, k, band,
        index_hash=(sh.tab, sh.n_slots, sh.attempt))
    return st + jnp.sum(found.astype(jnp.int32))

timeit("full validate (cuckoo)", f_full_hash)
