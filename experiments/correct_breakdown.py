"""Round-3 profiling: where does correction wall time go on v5e?

Times, under identical bench conditions (bench/runners.bench_correct):
  A. full correct_batch            (the headline path)
  B. window solidity only          (per-round _window_counts equivalent)
  C. candidate derivation only     (weak-run candidates, no eval)
  D. eval probes only              (the (Q,4,k) variant scoring at fixed Q)
  E. raw pallas query kernel       (probes/s at eval-like volume)
"""

import sys
import time
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.utils.compile_cache import enable
enable()

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.correct import (correct_batch, _window_counts,
                                _weak_run_candidates, _eval_entries)
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, make_solid_fn
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31)
k = cfg.k
params = _bloom_params(cfg, k)
n_reads, read_len = 8192, 150
genome_len = 1 << 15
batches = [jnp.asarray(_sim_batch(n_reads, read_len, seed=s,
                                  genome_len=genome_len))
           for s in range(2)]


@jax.jit
def build(table, bases):
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    return insert(params, table, canon, valid)


table = make_table(params)
for b in batches:
    table = build(table, b)
_sync(table)
lengths = jnp.full(n_reads, read_len, dtype=jnp.int32)
last_j = lengths - k
sf = make_solid_fn(params, table, 3)


def timeit(name, fn, *args, reps=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:9.2f} ms")
    return dt


# A. full correct
full = jax.jit(lambda b: correct_batch(b, lengths, k, 3, solid_fn=sf,
                                       rounds=cfg.rounds,
                                       max_runs=cfg.max_runs,
                                       max_edits=cfg.max_edits))
dt = timeit("full correct_batch", full, batches[0])
print(f"  -> {n_reads/dt:,.0f} reads/s")

# B. window solidity (one round's worth)
wc = jax.jit(lambda b: _window_counts(b, last_j, k, sf))
timeit("window solidity (1 round)", wc, batches[0])

# C. candidates from windows
def cands_fn(b):
    solid, existing = _window_counts(b, last_j, k, sf)
    return _weak_run_candidates(solid, existing, last_j, k, cfg.max_runs)
timeit("windows + candidates", jax.jit(cands_fn), batches[0])

# D. eval at width Q=2*B (typical round-1 width)
Q = 2 * n_reads
rng = np.random.default_rng(0)
ent_r = jnp.asarray(rng.integers(0, n_reads, Q).astype(np.int32))
ent_i = jnp.asarray(rng.integers(0, read_len, Q).astype(np.int32))
ev = jax.jit(lambda b, er, ei: _eval_entries(b, lengths, last_j, er, ei,
                                             k, sf))
dt = timeit(f"eval entries Q={Q}", ev, batches[0], ent_r, ent_i)
print(f"  -> {Q*4*k/dt/1e6:,.1f} M probes/s incl glue")

# E. raw pallas probe rate at the same volume
N = Q * 4 * k
w = (k + 15) // 16
probe_words = jnp.asarray(
    rng.integers(0, 1 << 30, (N, w)).astype(np.uint32))
pvalid = jnp.ones(N, dtype=bool)
pq = jax.jit(lambda cw, v: sf(cw, v))
dt = timeit(f"raw solid probes N={N}", pq, probe_words, pvalid)
print(f"  -> {N/dt/1e6:,.1f} M probes/s kernel-only path")
