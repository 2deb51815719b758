"""Decompose bench_correct cost: window solidity query vs slot evals vs scan.

Measures on the real chip:
  A  full correct_batch (the bench step)         -- baseline
  B  window query only (solid_fn over all nk windows, x rounds)
  C  one _eval_entries at width B (v2 flat candidate eval)
  D  one _eval_entries at width B/4
"""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np, jax, jax.numpy as jnp
from kmerax.utils.compile_cache import enable
enable()
from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.correct import correct_batch, _eval_entries, _window_counts
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, query, query_solid, solidity_bitmap
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31, bloom_log2_width=24)
k = cfg.k
params = _bloom_params(cfg, k)
n_reads, read_len = 4096, 150
bases = jnp.asarray(_sim_batch(n_reads, read_len, seed=0))
lengths = jnp.full(n_reads, read_len, dtype=jnp.int32)

@jax.jit
def build(table, b):
    words, valid = extract_kmers(b, k)
    canon, _ = canonical_words(words, k)
    return insert(params, table, canon, valid)
table = build(make_table(params), bases)
_sync(table)
bitmap = jax.jit(solidity_bitmap, static_argnums=0)(params, table, 3)
_sync(bitmap)
sf = lambda cw, v: query_solid(params, bitmap, cw, v)

def timeit(fn, args, name, reps=3):
    out = fn(*args); _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms", flush=True)
    return dt

# A: full correct
fullf = jax.jit(lambda b, l: correct_batch(b, l, k, 3, solid_fn=sf,
                                           rounds=cfg.rounds,
                                           max_runs=cfg.max_runs,
                                           max_edits=cfg.max_edits))
timeit(fullf, (bases, lengths), "A full correct_batch (2 rounds)")

# B: window query only
last_j = lengths - k
wf = jax.jit(lambda b: _window_counts(b, last_j, k, sf)[0].sum())
timeit(wf, (bases,), "B window solidity query (1x)")

# C: one flat entry eval at width B
ent_r = jnp.arange(n_reads, dtype=jnp.int32)
ent_i = jnp.full(n_reads, 75, dtype=jnp.int32)
ef = jax.jit(lambda b: _eval_entries(b, lengths, last_j, ent_r, ent_i, k, sf)[1].sum())
timeit(ef, (bases,), "C _eval_entries width B")

# D: width B/4
cap = n_reads // 4
ef2 = jax.jit(lambda b: _eval_entries(b, lengths, last_j, ent_r[:cap],
                                      ent_i[:cap], k, sf)[1].sum())
timeit(ef2, (bases,), "D _eval_entries width B/4")
