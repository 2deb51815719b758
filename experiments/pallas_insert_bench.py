"""Pallas VMEM-resident insert vs XLA scatter at bench scale (LW=24, 2M kmers)."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np, jax, jax.numpy as jnp
from kmerax.utils.compile_cache import enable
enable()
from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table
from kmerax.spectrum.pallas_bloom import insert_pallas
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31, bloom_log2_width=24)
k = cfg.k
params = _bloom_params(cfg, k)
n_reads, read_len = 16384, 150
bases = jnp.asarray(_sim_batch(n_reads, read_len, seed=0))
nk = n_reads * (read_len - k + 1)
print(f"n kmers = {nk}", flush=True)

@jax.jit
def step_pallas(table, bases):
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    return insert_pallas(params, table, canon, valid)

@jax.jit
def step_xla(table, bases):
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    return insert(params, table, canon, valid)

def timeit(fn, name, reps=5):
    t0 = time.perf_counter(); out = fn(make_table(params), bases); _sync(out)
    comp = time.perf_counter() - t0
    t = make_table(params)
    t0 = time.perf_counter()
    for _ in range(reps):
        t = fn(t, bases)
    _sync(t)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:20s} {dt*1e3:9.2f} ms  ({nk/dt/1e6:7.1f} M kmers/s)"
          f"  compile {comp:.1f}s", flush=True)
    return t

tp = timeit(step_pallas, "pallas insert")
tx = timeit(step_xla, "xla insert")
# correctness: 5 reps each, tables must match exactly
print("tables equal:", bool(jnp.array_equal(tp, tx)),
      "| sums:", int(tp.sum()), int(tx.sum()), flush=True)
