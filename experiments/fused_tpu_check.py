"""Round-3: compiled fused-kernel parity + perf on the real chip."""

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
from kmerax.ops.correct import correct_batch, _eval_entries
from kmerax.ops.pallas_correct import eval_entries_fused, make_fused_eval
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, make_solid_fn
from kmerax.bench.runners import _sim_batch, _sync

cfg = KmeraxConfig(k=31)
k = cfg.k
params = _bloom_params(cfg, k)
B, L = 4096, 150
bases = jnp.asarray(_sim_batch(B, L, seed=0, genome_len=1 << 15))
lengths = jnp.full(B, L, dtype=jnp.int32)
last_j = lengths - k

@jax.jit
def bld(t, b):
    w, v = extract_kmers(b, k)
    c, _ = canonical_words(w, k)
    return insert(params, t, c, v)

table = bld(make_table(params), bases)
_sync(table)
t = 3
sf = make_solid_fn(params, table, t)
ef = make_fused_eval(params, table, t)
print("fused available:", ef is not None)

# parity: eval entries
rng = np.random.default_rng(1)
Q = 4096
ent_r = jnp.asarray(rng.integers(0, B, Q).astype(np.int32))
ent_i = jnp.asarray(rng.integers(0, L, Q).astype(np.int32))
ent_i = ent_i.at[:16].set(-1)

ref_b, ref_a = jax.jit(
    lambda b, er, ei: _eval_entries(b, lengths, last_j, er, ei, k, sf))(
        bases, ent_r, ent_i)
got_b, got_a = jax.jit(
    lambda b, er, ei: ef(b, lengths, last_j, er, ei))(bases, ent_r, ent_i)
ra, ga = np.asarray(ref_a), np.asarray(got_a)
rb, gb = np.asarray(ref_b), np.asarray(got_b)
assert (ra == ga).all(), f"accept mismatch: {np.sum(ra != ga)}"
assert (rb[ra] == gb[ra]).all(), "best_b mismatch"
print("eval parity OK,", int(ra.sum()), "accepts")

# parity: full correct
ref = jax.jit(lambda b: correct_batch(b, lengths, k, t, solid_fn=sf,
                                      rounds=cfg.rounds))(bases)
got = jax.jit(lambda b: correct_batch(b, lengths, k, t, solid_fn=sf,
                                      rounds=cfg.rounds, eval_fn=ef))(bases)
assert (np.asarray(ref[0]) == np.asarray(got[0])).all(), "bases mismatch"
assert (np.asarray(ref[1]) == np.asarray(got[1])).all(), "edits mismatch"
print("correct_batch parity OK")


def timeit(name, fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt

fc = jax.jit(lambda b: correct_batch(b, lengths, k, t, solid_fn=sf,
                                     rounds=cfg.rounds, eval_fn=ef))
dt = timeit("correct_batch FUSED", fc, bases)
print(f"  -> {B/dt:,.0f} reads/s")
fx = jax.jit(lambda b: correct_batch(b, lengths, k, t, solid_fn=sf,
                                     rounds=cfg.rounds))
dt = timeit("correct_batch XLA", fx, bases)
print(f"  -> {B/dt:,.0f} reads/s")
de = timeit("eval fused only Q=4096",
            jax.jit(lambda b, er, ei: ef(b, lengths, last_j, er, ei)),
            bases, ent_r, ent_i)
dx = timeit("eval XLA only Q=4096",
            jax.jit(lambda b, er, ei: _eval_entries(b, lengths, last_j,
                                                    er, ei, k, sf)),
            bases, ent_r, ent_i)
print(f"  eval speedup {dx/de:.2f}x")
