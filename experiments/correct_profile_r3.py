"""Round-3 correction profile: where do the 45 ms per 8192-read batch go?

Components of correct_batch (rounds=2):
  A. per-round window solidity (_window_counts): extract+canon+Pallas query
  B. per-round candidate derivation (_weak_run_candidates + cap)
  C. per-round fused eval (prep kernel + query kernel) at each width
  D. apply/conflict suppression
"""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp

from kmerax.config import KmeraxConfig
from kmerax.bench.runners import _sim_batch, _sync
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, make_solid_fn
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.correct import correct_batch, _window_counts, \
    _weak_run_candidates
from kmerax.ops.pallas_correct import make_fused_eval, eval_entries_fused

cfg = KmeraxConfig(k=31)
k = cfg.k
n_reads, read_len = 8192, 150
params = _bloom_params(cfg, k)
genome_len = 1 << 15
batches = [jnp.asarray(_sim_batch(n_reads, read_len, seed=s,
                                  genome_len=genome_len)) for s in range(2)]

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
ef = make_fused_eval(params, table, 3)
bases = batches[0]


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.2f} ms")
    return out


# full correct (reference point)
@jax.jit
def full(bases):
    fixed, ne = correct_batch(bases, lengths, k, 3, solid_fn=sf,
                              rounds=cfg.rounds, max_runs=cfg.max_runs,
                              max_edits=cfg.max_edits, eval_fn=ef)
    return jnp.sum(ne)

timeit("full correct_batch (2 rounds)", full, bases, reps=5)

@jax.jit
def fullx(bases):
    fixed, ne = correct_batch(bases, lengths, k, 3, solid_fn=sf,
                              rounds=cfg.rounds, max_runs=cfg.max_runs,
                              max_edits=cfg.max_edits, eval_fn=None)
    return jnp.sum(ne)

timeit("full correct_batch (XLA eval)", fullx, bases, reps=5)

@jax.jit
def one_round(bases):
    fixed, ne = correct_batch(bases, lengths, k, 3, solid_fn=sf,
                              rounds=1, max_runs=cfg.max_runs,
                              max_edits=cfg.max_edits, eval_fn=ef)
    return jnp.sum(ne)

timeit("correct_batch 1 round", one_round, bases, reps=5)

# A: window solidity
@jax.jit
def wc(bases):
    s, e = _window_counts(bases, last_j, k, sf)
    return jnp.sum(s)

timeit("A window solidity (1 round)", wc, bases)

# B: candidate derivation
solid, existing = _window_counts(bases, last_j, k, sf)
solid = jax.device_get(solid); existing = jax.device_get(existing)
solid = jnp.asarray(solid); existing = jnp.asarray(existing)

@jax.jit
def cd(solid, existing):
    c = _weak_run_candidates(solid, existing, last_j, k, cfg.max_runs)
    return jnp.sum(c)

timeit("B candidate derivation", cd, solid, existing)

# C: fused eval at a few widths
cands = _weak_run_candidates(solid, existing, last_j, k, cfg.max_runs)
live_row = cands >= 0
rr = jnp.cumsum(live_row.astype(jnp.int32), axis=1) - 1
capped = jnp.stack(
    [jnp.max(jnp.where(live_row & (rr == s), cands, -1), axis=1)
     for s in range(4)], axis=1)
livef = np.asarray((capped >= 0).reshape(-1))
n_live = int(livef.sum())
print(f"live candidates round 1: {n_live} / {livef.size}")

idx = np.nonzero(livef)[0]
if n_live == 0:
    print("no live candidates — skipping the Q sweep")
    sys.exit(0)
for Q in (2048, 8192, 16384):
    sel = np.resize(idx, Q)
    ent_r = jnp.asarray((sel // 4).astype(np.int32))
    ent_i = jnp.asarray(np.asarray(capped.reshape(-1))[sel].astype(np.int32))

    @jax.jit
    def ev(bases, ent_r, ent_i):
        bb, acc = eval_entries_fused(params, table, 3, bases, lengths,
                                     last_j, ent_r, ent_i)
        return jnp.sum(bb) + jnp.sum(acc)

    timeit(f"C fused eval Q={Q}", ev, bases, ent_r, ent_i)

# C': prep kernel only vs query kernel only at Q=8192
from kmerax.ops.pallas_correct import _prep_pallas, LP
from kmerax.spectrum.pallas_bloom import _query_pallas_flat
Q = 8192
sel = np.resize(idx, Q)
ent_r_n = (sel // 4).astype(np.int32)
ent_i_n = np.asarray(capped.reshape(-1))[sel].astype(np.int32)
B, L = bases.shape
ic = np.clip(ent_i_n, 0, L - 1)
c = ic - (k - 1)
lj_e = np.where(ent_i_n >= 0, np.asarray(last_j)[ent_r_n], -1)
rows_all = jnp.pad(bases, ((0, 0), (0, LP - L)), constant_values=4)
rows = rows_all[jnp.asarray(ent_r_n)]
meta = jnp.stack([jnp.asarray(c), jnp.asarray(lj_e)], axis=1)
block_mask = (1 << (params.log2_width - 7)) - 1

@jax.jit
def prep(rows, meta):
    blk, lp = _prep_pallas(k, params.num_hashes, 4, 0, block_mask,
                           rows, meta, False)
    return jnp.sum(blk) + jnp.sum(lp)

timeit("C1 prep kernel Q=8192", prep, rows, meta)

blk, lp = _prep_pallas(k, params.num_hashes, 4, 0, block_mask, rows, meta,
                       False)
nrows = table.shape[0] // 128

@jax.jit
def qk(blk, lp):
    s = _query_pallas_flat(params.num_hashes, nrows, jnp.asarray(3, jnp.int32),
                           blk.reshape(-1), lp.reshape(-1), False,
                           table.reshape(nrows, 128))
    return jnp.sum(s)

timeit("C2 query kernel Q=8192 (1M probes)", qk, blk, lp)

@jax.jit
def rg(ent_r):
    return jnp.sum(rows_all[ent_r])

timeit("C0 row gather Q=8192", rg, jnp.asarray(ent_r_n))
