"""Round-5 lab: why did the two-phase seed probe cost more than it saved?"""

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
from kmerax.ops.align import build_contig_index
from kmerax.ops.seed_hash import build_seed_hash, probe_seed_hash

k = 31
B, L = 16384, 150
N_FRESH = 8

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 1 << 17).astype(np.uint8)
cat, uniq, pay = build_contig_index([genome], k)
sh = build_seed_hash(uniq, pay)
TAB, S, AT = sh.tab, sh.n_slots, sh.attempt

batches = [jnp.asarray(_sim_batch(B, L, seed=s)) for s in range(N_FRESH + 1)]


def timeit(name, fn):
    st = jnp.zeros((), jnp.int32)
    for _ in range(2):
        st = fn(st, batches[0])
    _sync(st)
    t0 = time.perf_counter()
    for b in batches[1:]:
        st = fn(st, b)
    _sync(st)
    dt = (time.perf_counter() - t0) / (len(batches) - 1)
    print(f"{name:32s} {dt*1e3:8.2f} ms/batch")
    return dt


def canon_of(bases):
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    return canon, valid


@jax.jit
def f_prefix_only(st, bases):
    canon, valid = canon_of(bases)
    pay_a, fnd_a = probe_seed_hash(TAB, S, AT, canon[:, :24])
    return st + jnp.sum((fnd_a & valid[:, :24]).astype(jnp.int32))

timeit("A: prefix-24 probe only", f_prefix_only)


@jax.jit
def f_nonzero(st, bases):
    canon, valid = canon_of(bases)
    pay_a, fnd_a = probe_seed_hash(TAB, S, AT, canon[:, :24])
    any_a = jnp.any(fnd_a & valid[:, :24], axis=1)
    (ridx,) = jnp.nonzero(~any_a, size=B // 4, fill_value=0)
    return st + jnp.sum(ridx)

timeit("B: + nonzero compaction", f_nonzero)


@jax.jit
def f_subgather(st, bases):
    canon, valid = canon_of(bases)
    pay_a, fnd_a = probe_seed_hash(TAB, S, AT, canon[:, :24])
    any_a = jnp.any(fnd_a & valid[:, :24], axis=1)
    (ridx,) = jnp.nonzero(~any_a, size=B // 4, fill_value=0)
    sub = canon[ridx][:, 24:]
    return st + jnp.sum(sub[:, 0, 0].astype(jnp.int32))

timeit("C: + sub gather", f_subgather)


@jax.jit
def f_subprobe(st, bases):
    canon, valid = canon_of(bases)
    pay_a, fnd_a = probe_seed_hash(TAB, S, AT, canon[:, :24])
    any_a = jnp.any(fnd_a & valid[:, :24], axis=1)
    (ridx,) = jnp.nonzero(~any_a, size=B // 4, fill_value=0)
    sub = canon[ridx][:, 24:]
    pay_b, fnd_b = probe_seed_hash(TAB, S, AT, sub)
    return st + jnp.sum(fnd_b.astype(jnp.int32))

timeit("D: + sub probe (no cond)", f_subprobe)


from kmerax.ops.seed_hash import probe_first_hit


@jax.jit
def f_phased(st, bases):
    canon, valid = canon_of(bases)
    # (round-5 later: probe_first_hit grew an `ok` replay flag)
    first, payload, found, ok = probe_first_hit(TAB, S, AT, canon, valid)
    return st + jnp.sum(found.astype(jnp.int32))

timeit("E: probe_first_hit (w/ cond)", f_phased)


@jax.jit
def f_plain(st, bases):
    canon, valid = canon_of(bases)
    pay_all, fnd = probe_seed_hash(TAB, S, AT, canon)
    return st + jnp.sum((fnd & valid).astype(jnp.int32))

timeit("F: plain full-width probe", f_plain)


# G: cond with a TRIVIAL fallback branch (isolates cond machinery cost)
def _phased_core(canon, valid):
    pay_a, fnd_a = probe_seed_hash(TAB, S, AT, canon[:, :24])
    fa = fnd_a & valid[:, :24]
    any_a = jnp.any(fa, axis=1)
    (ridx,) = jnp.nonzero(~any_a, size=B // 4, fill_value=0)
    sub = canon[ridx][:, 24:]
    pay_b, fnd_b = probe_seed_hash(TAB, S, AT, sub)
    return jnp.sum(fnd_b.astype(jnp.int32)) + jnp.sum(any_a)


@jax.jit
def f_cond_trivial(st, bases):
    canon, valid = canon_of(bases)
    n_un = jnp.sum((~jnp.any(valid[:, :1], axis=1)).astype(jnp.int32))
    r = jax.lax.cond(n_un <= B // 4,
                     lambda _: _phased_core(canon, valid),
                     lambda _: jnp.int32(0), None)
    return st + r

timeit("G: cond w/ trivial fallback", f_cond_trivial)
