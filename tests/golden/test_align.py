"""Golden: banded alignment scores bit-exact vs oracle; seed-extend works."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from kmerax.ops.align import NEG_INF, banded_align_scores, seed_positions
from sim import random_genome, revcomp_bases


def _pad(arrs, L):
    out = np.full((len(arrs), L), 4, dtype=np.int32)
    lens = np.zeros(len(arrs), dtype=np.int32)
    for i, a in enumerate(arrs):
        out[i, :len(a)] = a
        lens[i] = len(a)
    return jnp.asarray(out), jnp.asarray(lens)


@pytest.mark.parametrize("band", [3, 8, 15])
def test_scores_match_oracle(band):
    rng = np.random.default_rng(123 + band)
    qs, ts = [], []
    for _ in range(40):
        n = int(rng.integers(10, 60))
        q = rng.integers(0, 4, n).astype(np.int64)
        t = q.copy()
        # mutate: substitutions, indels, occasionally unrelated
        roll = rng.random()
        if roll < 0.3:
            for _ in range(int(rng.integers(0, 4))):
                p = int(rng.integers(0, len(t)))
                t[p] = (t[p] + rng.integers(1, 4)) % 4
        elif roll < 0.6:
            for _ in range(int(rng.integers(1, 4))):
                p = int(rng.integers(0, len(t)))
                if rng.random() < 0.5 and len(t) > 5:
                    t = np.delete(t, p)
                else:
                    t = np.insert(t, p, rng.integers(0, 4))
        elif roll < 0.7:
            t = rng.integers(0, 4, int(rng.integers(10, 60)))
        if rng.random() < 0.2:
            q[int(rng.integers(0, len(q)))] = 4  # N base
        qs.append(q)
        ts.append(t)
    L = max(max(len(a) for a in qs), max(len(a) for a in ts))
    Q, ql = _pad(qs, L)
    T, tl = _pad(ts, L)
    got = np.asarray(jax.jit(
        lambda a, b, c, d: banded_align_scores(a, b, c, d, band))(Q, T, ql, tl))
    for i in range(len(qs)):
        want, _ = oracle.banded_align(qs[i], ts[i], band=band)
        assert int(got[i]) == want, f"pair {i}: got {got[i]} want {want}"


def test_identical_and_empty():
    q = np.arange(20) % 4
    Q, ql = _pad([q, q[:0]], 20)
    T, tl = _pad([q, q[:0]], 20)
    got = np.asarray(banded_align_scores(Q, T, ql, tl, 5))
    assert got[0] == 40          # 20 matches * 2
    assert got[1] == 0           # empty vs empty


def test_seed_extend_places_reads():
    """Reads simulated from a genome seed+extend back to their true locus."""
    from kmerax.core import canonical_words, extract_kmers
    from kmerax.spectrum.exact import mask_invalid, sort_kmers, unique_counts

    rng = np.random.default_rng(77)
    genome = random_genome(rng, 3000)
    k = 31
    # index the genome: kmer -> position (first occurrence wins)
    gb = jnp.asarray(genome[None].astype(np.int32))
    words, valid = extract_kmers(gb, k)
    canon, _ = canonical_words(words, k)
    flat = np.asarray(mask_invalid(canon, valid))[0]
    pos = np.arange(flat.shape[0], dtype=np.int32)
    # sort by kmer, dedup keeping first position
    order = np.lexsort(tuple(flat[:, i] for i in range(flat.shape[1])))
    fs, ps = flat[order], pos[order]
    keep = np.concatenate([[True], np.any(fs[1:] != fs[:-1], axis=1)])
    uniq, upos = jnp.asarray(fs[keep]), jnp.asarray(ps[keep])

    # reads with 1% errors from known positions (forward strand)
    starts = rng.integers(0, 3000 - 100, 32)
    reads = np.stack([genome[s:s + 100] for s in starts]).astype(np.int32)
    errs = rng.random(reads.shape) < 0.01
    reads = np.where(errs, (reads + 1) % 4, reads)

    rw, rv = extract_kmers(jnp.asarray(reads), k)
    rc, _ = canonical_words(rw, k)
    off, payload, found = jax.jit(seed_positions)(rc, rv, uniq, upos)
    off, payload, found = map(np.asarray, (off, payload, found))
    n_placed = 0
    for i in range(32):
        if not found[i]:
            continue
        implied_start = payload[i] - off[i]
        if implied_start == starts[i]:
            n_placed += 1
    assert n_placed >= 28, f"only {n_placed}/32 reads seeded to true locus"

    # extend: align each read against its implied genome window
    wins = np.stack([genome[max(0, payload[i] - off[i]):][:100]
                     for i in range(32)]).astype(np.int32)
    Q, ql = jnp.asarray(reads), jnp.full(32, 100, jnp.int32)
    T, tl = jnp.asarray(wins), jnp.full(32, 100, jnp.int32)
    scores = np.asarray(banded_align_scores(Q, T, ql, tl, 8))
    # each read has ~1 error: score ~ 2*100 - 5/error
    assert (scores[found] >= 2 * 100 - 5 * 6).all()
