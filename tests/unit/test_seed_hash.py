"""Cuckoo seed-hash index parity vs the sorted-array search (round-5:
the align seed-search kernel path, SURVEY.md §2 #14)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmerax.core.codec import canonical_words
from kmerax.core.hash import kmer_hash
from kmerax.core.kmers import extract_kmers
from kmerax.ops.seed_hash import (
    build_seed_hash, kmer_hash_np, probe_seed_hash,
)
from kmerax.spectrum.exact import searchsorted_words


def test_kmer_hash_np_matches_device():
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 32, (257, 2), dtype=np.uint64
                         ).astype(np.uint32)
    for seed in (0x9E3779B1, 0x85EBCA77, 123456789):
        got = kmer_hash_np(words, seed)
        ref = np.asarray(kmer_hash(jnp.asarray(words), seed))
        assert np.array_equal(got, ref)


@pytest.mark.parametrize("k", [31, 63])
def test_probe_matches_searchsorted(k):
    w = (k + 15) // 16
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, 4096).astype(np.int32)
    words, valid = extract_kmers(jnp.asarray(genome[None]), k)
    canon, _ = canonical_words(words, k)
    canon = np.asarray(canon[0])[np.asarray(valid[0])]
    from kmerax.spectrum.exact import np_merge_counted
    uniq, _ = np_merge_counted(canon, np.ones(len(canon), np.int64))
    pay = np.arange(len(uniq), dtype=np.int32) * 7 + 3

    sh = build_seed_hash(uniq, pay)

    # queries: half real keys, half random misses
    qr = uniq[rng.integers(0, len(uniq), 300)]
    qm_words, _ = extract_kmers(
        jnp.asarray(rng.integers(0, 4, (1, 400 + k)).astype(np.int32)), k)
    qm_canon, _ = canonical_words(qm_words, k)
    queries = np.concatenate([qr, np.asarray(qm_canon[0])[:300]], axis=0)

    pay_got, found_got = jax.jit(
        lambda q: probe_seed_hash(sh.tab, sh.n_slots, sh.attempt, q)
    )(jnp.asarray(queries))
    idx, found_ref = searchsorted_words(jnp.asarray(uniq),
                                        jnp.asarray(queries))
    found_ref = np.asarray(found_ref)
    assert np.array_equal(np.asarray(found_got), found_ref)
    pay_ref = np.where(found_ref, pay[np.asarray(idx)], -1)
    assert np.array_equal(np.asarray(pay_got), pay_ref)


def test_build_deterministic_and_padded_index():
    from kmerax.spectrum.exact import np_merge_counted

    rng = np.random.default_rng(2)
    rows = rng.integers(0, 1 << 30, (100, 2), dtype=np.int64
                        ).astype(np.uint32)
    uniq, _ = np_merge_counted(rows, np.ones(len(rows), np.int64))
    pay = np.arange(len(uniq), dtype=np.int32)
    a = build_seed_hash(uniq, pay)
    b = build_seed_hash(uniq, pay)
    assert np.array_equal(np.asarray(a.tab), np.asarray(b.tab))
    # sentinel padding rows must be ignored by the build
    padded = np.concatenate(
        [uniq, np.full((16, 2), 0xFFFFFFFF, np.uint32)], axis=0)
    c = build_seed_hash(padded, np.concatenate([pay, np.zeros(16, np.int32)]))
    assert np.array_equal(np.asarray(a.tab), np.asarray(c.tab))


@pytest.mark.parametrize("err", [0.01, 0.5])
def test_probe_first_hit_matches_plain(err):
    """Two-phase early-exit == plain full-width probe when ok; err=0.5
    forces the overflow flag (most reads unresolved in the prefix) and the
    driver-replay contract (probe_first_hit_full) takes over."""
    from kmerax.ops.seed_hash import probe_first_hit, probe_first_hit_full
    from kmerax.spectrum.exact import np_merge_counted

    k, w = 31, 2
    rng = np.random.default_rng(4)
    genome = rng.integers(0, 4, 8192).astype(np.int32)
    words, valid = extract_kmers(jnp.asarray(genome[None]), k)
    canon, _ = canonical_words(words, k)
    canon_np = np.asarray(canon[0])[np.asarray(valid[0])]
    uniq, _ = np_merge_counted(canon_np, np.ones(len(canon_np), np.int64))
    pay = np.arange(len(uniq), dtype=np.int32)
    sh = build_seed_hash(uniq, pay)

    B, L = 256, 100
    starts = rng.integers(0, 8192 - L, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    errs = rng.random(reads.shape) < err
    reads = np.where(errs, (reads + 1) % 4, reads).astype(np.int32)
    rw, rv = extract_kmers(jnp.asarray(reads), k)
    rc, _ = canonical_words(rw, k)

    def plain(q, v):
        pay_all, fnd = probe_seed_hash(sh.tab, sh.n_slots, sh.attempt, q)
        fnd = fnd & v
        first = jnp.argmax(fnd, axis=1).astype(jnp.int32)
        any_hit = jnp.any(fnd, axis=1)
        payload = jnp.where(
            any_hit,
            jnp.take_along_axis(pay_all, first[:, None], axis=1)[:, 0], -1)
        return first, payload, any_hit

    ref = jax.jit(plain)(rc, rv)
    got = jax.jit(lambda q, v: probe_first_hit(
        sh.tab, sh.n_slots, sh.attempt, q, v))(rc, rv)
    ok = bool(got[3])
    if err == 0.01:
        assert ok, "low-error batch must not overflow the phase-B buffer"
        for r, g in zip(ref, got[:3]):
            assert np.array_equal(np.asarray(r), np.asarray(g))
    else:
        assert not ok, "adversarial batch must raise the replay flag"
        # driver replay contract: the full-width step is exact
        rep = jax.jit(lambda q, v: probe_first_hit_full(
            sh.tab, sh.n_slots, sh.attempt, q, v))(rc, rv)
        for r, g in zip(ref, rep):
            assert np.array_equal(np.asarray(r), np.asarray(g))

    # short reads whose valid windows all sit INSIDE the prefix (nk <= PA)
    # are final after phase A: they must neither consume phase-B capacity
    # nor trip the replay flag, and results still match the plain probe
    Ls = 40 + k  # nk = 41, but mask validity to the first 20 positions
    rw_s, rv_s = extract_kmers(jnp.asarray(reads[:, :Ls]), k)
    rc_s, _ = canonical_words(rw_s, k)
    rv_s = rv_s & (jnp.arange(rv_s.shape[1]) < 20)
    ref_s = jax.jit(plain)(rc_s, rv_s)
    got_s = jax.jit(lambda q, v: probe_first_hit(
        sh.tab, sh.n_slots, sh.attempt, q, v))(rc_s, rv_s)
    assert bool(got_s[3]), "prefix-only reads must not trip the replay"
    for r, g in zip(ref_s, got_s[:3]):
        assert np.array_equal(np.asarray(r), np.asarray(g))


def test_validate_batch_hash_path_matches_pref_path():
    from kmerax.ops.align import build_contig_index, validate_batch
    from kmerax.ops.seed_hash import build_seed_hash
    from kmerax.spectrum.exact import prefix_table

    k, band = 31, 8
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 2000).astype(np.uint8)
    cat, uniq, pay = build_contig_index([genome], k)
    cat_dev = jnp.asarray(cat.astype(np.int8))
    B, L = 256, 100
    starts = rng.integers(0, 2000 - L, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.int32)
    errs = rng.random(reads.shape) < 0.01
    reads = np.where(errs, (reads + 1) % 4, reads)
    bases = jnp.asarray(reads)
    lengths = jnp.full(B, L, jnp.int32)

    ptab, psteps = prefix_table(uniq)
    sh = build_seed_hash(uniq, pay)
    ref = validate_batch(cat_dev, uniq, pay, bases, lengths, k, band,
                         index_pref=(ptab, psteps))
    got = validate_batch(cat_dev, uniq, pay, bases, lengths, k, band,
                         index_hash=(sh.tab, sh.n_slots, sh.attempt))
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))

    from kmerax.ops.align import validate_batch_phased
    ph = validate_batch_phased(cat_dev, (sh.tab, sh.n_slots, sh.attempt),
                               bases, lengths, k, band)
    assert bool(ph[4])
    for r, g in zip(ref, ph[:4]):
        assert np.array_equal(np.asarray(r), np.asarray(g))
