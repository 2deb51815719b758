"""kmerax.core vs oracle: bit-exact equivalence on random data."""

import numpy as np
import jax.numpy as jnp
import pytest

from kmerax.core import (
    bloom_indices, buckets, canonical_words, extract_kmers, kmer_hash,
    minimizers, mix32, revcomp_words, seq_bytes_to_bases, words_less,
)
from kmerax.core.hash import HASH_SEED_1, HASH_SEED_2

import oracle
from oracle.codec import (
    bucket_of, canonical_int, int_to_words, kmer_hash_int, kmer_int,
    minimizer_of, num_words, revcomp_int, words_to_int,
)

KS = [25, 31, 63]


def _rand_kmers(rng, k, n):
    """n random k-mers -> (oracle ints, device words array (n, W))."""
    w = num_words(k)
    vals, words = [], []
    for _ in range(n):
        v = kmer_int(rng.integers(0, 4, k))
        vals.append(v)
        words.append(int_to_words(v, w))
    return vals, jnp.asarray(np.array(words, dtype=np.uint32))


@pytest.mark.parametrize("k", KS)
def test_revcomp_words_matches_oracle(k):
    rng = np.random.default_rng(10 + k)
    vals, words = _rand_kmers(rng, k, 64)
    rc = np.asarray(revcomp_words(words, k))
    for v, row in zip(vals, rc):
        assert words_to_int(row) == revcomp_int(v, k)


@pytest.mark.parametrize("k", KS)
def test_canonical_words_matches_oracle(k):
    rng = np.random.default_rng(20 + k)
    vals, words = _rand_kmers(rng, k, 64)
    canon, is_fwd = canonical_words(words, k)
    canon = np.asarray(canon)
    for v, row, f in zip(vals, canon, np.asarray(is_fwd)):
        c = canonical_int(v, k)
        assert words_to_int(row) == c
        assert bool(f) == (v == c)


def test_words_less_bigint():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**32, (100, 4), dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 2**32, (100, 4), dtype=np.uint64).astype(np.uint32)
    b[:10] = a[:10]  # exercise equality
    got = np.asarray(words_less(jnp.asarray(a), jnp.asarray(b)))
    for i in range(100):
        assert bool(got[i]) == (words_to_int(a[i]) < words_to_int(b[i]))


@pytest.mark.parametrize("k", KS)
def test_extract_kmers_matches_oracle(k):
    rng = np.random.default_rng(30 + k)
    B, L = 8, 100
    bases = rng.integers(0, 4, (B, L)).astype(np.uint8)
    bases[0, 10] = 4  # N splits validity
    bases[3, 0] = 4
    words, valid = extract_kmers(jnp.asarray(bases.astype(np.int32)), k)
    words, valid = np.asarray(words), np.asarray(valid)
    for r in range(B):
        for j in range(L - k + 1):
            v = kmer_int(bases[r, j:j + k])
            assert bool(valid[r, j]) == (v >= 0)
            if v >= 0:
                assert words_to_int(words[r, j]) == v


def test_mix32_matches_oracle():
    rng = np.random.default_rng(4)
    xs = rng.integers(0, 2**32, 1000, dtype=np.uint64).astype(np.uint32)
    got = np.asarray(mix32(jnp.asarray(xs)))
    for x, g in zip(xs, got):
        assert int(g) == oracle.mix32(int(x))


@pytest.mark.parametrize("k", KS)
def test_kmer_hash_matches_oracle(k):
    rng = np.random.default_rng(40 + k)
    vals, words = _rand_kmers(rng, k, 32)
    for seed in (HASH_SEED_1, HASH_SEED_2):
        got = np.asarray(kmer_hash(words, seed))
        for v, g in zip(vals, got):
            assert int(g) == kmer_hash_int(v, k, seed)


@pytest.mark.parametrize("k", KS)
def test_minimizer_matches_oracle(k):
    m = 11
    rng = np.random.default_rng(50 + k)
    vals, words = _rand_kmers(rng, k, 32)
    canon, _ = canonical_words(words, k)
    got = np.asarray(minimizers(canon, k, m))
    bk = np.asarray(buckets(canon, k, m, 64))
    for v, g, b in zip(vals, got, bk):
        c = canonical_int(v, k)
        assert int(g) == minimizer_of(c, k, m)
        assert int(b) == bucket_of(c, k, m, 64)


@pytest.mark.parametrize("k", KS)
@pytest.mark.parametrize("scheme", ["hash", "minimizer"])
def test_bloom_indices_match_oracle(k, scheme):
    """Bucket-segmented probes (DESIGN.md §5 / §5a) vs oracle, both schemes."""
    from oracle.count import CountingBloomOracle
    rng = np.random.default_rng(60 + k)
    vals, words = _rand_kmers(rng, k, 32)
    canon, _ = canonical_words(words, k)
    bk = None
    if scheme == "minimizer":
        bk = (minimizers(canon, k, 11) % jnp.uint32(256))
    bl = CountingBloomOracle(k, log2_width=20, num_hashes=4,
                             minimizer_m=11, log2_buckets=8,
                             bucket_scheme=scheme)
    got = np.asarray(bloom_indices(canon, 20, 4, bk, 8))
    for v, row in zip(vals, got):
        assert list(row) == bl._probes(canonical_int(v, k))


def test_seq_bytes_roundtrip():
    s = np.frombuffer(b"ACGTNacgtX", dtype=np.uint8)
    b = seq_bytes_to_bases(s)
    assert list(b) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
