"""Self-consistency tests for the CPU oracle (golden truth, SURVEY.md §0)."""

import numpy as np
import pytest

from oracle import (
    ExactSpectrum, CountingBloomOracle, auto_threshold, banded_align,
    bases_to_seq, canonical_int, correct_read, histogram_of, kmer_int,
    minimizer_of, revcomp_int, seq_to_bases, assemble_fasta,
)
from sim import ecoli_like, make_fastq, random_genome, revcomp_bases, simulate_reads


def test_seq_roundtrip():
    s = "ACGTNACGT"
    b = seq_to_bases(s)
    assert bases_to_seq(b) == s
    assert list(b) == [0, 1, 2, 3, 4, 0, 1, 2, 3]


def test_revcomp_involution():
    rng = np.random.default_rng(0)
    for k in (25, 31, 63):
        for _ in range(20):
            v = kmer_int(rng.integers(0, 4, k))
            assert revcomp_int(revcomp_int(v, k), k) == v
            c = canonical_int(v, k)
            assert canonical_int(c, k) == c
            assert c == canonical_int(revcomp_int(v, k), k)


def test_kmer_int_invalid():
    assert kmer_int([0, 1, 4]) == -1
    assert kmer_int([0, 1, 2]) == 0b000110


def test_revcomp_matches_strings():
    s = "ACGTTGCAAGGTCAGGTAACCGGTATTTACG"  # k=31
    b = seq_to_bases(s)
    v = kmer_int(b)
    rc = revcomp_int(v, 31)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    expect = "".join(comp[c] for c in reversed(s))
    got = bases_to_seq(np.array([(rc >> (2 * (31 - 1 - i))) & 3
                                 for i in range(31)], dtype=np.uint8))
    assert got == expect


def test_minimizer_strand_invariant():
    rng = np.random.default_rng(1)
    for _ in range(10):
        v = kmer_int(rng.integers(0, 4, 31))
        c = canonical_int(v, 31)
        assert minimizer_of(c, 31, 11) == minimizer_of(
            canonical_int(revcomp_int(v, 31), 31), 31, 11)


def test_exact_spectrum_bruteforce():
    rng = np.random.default_rng(2)
    k = 25
    reads = [rng.integers(0, 4, 60).astype(np.uint8) for _ in range(30)]
    reads[0][10] = 4  # an N splits kmers
    sp = ExactSpectrum(k)
    sp.add_reads(reads)
    brute = {}
    for r in reads:
        for j in range(len(r) - k + 1):
            v = kmer_int(r[j:j + k])
            if v >= 0:
                c = canonical_int(v, k)
                brute[c] = brute.get(c, 0) + 1
    assert sp.counts == brute
    keys, counts = sp.sorted_items()
    assert keys == sorted(brute)


def test_bloom_overestimates_exact():
    rng = np.random.default_rng(3)
    k = 31
    reads = [rng.integers(0, 4, 80).astype(np.uint8) for _ in range(50)]
    sp = ExactSpectrum(k)
    bl = CountingBloomOracle(k, log2_width=16)
    sp.add_reads(reads)
    bl.add_reads(reads)
    for c, n in sp.counts.items():
        assert bl.query(c) >= n


def test_histogram_threshold():
    h = histogram_of([1, 1, 1, 1, 5, 5, 6, 6, 6, 7])
    assert h[1] == 4 and h[5] == 2 and h[6] == 3
    # valley at 2 (h[2]=0 <= h[3]=0)
    assert auto_threshold(h) == 2


def test_correct_fixes_single_error():
    genome, reads = ecoli_like(genome_len=3000, coverage=50,
                               read_len=100, error_rate=0.0)
    k, t = 31, 3
    sp = ExactSpectrum(k)
    sp.add_reads([r.bases for r in reads])
    # inject one error into a read mid-body
    r = reads[5].bases.copy()
    r[50] = (r[50] + 1) % 4
    fixed = correct_read(r, k, t, sp.query)
    assert np.array_equal(fixed, reads[5].bases)
    # clean read untouched
    clean = correct_read(reads[7].bases, k, t, sp.query)
    assert np.array_equal(clean, reads[7].bases)


def test_correct_with_bloom_matches_itself():
    genome, reads = ecoli_like(genome_len=2000, coverage=50,
                               read_len=100, error_rate=0.01)
    k, t = 31, 3
    bl = CountingBloomOracle(k, log2_width=18)
    bl.add_reads([r.bases for r in reads])
    out1 = [correct_read(r.bases, k, t, bl.query) for r in reads[:20]]
    out2 = [correct_read(r.bases, k, t, bl.query) for r in reads[:20]]
    for a, b in zip(out1, out2):
        assert np.array_equal(a, b)


def test_assemble_reconstructs_genome():
    rng = np.random.default_rng(4)
    genome = random_genome(rng, 600)
    k = 31
    # perfectly tiling error-free reads
    reads = [genome[i:i + 60] for i in range(0, 541, 5)] + [genome[-60:]]
    sp = ExactSpectrum(k)
    sp.add_reads(reads)
    fasta = assemble_fasta(sp, t=1, k=k)
    lines = fasta.strip().split("\n")
    assert len(lines) == 2, f"expected single unitig, got {len(lines)//2}"
    seq = lines[1]
    gseq = bases_to_seq(genome)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    grc = "".join(comp[c] for c in reversed(gseq))
    assert seq == min(gseq, grc)
    assert lines[0] == f">unitig_0 len={len(seq)}"


def test_assemble_branch_splits_unitigs():
    # Two genomes sharing a k-mer region force a branch -> >1 unitig
    rng = np.random.default_rng(5)
    k = 25
    a = random_genome(rng, 200)
    b = random_genome(rng, 200)
    shared = random_genome(rng, 40)
    g1 = np.concatenate([a, shared, random_genome(rng, 200)])
    g2 = np.concatenate([b, shared, random_genome(rng, 200)])
    sp = ExactSpectrum(k)
    for g in (g1, g2):
        sp.add_reads([g[i:i + 60] for i in range(0, len(g) - 60, 3)]
                     + [g[-60:]])
    fasta = assemble_fasta(sp, t=1, k=k)
    n = fasta.count(">")
    assert n >= 4  # branch in, branch out on both sides


def test_banded_align_exact_match():
    rng = np.random.default_rng(6)
    q = rng.integers(0, 4, 50)
    score, tr = banded_align(q, q, band=5)
    assert score == 2 * 50
    assert tr == "M" * 50


def test_banded_align_mismatch_and_gap():
    q = seq_to_bases("ACGTACGTAC")
    t_ = q.copy()
    t_[4] = (t_[4] + 1) % 4
    score, tr = banded_align(q, t_, band=3)
    assert score == 2 * 9 - 3
    assert tr == "MMMMXMMMMM"
    # deletion in target
    t2 = np.delete(q, 5)
    score2, tr2 = banded_align(q, t2, band=3)
    assert score2 == 2 * 9 - 4
    assert tr2.count("I") == 1
