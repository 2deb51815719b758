"""Golden: the align/validation stage (DESIGN.md §10b) vs oracle.

kmerax.ops.align.validate_batch must match oracle.align.validate_read
bit-exactly on (found, strand, pos, score); the pipeline stage reports
sane aggregates on reads drawn from the contigs themselves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from oracle.align import build_contig_index as oracle_index
from oracle.align import validate_read
from kmerax.ops.align import build_contig_index, validate_batch
from sim import ecoli_like, make_fastq


@pytest.fixture(scope="module")
def world():
    genome, reads = ecoli_like(seed=55, genome_len=3000, coverage=15,
                               read_len=100, error_rate=0.01)
    # two "contigs": two halves of the genome (mimics assembly output)
    contigs = [genome[:1600], genome[1500:]]
    return genome, contigs, reads


def test_validate_matches_oracle(world):
    _, contigs, reads = world
    k, band = 31, 15
    cat_o, idx_o = oracle_index(contigs, k)
    cat, uniq, pay = build_contig_index(contigs, k)
    assert np.array_equal(cat_o, cat)

    sub = reads[:96]
    L = 100
    bases = np.full((len(sub), L), 4, np.int32)
    lens = np.zeros(len(sub), np.int32)
    for i, r in enumerate(sub):
        bases[i, :len(r.bases)] = r.bases
        lens[i] = len(r.bases)
    # spice: a short read and an unalignable random read
    lens[3] = 20
    bases[3, 20:] = 4
    rng = np.random.default_rng(9)
    bases[5] = rng.integers(0, 4, L)

    cat_dev = jnp.asarray(cat.astype(np.int8))
    found, strand, pos, score = jax.jit(
        lambda b, l: validate_batch(cat_dev, uniq, pay, b, l, k, band))(
        jnp.asarray(bases), jnp.asarray(lens))
    found = np.asarray(found)
    strand = np.asarray(strand)
    pos = np.asarray(pos)
    score = np.asarray(score)

    n_aligned = 0
    for i in range(len(sub)):
        wf, ws, wp, wsc = validate_read(bases[i, :lens[i]], cat_o, idx_o,
                                        k, band)
        assert bool(found[i]) == wf, i
        assert int(strand[i]) == ws, i
        assert int(pos[i]) == wp, i
        assert int(score[i]) == wsc, i
        n_aligned += int(wf)
    assert n_aligned > 80, "most reads should seed-align"
    assert (np.asarray(strand)[found] == 1).any(), \
        "test should cover reverse-strand reads"


def test_align_stage_cli(world, tmp_path):
    _, contigs, reads = world
    from kmerax.io.fasta import write_fasta
    from kmerax.cli import main

    _BASES = "ACGT"
    write_fasta(str(tmp_path / "contigs.fasta"),
                ["".join(_BASES[b] for b in c) for c in contigs])
    (tmp_path / "reads.fastq").write_bytes(make_fastq(reads[:256]))
    rc = main(["align", "-k", "31", "--batch-reads", "128",
               "--max-read-len", "100",
               "--in", str(tmp_path / "reads.fastq"),
               "--contigs", str(tmp_path / "contigs.fasta"),
               "--out", str(tmp_path / "aln.tsv")])
    lines = (tmp_path / "aln.tsv").read_text().strip().split("\n")
    assert len(lines) == 256
    fields = lines[0].split("\t")
    assert len(fields) == 6
    aligned = sum(int(l.split("\t")[1]) for l in lines)
    assert aligned > 200
