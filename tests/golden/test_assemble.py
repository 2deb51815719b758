"""Golden: kmerax.graph unitigs bit-identical to oracle assembler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from kmerax.config import KmeraxConfig
from kmerax.core import canonical_words, extract_kmers
from kmerax.graph import assemble_to_fasta, unitig_arrays
from kmerax.graph.unitig import emit_unitigs
from kmerax.io.fasta import read_fasta
from kmerax.spectrum.exact import mask_invalid, sort_kmers, unique_counts

from sim import random_genome, revcomp_bases


def _spectrum_device(reads, k, cap=1 << 16):
    B = max(len(r) for r in reads)
    padded = np.full((len(reads), B), 4, dtype=np.int32)
    for i, r in enumerate(reads):
        padded[i, :len(r)] = r

    @jax.jit
    def run(b):
        words, valid = extract_kmers(b, k)
        canon, _ = canonical_words(words, k)
        flat = mask_invalid(canon, valid).reshape(-1, canon.shape[-1])
        return unique_counts(sort_kmers(flat))

    return run(jnp.asarray(padded))


def _assemble_device(reads, k, t):
    uniq, counts, n = _spectrum_device(reads, k)
    arrays = jax.jit(unitig_arrays, static_argnums=2)(uniq, counts >= t, k)
    return emit_unitigs(np.asarray(uniq), arrays, k)


def _assemble_oracle(reads, k, t):
    sp = oracle.ExactSpectrum(k)
    sp.add_reads(reads)
    nodes, idx = oracle.build_graph(sp, t)
    return oracle.unitigs_of(nodes, idx, k)


CASES = {
    "linear": lambda rng: [random_genome(rng, 400)],
    "branching": lambda rng: _branching(rng),
    "circular": lambda rng: _circular(rng),
    "two_contigs": lambda rng: [random_genome(rng, 300),
                                random_genome(rng, 250)],
}


def _branching(rng):
    a, b = random_genome(rng, 150), random_genome(rng, 150)
    shared = random_genome(rng, 50)
    c, d = random_genome(rng, 150), random_genome(rng, 150)
    return [np.concatenate([a, shared, c]), np.concatenate([b, shared, d])]


def _circular(rng):
    g = random_genome(rng, 300)
    return [np.concatenate([g, g[:80]])]  # reads will wrap the junction


@pytest.mark.parametrize("case", list(CASES))
@pytest.mark.parametrize("k", [25, 31])
def test_unitigs_match_oracle(case, k):
    rng = np.random.default_rng(hash((case, k)) % (2 ** 31))
    genomes = CASES[case](rng)
    reads = []
    for g in genomes:
        reads += [g[i:i + 60] for i in range(0, len(g) - 60, 3)] + [g[-60:]]
    got = _assemble_device(reads, k, t=1)
    want = _assemble_oracle(reads, k, t=1)
    assert got == want, f"{case}: {len(got)} vs {len(want)} unitigs"


def test_threshold_filters_error_kmers():
    rng = np.random.default_rng(99)
    g = random_genome(rng, 500)
    reads = [g[i:i + 60] for i in range(0, 441, 2)] + [g[-60:]]
    # add junk reads that would create spurious nodes at t=1
    junk = [random_genome(rng, 60) for _ in range(3)]
    got = _assemble_device(reads * 2 + junk, k=31, t=2)
    want = _assemble_oracle(reads * 2 + junk, k=31, t=2)
    assert got == want
    assert len(got) == 1  # junk filtered, genome intact


def test_assemble_to_fasta_pipeline(tmp_path):
    from kmerax.pipeline import run_pipeline
    from sim import ecoli_like, make_fastq
    _, reads = ecoli_like(seed=66, genome_len=1200, coverage=30,
                          read_len=100, error_rate=0.005)
    p = tmp_path / "r.fastq"
    p.write_bytes(make_fastq(reads))
    cfg = KmeraxConfig(k=31, bloom_log2_width=18, batch_reads=128,
                       max_read_len=100, exact_capacity=1 << 17)
    out_fq, out_fa = tmp_path / "c.fastq", tmp_path / "u.fasta"
    result = run_pipeline(cfg, [str(p)], str(out_fq), str(out_fa))
    assert result["unitigs"] >= 1
    recs = read_fasta(str(out_fa))
    assert len(recs) == result["unitigs"]
    # the largest unitig should cover most of the genome
    assert max(len(s) for _, s in recs) > 900
