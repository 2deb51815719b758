"""Golden: host-partitioned assembly (graph/partitioned.py) bit-identical
to the monolithic device path and to the oracle, and the host-resident
spectrum pipeline (exact spectrum past device capacity) end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from kmerax.config import KmeraxConfig
from kmerax.core import canonical_words, extract_kmers
from kmerax.graph.partitioned import assemble_host, solid_edges_host
from kmerax.graph.unitig import emit_unitigs, unitig_arrays
from kmerax.spectrum.exact import mask_invalid, sort_kmers, unique_counts
from kmerax.spectrum.host import HostSpectrum

from sim import ecoli_like, make_fastq, random_genome


def _host_spectrum(reads, k):
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

    uniq, counts, n = run(jnp.asarray(padded))
    n = int(n)
    return (HostSpectrum(np.asarray(uniq)[:n],
                         np.asarray(counts)[:n].astype(np.int64), k),
            (uniq, counts, n))


@pytest.mark.parametrize("k", [25, 31, 63])
@pytest.mark.parametrize("part", [1 << 20, 64])   # incl. tiny partitions
def test_partitioned_matches_device(k, part):
    rng = np.random.default_rng(k * 7 + part)
    genomes = [random_genome(rng, 420), random_genome(rng, 300)]
    reads = []
    for g in genomes:
        reads += [g[i:i + 80] for i in range(0, len(g) - 80, 3)] + [g[-80:]]
    host, (uniq, counts, n) = _host_spectrum(reads, k)

    got = assemble_host(host, t=1, k=k, partition_rows=part)

    arrays = jax.jit(unitig_arrays, static_argnums=2)(
        uniq, counts >= 1, k)
    want = emit_unitigs(np.asarray(uniq), arrays, k)
    assert got == want


def test_partitioned_matches_oracle():
    rng = np.random.default_rng(5)
    g = random_genome(rng, 500)
    reads = [g[i:i + 60] for i in range(0, 441, 2)] + [g[-60:]]
    junk = [random_genome(rng, 60) for _ in range(3)]
    host, _ = _host_spectrum(reads * 2 + junk, k=31)
    got = assemble_host(host, t=2, k=31)

    sp = oracle.ExactSpectrum(31)
    sp.add_reads(reads * 2 + junk)
    nodes, idx = oracle.build_graph(sp, 2)
    want = oracle.unitigs_of(nodes, idx, 31)
    assert got == want


def test_internal_rule_matches_build_edges():
    """solid_edges_host must replicate build_edges on the solid subset."""
    from kmerax.graph.build import build_edges

    rng = np.random.default_rng(17)
    g = random_genome(rng, 400)
    reads = [g[i:i + 70] for i in range(0, len(g) - 70, 2)] + [g[-70:]]
    host, (uniq, counts, n) = _host_spectrum(reads, 31)
    t = 1
    sidx = host.solid_indices(t)
    suniq = host.uniq[sidx]

    got = solid_edges_host(suniq, 31, partition_rows=50)

    want = jax.jit(build_edges, static_argnums=2)(
        jnp.asarray(suniq), jnp.ones(len(suniq), dtype=bool), 31)
    for key in ("succ_v", "succ_o", "outdeg", "internal"):
        np.testing.assert_array_equal(
            got[key], np.asarray(want[key]), err_msg=key)


def test_pipeline_host_resident_spectrum(tmp_path):
    """exact_capacity smaller than the distinct count: the spectrum stays
    host-resident (no RuntimeError) and assembly still works, byte-identical
    to the device-capacity run."""
    from kmerax.io.fasta import read_fasta
    from kmerax.pipeline import run_pipeline

    _, reads = ecoli_like(seed=66, genome_len=1200, coverage=30,
                          read_len=100, error_rate=0.005)
    p = tmp_path / "r.fastq"
    p.write_bytes(make_fastq(reads))
    outs = {}
    for tag, cap in (("small", 1 << 9), ("big", 1 << 17)):
        cfg = KmeraxConfig(k=31, bloom_log2_width=18, batch_reads=128,
                           max_read_len=100, exact_capacity=cap)
        out_fq = tmp_path / f"c_{tag}.fastq"
        out_fa = tmp_path / f"u_{tag}.fasta"
        result = run_pipeline(cfg, [str(p)], str(out_fq), str(out_fa))
        assert result["unitigs"] >= 1
        outs[tag] = (out_fq.read_bytes(), out_fa.read_bytes())
    # capacity (a flush-cadence knob now) must not change any output byte
    assert outs["small"] == outs["big"]


def test_host_spectrum_lookup_and_histogram():
    rng = np.random.default_rng(3)
    g = random_genome(rng, 300)
    reads = [g[i:i + 80] for i in range(0, 221, 1)]
    for k in (31, 63):
        host, (uniq, counts, n) = _host_spectrum(reads, k)
        # lookup of every stored row returns its count
        got, found = host.lookup(host.uniq)
        assert found.all()
        np.testing.assert_array_equal(got, host.counts)
        # missing rows are not found
        missing = np.asarray(host.uniq).copy()
        missing[:, 0] ^= np.uint32(0x5555)
        _, f2 = host.lookup(missing)
        keys = {tuple(r) for r in host.uniq.tolist()}
        expect = np.array([tuple(r) in keys for r in missing.tolist()])
        np.testing.assert_array_equal(f2, expect)
        # histogram matches the device one on real bins
        from kmerax.spectrum.histogram import count_histogram
        dev = np.asarray(count_histogram(jnp.asarray(
            np.clip(host.counts, 0, 2**31 - 1).astype(np.int32))))
        hst = host.histogram(255)
        np.testing.assert_array_equal(hst[1:256], dev[1:256])
