"""Two-pass pipeline (k=31 -> k2=63) + crash/resume fault injection."""

import numpy as np
import pytest

from kmerax.config import KmeraxConfig
from kmerax.pipeline.twopass import run_two_pass
from sim import ecoli_like, make_fastq

CFG = dict(k=31, k2=63, bloom_log2_width=17, batch_reads=128,
           max_read_len=100, exact_capacity=1 << 17)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    _, reads = ecoli_like(seed=101, genome_len=1500, coverage=35,
                          read_len=100, error_rate=0.008)
    p = tmp_path_factory.mktemp("tp") / "reads.fastq"
    p.write_bytes(make_fastq(reads))
    return str(p), reads


def test_two_pass_end_to_end(dataset, tmp_path):
    path, reads = dataset
    cfg = KmeraxConfig(**CFG)
    fq, fa = tmp_path / "c.fastq", tmp_path / "u.fasta"
    result = run_two_pass(cfg, [path], str(fq), str(fa))
    assert result["reads"] == len(reads)
    assert result["unitigs"] >= 1
    assert result["threshold_k1"] >= 2 and result["threshold_k2"] >= 2
    seqs = [l for l in fa.read_text().splitlines() if not l.startswith(">")]
    assert max(len(s) for s in seqs) > 1100  # near-complete genome at k2=63


def test_crash_resume_bit_identical(dataset, tmp_path):
    """Kill after pass-1 count; resume must produce identical outputs
    (SURVEY.md §5 fault injection)."""
    path, _ = dataset
    cfg = KmeraxConfig(**CFG)

    # uninterrupted reference run
    fq0, fa0 = tmp_path / "r0.fastq", tmp_path / "r0.fasta"
    run_two_pass(cfg, [path], str(fq0), str(fa0))

    # interrupted run: monkeypatch correct to crash AFTER count_k1 checkpoint
    wd = tmp_path / "work"
    fq1, fa1 = tmp_path / "r1.fastq", tmp_path / "r1.fasta"
    import kmerax.pipeline.twopass as tp

    orig = tp.run_correct

    def boom(*a, **kw):
        raise RuntimeError("injected host failure")

    tp.run_correct = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            run_two_pass(cfg, [path], str(fq1), str(fa1), workdir=str(wd))
    finally:
        tp.run_correct = orig
    assert (wd / "count_k1.done").exists()
    assert not fq1.exists()

    # resume: count_k1 must come from checkpoint, everything completes
    result = run_two_pass(cfg, [path], str(fq1), str(fa1), workdir=str(wd))
    assert fq1.read_bytes() == fq0.read_bytes()
    assert fa1.read_bytes() == fa0.read_bytes()

    # third run resumes everything (idempotent) and changes nothing
    before = fq1.read_bytes()
    run_two_pass(cfg, [path], str(fq1), str(fa1), workdir=str(wd))
    assert fq1.read_bytes() == before
