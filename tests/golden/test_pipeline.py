"""Golden end-to-end: pipeline corrected FASTQ bit-identical to oracle's."""

import io
import json

import numpy as np
import pytest

import oracle
from kmerax.config import KmeraxConfig
from kmerax.pipeline import run_count, run_correct, run_pipeline
from sim import ecoli_like, make_fastq

CFG = dict(k=31, bloom_log2_width=18, bloom_hashes=4, batch_reads=128,
           max_read_len=100, exact_capacity=1 << 17)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    _, reads = ecoli_like(seed=55, genome_len=1500, coverage=30,
                          read_len=100, error_rate=0.008)
    p = tmp_path_factory.mktemp("pipe") / "reads.fastq"
    p.write_bytes(make_fastq(reads))
    return str(p), reads


def _oracle_corrected_fastq(reads, k, lw, d, t):
    obl = oracle.CountingBloomOracle(k, log2_width=lw, num_hashes=d)
    obl.add_reads([r.bases for r in reads])
    buf = io.BytesIO()
    for r in reads:
        fixed = oracle.correct_read(r.bases, k, t, obl.query)
        buf.write(f"@{r.name}\n{oracle.bases_to_seq(fixed)}\n+\n{r.qual}\n"
                  .encode())
    return buf.getvalue()


def test_pipeline_bitidentical_to_oracle(dataset, tmp_path):
    path, reads = dataset
    cfg = KmeraxConfig(**CFG)
    out = tmp_path / "corrected.fastq"

    state = run_count(cfg, [path])
    # threshold must match the oracle's auto threshold on the exact histogram
    osp = oracle.ExactSpectrum(cfg.k)
    osp.add_reads([r.bases for r in reads])
    ot = oracle.auto_threshold(oracle.histogram_of(osp.sorted_items()[1]))
    assert state.threshold == ot

    run_correct(cfg, [path], state, str(out))
    want = _oracle_corrected_fastq(reads, cfg.k, cfg.bloom_log2_width,
                                   cfg.bloom_hashes, state.threshold)
    got = out.read_bytes()
    assert got == want, "corrected FASTQ must be bit-identical to oracle"


def test_pipeline_api(dataset, tmp_path):
    path, reads = dataset
    cfg = KmeraxConfig(**CFG)
    out = tmp_path / "c.fastq"
    result = run_pipeline(cfg, [path], str(out))
    assert result["reads"] == len(reads)
    assert result["edited_reads"] > len(reads) * 0.3
    assert out.exists()


def test_cli_count_correct_and_checkpoint(dataset, tmp_path):
    """CLI surface + spectrum checkpoint resume (SURVEY.md §5)."""
    from kmerax.cli import main
    path, reads = dataset
    spec = tmp_path / "spec"
    out1 = tmp_path / "c1.fastq"
    out2 = tmp_path / "c2.fastq"
    args = ["-k", "31", "--bloom-log2-width", "18", "--batch-reads", "128",
            "--max-read-len", "100", "--exact-capacity", str(1 << 17)]
    assert main(["count", "--in", path, "--out", str(spec)] + args) == 0
    assert (spec / "manifest.json").exists()
    m = json.loads((spec / "manifest.json").read_text())
    assert m["status"] == "complete" and m["threshold"] >= 2
    # correct from checkpointed spectrum == correct with fresh count
    assert main(["correct", "--in", path, "--spectrum", str(spec),
                 "--out", str(out1)] + args) == 0
    assert main(["correct", "--in", path, "--out", str(out2)] + args) == 0
    assert out1.read_bytes() == out2.read_bytes()
