"""Per-host input sharding (SURVEY.md §1 L1): 2 jax.distributed processes,
2 input files — each process parses and writes ONLY its own file shard,
and the outputs are byte-identical to the single-process run."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_perhost_byte_identical(tmp_path):
    from sim import make_fastq, random_genome, simulate_pairs
    import numpy as np

    rng = np.random.default_rng(31)
    genome = random_genome(rng, 3000)
    r1, r2 = simulate_pairs(genome, 600, 100, 0.01, seed=32,
                            insert_mean=280, insert_sd=20)
    f1, f2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    f1.write_bytes(make_fastq(r1))
    f2.write_bytes(make_fastq(r2))

    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_mp_perhost_worker.py")
    coord = f"localhost:{_free_port()}"
    outdir = tmp_path / "out"
    outdir.mkdir()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), str(outdir),
         str(f1), str(f2)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid} OK" in out

    # disjoint parsing: each worker's per-host log names exactly ONE of the
    # two input files for count, and owns exactly one output file
    for pid, out in enumerate(outs):
        assert "count[per-host]" in out, out[-2000:]
        assert "parses 1 shards of 2 files" in out
        assert "correct[per-host]" in out
        assert "owns 1/2 shards" in out
    # between them, both inputs were parsed
    joined = outs[0] + outs[1]
    assert "r1.fastq" in joined and "r2.fastq" in joined

    # single-process reference, same config, through the same entry point
    import jax
    from kmerax.config import KmeraxConfig
    from kmerax.pipeline import run_pipeline

    cfg = KmeraxConfig(k=31, bloom_log2_width=16, batch_reads=512,
                       max_read_len=100, exact_capacity=1 << 16)
    ref1, ref2 = tmp_path / "ref1.fastq", tmp_path / "ref2.fastq"
    run_pipeline(cfg, [str(f1), str(f2)], [str(ref1), str(ref2)])

    assert (outdir / "corrected_1.fastq").read_bytes() == ref1.read_bytes()
    assert (outdir / "corrected_2.fastq").read_bytes() == ref2.read_bytes()
