"""Byte-range per-host sharding, 2 jax.distributed processes, ONE input
FASTQ: disjoint parse logs + byte-identical corrected output (round-3
VERDICT task 7 done-criterion)."""

import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_single_file_byte_identical(tmp_path):
    from sim import ecoli_like, make_fastq

    _, reads = ecoli_like(seed=41, genome_len=3000, coverage=30,
                          read_len=100, error_rate=0.01)
    f1 = tmp_path / "reads.fastq"
    f1.write_bytes(make_fastq(reads))

    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_mp_byterange_worker.py")
    coord = f"localhost:{_free_port()}"
    outdir = tmp_path / "out"
    outdir.mkdir()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), str(outdir),
         str(f1)],
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

    # disjoint parsing: each worker parses exactly ONE byte shard of the
    # single file for count and owns exactly one output part
    for pid, out in enumerate(outs):
        assert "parses 1 shards of 1 files" in out, out[-2000:]
        assert "owns 1/2 shards" in out, out[-2000:]

    # single-process reference through the same entry point
    from kmerax.config import KmeraxConfig
    from kmerax.pipeline import run_pipeline

    cfg = KmeraxConfig(k=31, bloom_log2_width=16, batch_reads=512,
                       max_read_len=100, exact_capacity=1 << 16)
    ref = tmp_path / "ref.fastq"
    run_pipeline(cfg, [str(f1)], str(ref))

    assert (outdir / "corrected.fastq").read_bytes() == ref.read_bytes()
