"""Key-range-sharded host spectrum + multi-process partitioned assembly
(round-3 VERDICT Missing #4/#5 done-criteria): 2 processes, per-process
resident rows ~ 1/2 of global, FASTA bytes unchanged vs the single-process
run, edge-discovery work split across processes."""

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


def test_two_process_sharded_spectrum_assembly(tmp_path):
    from sim import ecoli_like, make_fastq

    _, reads = ecoli_like(seed=55, genome_len=4000, coverage=30,
                          read_len=100, error_rate=0.01)
    fq = tmp_path / "reads.fastq"
    fq.write_bytes(make_fastq(reads))

    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_mp_shardspec_worker.py")
    coord = f"localhost:{_free_port()}"
    outdir = tmp_path / "out"
    outdir.mkdir()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), str(outdir),
         str(fq)],
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

    # single-process reference: same config (minus sharding), same stages
    from kmerax.config import KmeraxConfig
    from kmerax.graph.unitig import assemble_to_fasta
    from kmerax.pipeline.run import run_count

    cfg = KmeraxConfig(k=31, bloom_log2_width=16, batch_reads=512,
                       max_read_len=100, exact_capacity=1 << 16)
    state = run_count(cfg, [str(fq)])
    ref = tmp_path / "ref.fasta"
    assemble_to_fasta(cfg, state, str(ref))

    got = (outdir / "contigs.fasta").read_bytes()
    assert got == ref.read_bytes()

    # per-process residency ~1/2 (asserted in-worker; echoed here)
    for out in outs:
        assert "resident" in out
