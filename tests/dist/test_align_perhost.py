"""Per-host sharded align stage (round 5): 2 processes, one plain FASTQ in
byte-range shards — per-read TSV and stats identical to the single-process
run."""

import json
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


def test_two_process_align_matches_single(tmp_path):
    import numpy as np
    from sim import ecoli_like, make_fastq

    genome, reads = ecoli_like(seed=41, genome_len=3000, coverage=25,
                               read_len=100, error_rate=0.01)
    fq = tmp_path / "reads.fastq"
    fq.write_bytes(make_fastq(reads))

    # contigs: single-process assembly of the same reads
    from kmerax.config import KmeraxConfig
    from kmerax.graph.unitig import assemble_to_fasta
    from kmerax.pipeline.run import run_align, run_count

    cfg = KmeraxConfig(k=31, batch_reads=256, max_read_len=100,
                       bloom_log2_width=16, exact_capacity=1 << 16)
    state = run_count(cfg, [str(fq)])
    fa = tmp_path / "contigs.fasta"
    assemble_to_fasta(cfg, state, str(fa))

    ref_tsv = tmp_path / "ref.tsv"
    ref_stats = run_align(KmeraxConfig(k=31, batch_reads=256,
                                       max_read_len=100),
                          [str(fq)], str(fa), out_tsv=str(ref_tsv))

    here = os.path.dirname(__file__)
    worker = os.path.join(here, "_mp_align_worker.py")
    coord = f"localhost:{_free_port()}"
    tsv = tmp_path / "mp.tsv"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), str(fq), str(fa),
         str(tsv)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert "aligns" in out and "per-host" in out, \
            "per-host align sharding did not engage"

    stats = json.loads(outs[0].split("stats ", 1)[1].splitlines()[0])
    assert stats == ref_stats, (stats, ref_stats)
    assert tsv.read_bytes() == ref_tsv.read_bytes()
