"""Worker: the PRODUCTION `kmerax pipeline` CLI under jax.distributed.

2 processes x 4 fake CPU devices = a 2x4 ("data","bucket") mesh across two
emulated hosts (BASELINE.md config 4 shape): distributed count (a2a route +
psum/all-gather merge), mesh-sharded correction, assembly; process 0 writes
the corrected FASTQ + contig FASTA (SURVEY.md §3.4 "multi-host streamed
input pipeline").
"""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir, fastq = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from kmerax.cli import main as cli_main

    rc = cli_main([
        "pipeline", "-k", "31", "--bloom-log2-width", "16",
        "--batch-reads", "512", "--max-read-len", "100",
        "--exact-capacity", str(1 << 16),
        "--mesh-data", "2", "--mesh-bucket", "4",
        "--coordinator", coordinator, "--num-procs", str(nprocs),
        "--process-id", str(pid),
        "--in", fastq,
        "--out-fastq", os.path.join(outdir, "corrected.fastq"),
        "--out-fasta", os.path.join(outdir, "contigs.fasta"),
    ])
    assert jax.device_count() == 8, jax.device_count()
    jax.distributed.shutdown()
    print(f"worker {pid} OK rc={rc}", flush=True)


if __name__ == "__main__":
    main()
