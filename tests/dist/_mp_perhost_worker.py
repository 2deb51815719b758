"""Worker: per-host input sharding through the production pipeline
(SURVEY.md §1 L1; round-2 VERDICT Missing #4 + Weak #7).

2 processes x 4 fake CPU devices, TWO input files (paired-end R1/R2):
each process must parse ONLY its own file shard during count (lockstep
global batches assembled from per-host local rows) and correct+write ONLY
its own files on its local devices (no cross-host gather of corrected
rows). Output must be byte-identical to the single-process run."""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir, f1, f2 = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import logging

    logging.getLogger("kmerax").setLevel(logging.INFO)
    from kmerax.cli import main as cli_main

    rc = cli_main([
        "pipeline", "-k", "31", "--bloom-log2-width", "16",
        "--batch-reads", "512", "--max-read-len", "100",
        "--exact-capacity", str(1 << 16),
        "--mesh-data", "2", "--mesh-bucket", "4",
        "--coordinator", coordinator, "--num-procs", str(nprocs),
        "--process-id", str(pid),
        "--in", f1, f2,
        "--out-fastq", os.path.join(outdir, "corrected_1.fastq"),
        os.path.join(outdir, "corrected_2.fastq"),
    ])
    assert jax.device_count() == 8, jax.device_count()

    # prove disjoint parsing: the per-host branches log which files this
    # process touched; surface them for the test to assert on
    jax.distributed.shutdown()
    print(f"worker {pid} OK rc={rc}", flush=True)


if __name__ == "__main__":
    main()
