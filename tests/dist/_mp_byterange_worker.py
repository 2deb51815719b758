"""Worker: byte-range per-host sharding of ONE plain FASTQ through the
production pipeline (SURVEY.md §1 L1; round-3 VERDICT Weak #4 / task 7).

2 processes x 4 fake CPU devices, a single input file: each process must
parse only its own record-aligned byte range during count AND correct, and
the concatenated corrected output must be byte-identical to the
single-process run."""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir, f1 = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
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
        "--in", f1,
        "--out-fastq", os.path.join(outdir, "corrected.fastq"),
    ])
    assert jax.device_count() == 8, jax.device_count()
    assert rc in (0, None), rc
    print(f"worker {pid} OK")


if __name__ == "__main__":
    main()
