"""Worker: per-host sharded run_align — each process aligns only its own
byte-range shard of one plain FASTQ; stats allgather-sum and rank 0
concatenates the per-shard TSV parts in original read order."""

import os
import sys


def main():
    coordinator, nprocs, pid, fq, fa, tsv = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5], sys.argv[6])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nprocs, pid)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import json

    from kmerax.config import KmeraxConfig
    from kmerax.pipeline.run import run_align

    cfg = KmeraxConfig(k=31, batch_reads=256, max_read_len=100)
    stats = run_align(cfg, [fq], fa, out_tsv=tsv)
    print(f"worker {pid} stats {json.dumps(stats)}", flush=True)
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
