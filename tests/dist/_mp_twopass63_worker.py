"""Worker: config-5-shaped two-pass pipeline under jax.distributed —
k=31 count+correct, then k=63 re-count of the corrected reads + assembly —
through the DEFAULT multi-host memory model (auto range-sharded host
spectrum, k=63 via two-uint64 range keys) and the distributed assembly.
Outputs must be byte-identical to the single-process two-pass run."""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir, fq = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nprocs, pid)
    assert jax.device_count() == 8

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from kmerax.config import KmeraxConfig
    from kmerax.pipeline.twopass import run_two_pass
    from kmerax.spectrum.host_sharded import ShardedHostSpectrum
    import kmerax.pipeline.twopass as tp

    cfg = KmeraxConfig(k=31, k2=63, bloom_log2_width=16, batch_reads=512,
                       max_read_len=100, exact_capacity=1 << 16,
                       mesh_data=2, mesh_bucket=4)
    res = run_two_pass(cfg, [fq],
                       os.path.join(outdir, "corrected.fastq"),
                       out_fasta=os.path.join(outdir, "contigs.fasta"),
                       workdir=os.path.join(outdir, "work"))
    print(f"worker {pid} result {res}", flush=True)
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
