"""Worker: distributed assembly where one process's key range holds ZERO
solid rows (adversarial range skew) — the owner-serves closures must serve
zeros instead of indexing empty arrays, and the FASTA must still equal the
single-process result."""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir = (sys.argv[1], int(sys.argv[2]),
                                        int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nprocs, pid)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import numpy as np
    import jax.numpy as jnp

    from kmerax.core.codec import canonical_words
    from kmerax.core.kmers import extract_kmers
    from kmerax.graph.sharded import assemble_sharded
    from kmerax.spectrum.exact import np_merge_counted
    from kmerax.spectrum.host import HostSpectrum
    from kmerax.spectrum.host_sharded import ShardedHostSpectrum

    k = 31
    rng = np.random.default_rng(7)
    genome = rng.integers(0, 4, 1500).astype(np.int32)
    words, valid = extract_kmers(jnp.asarray(genome[None]), k)
    canon, _ = canonical_words(words, k)
    rows = np.asarray(canon[0])[np.asarray(valid[0])]
    uniq, counts = np_merge_counted(rows, np.ones(len(rows), np.int64))

    # process 0 owns EVERYTHING; process 1's range is empty
    if pid == 0:
        local = HostSpectrum(uniq, counts, k)
    else:
        local = HostSpectrum(np.zeros((0, 2), np.uint32),
                             np.zeros(0, np.int64), k)
    shost = ShardedHostSpectrum(local, k, nprocs, pid,
                                np.full(nprocs - 1,
                                        0xFFFFFFFFFFFFFFFF, np.uint64))
    out = os.path.join(outdir, "contigs.fasta")
    n = assemble_sharded(shost, 1, k, out, partition_rows=128,
                         chunk=1 << 10)
    print(f"worker {pid} OK unitigs={n}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
