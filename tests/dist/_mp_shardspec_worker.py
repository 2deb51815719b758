"""Worker: key-range-sharded host spectrum through the production pipeline
(round-3 VERDICT Missing #5). 2 processes x 4 fake CPU devices; count with
shard_host_spectrum=True, assert ~1/2 resident rows per process, then
assemble to FASTA (gathered solid set, split edge discovery, host
pointer-doubling) — process 0's FASTA must match the single-process run."""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir, fq = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
        sys.argv[5])
    k = int(sys.argv[6]) if len(sys.argv) > 6 else 31
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["KMERAX_PROCESS_INDEX"] = str(pid)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nprocs, pid)
    assert jax.device_count() == 4 * nprocs

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from kmerax.config import KmeraxConfig
    from kmerax.graph.unitig import assemble_to_fasta
    from kmerax.pipeline.run import run_count
    from kmerax.spectrum.host_sharded import ShardedHostSpectrum

    cfg = KmeraxConfig(k=k, bloom_log2_width=16,
                       batch_reads=512 * nprocs // 2,
                       max_read_len=100, exact_capacity=1 << 16,
                       mesh_data=nprocs, mesh_bucket=4,
                       shard_host_spectrum=True)
    state = run_count(cfg, [fq])
    host = state.host
    assert isinstance(host, ShardedHostSpectrum), type(host)
    n_local = host.n_unique_local
    n_global = host.n_unique
    frac = n_local / max(n_global, 1)
    print(f"worker {pid} resident {n_local}/{n_global} = {frac:.3f}")
    lo, hi = 0.5 / nprocs, 1.5 / nprocs
    assert lo <= frac <= hi, \
        f"range shard not balanced: {n_local}/{n_global}"

    # fully distributed assembly (round-5, graph/sharded.py): small
    # partitions + small chunks so the exchanges actually iterate
    import kmerax.graph.sharded as gs

    n_unitigs = gs.assemble_sharded(
        host, state.threshold, cfg.k,
        os.path.join(outdir, "contigs.fasta"),
        partition_rows=256, chunk=1 << 12)

    # scale contract (round-4 VERDICT task 2 done-criteria): per-process
    # peak SOLID rows and peak EDGE rows ~ 1/2 of global — nothing
    # O(global) resides on any process
    st = gs.LAST_STATS
    sfrac = st["peak_solid_rows"] / max(st["global_solid"], 1)
    efrac = st["peak_edge_rows"] / max(st["global_solid"], 1)
    print(f"worker {pid} assembly resident solid={sfrac:.3f} "
          f"edges={efrac:.3f} of {st['global_solid']}")
    assert lo <= sfrac <= hi, f"solid rows not sharded: {st}"
    assert lo <= efrac <= hi, f"edge rows not sharded: {st}"
    print(f"worker {pid} OK threshold={state.threshold} "
          f"unitigs={n_unitigs}")


if __name__ == "__main__":
    main()
