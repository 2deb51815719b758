"""Worker for the 2-process (emulated 2-host) distributed count test.

Each process owns 4 fake CPU devices (8 global = 2x4 mesh), reads its own
half of the batch (multi-host streamed input, BASELINE.json:5), routes
k-mers over the full mesh, and process 0 writes the merged global table.
"""

import os
import sys


def main():
    coordinator, nprocs, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["KMERAX_PROCESS_INDEX"] = str(pid)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nprocs, pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from kmerax.config import KmeraxConfig
    from kmerax.dist.mesh import MeshSpec, make_mesh, local_batch_slice
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.sharded import (
        ShardedParams, make_sharded_state, merge_and_replicate,
        sharded_insert_step,
    )
    from sim import ecoli_like

    cfg = KmeraxConfig(k=31, bloom_log2_width=16, mesh_data=2, mesh_bucket=4)
    mesh = make_mesh(MeshSpec(2, 4))
    sp = ShardedParams(_bloom_params(cfg, 31), n_shards=4)
    table, _ = make_sharded_state(sp, mesh, None, 31)
    step = sharded_insert_step(sp, mesh, 31, None)

    # deterministic dataset; THIS process materializes only its own half
    _, reads = ecoli_like(seed=202, genome_len=1000, coverage=20,
                          read_len=100, error_rate=0.01)
    n = (len(reads) // 8) * 8
    bases = np.stack([r.bases for r in reads[:n]]).astype(np.int32)
    sl = local_batch_slice(mesh, n)
    sharding = NamedSharding(mesh, P(("data", "bucket")))
    b_global = jax.make_array_from_process_local_data(
        sharding, bases[sl], global_shape=bases.shape)

    table, _, nk, ovf = step(table, None, b_global)
    assert int(ovf) == 0
    merged = merge_and_replicate(mesh)(table)
    if pid == 0:
        np.savez(os.path.join(outdir, "mp_result.npz"),
                 table=np.asarray(merged), nk=int(nk), n_reads=n)
    # all processes must finish cleanly
    jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
