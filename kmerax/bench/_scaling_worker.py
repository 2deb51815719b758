"""Worker for the multi-host scaling bench (kmerax/bench/scaling.py).

One process = one emulated host with D fake CPU devices. Each host
simulates and streams ITS OWN read shard (multi-host streamed input,
BASELINE.json:5), the spectrum is bucket-sharded over the global mesh, and
host 0 reports timed steady-state count throughput as one JSON line.

argv: coordinator nprocs pid devices_per_host n_batches batch_reads_per_host
"""

import json
import os
import sys
import time


def main():
    (coordinator, nprocs, pid, dph, n_batches, batch_per_host) = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        int(sys.argv[5]), int(sys.argv[6]))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dph}")
    os.environ["KMERAX_PROCESS_INDEX"] = str(pid)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        jax.distributed.initialize(coordinator, nprocs, pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from kmerax.config import KmeraxConfig
    from kmerax.dist.mesh import MeshSpec, make_mesh, local_batch_slice
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.sharded import (
        ShardedParams, make_sharded_state, sharded_insert_step,
    )

    n_dev = nprocs * dph
    read_len = 150
    k = 31
    # mesh: data axis = hosts (DP over read shards), bucket axis = chips
    # within a host (TP over spectrum segments) — DCN-shaped traffic rides
    # "data", ICI-shaped rides "bucket", matching the production layout.
    mesh = make_mesh(MeshSpec(nprocs, dph))
    cfg = KmeraxConfig(k=k, bloom_log2_width=20,
                       mesh_data=nprocs, mesh_bucket=dph)
    sp = ShardedParams(_bloom_params(cfg, k), n_shards=dph)
    table, _ = make_sharded_state(sp, mesh, None, k)
    step = sharded_insert_step(sp, mesh, k, None)

    # per-host deterministic read shard (weak scaling: work/host constant)
    rng = np.random.default_rng(1000 + pid)
    genome = rng.integers(0, 4, 1 << 17).astype(np.uint8)
    B_global = batch_per_host * nprocs
    sharding = NamedSharding(mesh, P(("data", "bucket")))

    def make_batch(seed):
        r = np.random.default_rng(seed * 7919 + pid)
        starts = r.integers(0, len(genome) - read_len, batch_per_host)
        reads = genome[starts[:, None] + np.arange(read_len)[None, :]]
        return reads.astype(np.int32)

    sl = local_batch_slice(mesh, B_global)
    batches = [jax.make_array_from_process_local_data(
        sharding, make_batch(s), global_shape=(B_global, read_len))
        for s in range(3)]

    # warmup (compile)
    table, _, nk, _ = step(table, None, batches[0])
    int(nk)
    t0 = time.perf_counter()
    total = 0
    for i in range(n_batches):
        table, _, nk, _ = step(table, None, batches[i % 3])
        total += int(nk)      # readback = host-side sync each step
    dt = time.perf_counter() - t0

    reads_s = B_global * n_batches / dt
    kmers_s = total / dt
    if pid == 0:
        print("SCALING_RESULT " + json.dumps({
            "hosts": nprocs, "devices": n_dev,
            "reads_per_s": round(reads_s, 1),
            "kmers_per_s": round(kmers_s, 1),
            "wall_s": round(dt, 4)}), flush=True)
    if nprocs > 1:
        jax.distributed.shutdown()
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
