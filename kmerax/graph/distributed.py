"""Distributed dBG edge construction over the device mesh (SURVEY.md §2
parallelism table, SP/CP row: the graph stage sharded across devices).

Node rows are split across every mesh device (both axes flattened); each
device runs the eight batched binary searches for its row shard against the
replicated spectrum, then per-shard out-degrees/successors are all-gathered
— the "batched collective joins" of BASELINE.json:5 — so the unitig-internal
rule can see target degrees across shards. Pointer doubling then runs
replicated (its cost is log N gathers, negligible next to edge building).

A ring/ppermute halo-exchange variant (exchanging only boundary k-mers) is
the bandwidth-optimal evolution for graphs whose edge tables exceed
replication budgets; the all-gather join is the correct first target for
v5e-16-scale graphs (SURVEY.md §5 long-context analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from kmerax.dist.mesh import AXIS_BUCKET, AXIS_DATA
from kmerax.graph.build import build_edges, finalize_internal
from kmerax.graph.unitig import chains_from_edges

_AXES = (AXIS_DATA, AXIS_BUCKET)


def distributed_unitig_arrays(mesh, uniq, solid, k: int):
    """unitig_arrays, with edge discovery sharded over every mesh device.

    uniq (C, W) and solid (C,) are replicated; C must divide by the device
    count (sentinel-pad the spectrum — padding rows are never solid).
    Returns the same (replicated) arrays as kmerax.graph.unitig_arrays.
    """
    C = uniq.shape[0]
    n_dev = mesh.devices.size
    if C % n_dev != 0:
        raise ValueError(f"spectrum capacity {C} must divide by {n_dev} "
                         f"devices (pad with sentinels)")
    per = C // n_dev
    S = mesh.shape[AXIS_BUCKET]

    def inner(uniq, solid):
        i = jax.lax.axis_index(AXIS_DATA) * S + jax.lax.axis_index(AXIS_BUCKET)
        rows = i * per + jnp.arange(per, dtype=jnp.int32)
        e = build_edges(uniq, solid, k, rows)
        # collective join: assemble the full degree/successor tables
        outdeg_full = jax.lax.all_gather(
            e["outdeg"], _AXES, axis=0, tiled=True)          # (C, 2)
        internal_local = finalize_internal(
            e["outdeg"], outdeg_full, e["succ_v"], e["succ_o"],
            rows, solid[rows])
        succ_v = jax.lax.all_gather(e["succ_v"], _AXES, axis=0, tiled=True)
        succ_o = jax.lax.all_gather(e["succ_o"], _AXES, axis=0, tiled=True)
        internal = jax.lax.all_gather(internal_local, _AXES, axis=0,
                                      tiled=True)
        return outdeg_full, succ_v, succ_o, internal

    sm = shard_map(
        inner, mesh=mesh, in_specs=(P(None, None), P(None)),
        out_specs=(P(None, None),) * 4, check_vma=False)

    outdeg, succ_v, succ_o, internal = jax.jit(sm)(uniq, solid)
    edges = {"succ_v": succ_v, "succ_o": succ_o,
             "outdeg": outdeg, "internal": internal}
    arrays = jax.jit(chains_from_edges, static_argnums=3)(
        uniq, solid, edges, k)
    return arrays
