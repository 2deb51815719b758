"""Distributed dBG edge building: identical unitigs vs single-device path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmerax.dist.mesh import MeshSpec, make_mesh
from kmerax.core import canonical_words, extract_kmers
from kmerax.graph import unitig_arrays
from kmerax.graph.distributed import distributed_unitig_arrays
from kmerax.graph.unitig import emit_unitigs
from kmerax.spectrum.exact import mask_invalid, sort_kmers, unique_counts

from sim import random_genome


def _spectrum(reads, k, cap):
    L = max(len(r) for r in reads)
    padded = np.full((len(reads), L), 4, dtype=np.int32)
    for i, r in enumerate(reads):
        padded[i, :len(r)] = r

    @jax.jit
    def run(b):
        words, valid = extract_kmers(b, k)
        canon, _ = canonical_words(words, k)
        flat = mask_invalid(canon, valid).reshape(-1, canon.shape[-1])
        u, c, n = unique_counts(sort_kmers(flat))
        return u[:cap], c[:cap], n

    return run(jnp.asarray(padded))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_distributed_matches_single(mesh_shape):
    rng = np.random.default_rng(606)
    k = 25
    g1 = random_genome(rng, 400)
    g2 = np.concatenate([g1[:150], random_genome(rng, 250)])  # branchy
    circ = random_genome(rng, 200)
    reads = []
    for g in (g1, g2, np.concatenate([circ, circ[:60]])):
        reads += [g[i:i + 60] for i in range(0, len(g) - 60, 3)] + [g[-60:]]
    cap = 2048  # divisible by 8
    uniq, counts, n = _spectrum(reads, k, cap)
    solid = counts >= 1

    single = jax.jit(unitig_arrays, static_argnums=2)(uniq, solid, k)
    mesh = make_mesh(MeshSpec(*mesh_shape))
    dist = distributed_unitig_arrays(mesh, uniq, solid, k)

    for key in ("end", "dist", "is_start", "was_cycle", "active",
                "last_base", "outdeg", "internal"):
        assert np.array_equal(np.asarray(single[key]), np.asarray(dist[key])), \
            f"{key} differs on mesh {mesh_shape}"
    u1 = emit_unitigs(np.asarray(uniq), single, k)
    u2 = emit_unitigs(np.asarray(uniq), dist, k)
    assert u1 == u2 and len(u1) >= 2
