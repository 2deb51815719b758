"""Assembly scale contract (round-3 VERDICT Missing #4): device memory is
bounded by the edge-discovery partition — pointer doubling runs host-side
(chains_from_edges_np) and is bit-equal to the device path."""

import numpy as np
import jax
import pytest

import kmerax.graph.partitioned as gp
from kmerax.graph.build import build_edges
from kmerax.graph.unitig import chains_from_edges, chains_from_edges_np
from kmerax.spectrum.host import HostSpectrum


def _spectrum_from_genome(seed, glen, k=31):
    import jax.numpy as jnp
    from kmerax.core.codec import canonical_words
    from kmerax.core.kmers import extract_kmers
    from kmerax.spectrum.exact import np_merge_counted

    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, glen).astype(np.int32)
    words, valid = extract_kmers(jnp.asarray(g[None]), k)
    canon, _ = canonical_words(words, k)
    rows = np.asarray(canon)[0][np.asarray(valid)[0]]
    return np_merge_counted(rows, np.ones(len(rows), np.int64))


def test_chains_np_matches_device():
    import jax.numpy as jnp

    uniq, counts = _spectrum_from_genome(9, 3000)
    uniq_d = jnp.asarray(uniq)
    solid = counts >= 1
    edges = jax.jit(build_edges, static_argnums=2)(
        uniq_d, jnp.asarray(solid), 31)
    dev = jax.jit(chains_from_edges, static_argnums=3)(
        uniq_d, jnp.asarray(solid), edges, 31)
    edges_np = {k2: np.asarray(v) for k2, v in edges.items()}
    hst = chains_from_edges_np(uniq, solid, edges_np, 31)
    for key in ("end", "dist", "is_start", "was_cycle", "active",
                "last_base"):
        assert np.array_equal(np.asarray(dev[key]), hst[key]), key


def test_assemble_host_device_peak_bounded(monkeypatch):
    """The only device work in assemble_host is the per-partition
    extension batch: with partition_rows = P, no jnp array of more than P
    rows is ever created — the regime where the monolithic device chain
    arrays (O(2C) with C >> P) would blow HBM."""
    uniq, counts = _spectrum_from_genome(10, 6000)
    host = HostSpectrum(uniq, counts, 31)
    P = 256
    assert host.n_unique > 8 * P   # C >> partition

    seen = []
    real_ext = gp._extensions

    def spy(rows, k):
        seen.append(int(rows.shape[0]))
        return real_ext(rows, k)

    monkeypatch.setattr(gp, "_extensions", spy)
    seqs = gp.assemble_host(host, t=1, k=31, partition_rows=P)
    assert len(seqs) >= 1
    assert seen and max(seen) <= P, \
        f"device extension batch exceeded the partition bound: {max(seen)}"

    # identical output to the unbounded run
    ref = gp.assemble_host(host, t=1, k=31, partition_rows=1 << 20)
    assert seqs == ref
