"""Distributed spectrum tests on the 8-device fake-CPU mesh (SURVEY.md §4.3).

The key determinism contract (DESIGN.md §13): counts, threshold, and
corrected output are bit-identical across mesh shapes 1x1, 2x4, 4x2, 8x1.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

import oracle
from kmerax.config import KmeraxConfig
from kmerax.core import canonical_words, extract_kmers
from kmerax.dist.mesh import MeshSpec, make_mesh
from kmerax.pipeline import run_count, run_correct
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.sharded import (
    ShardedParams, make_sharded_state, merge_and_replicate,
    merge_keep_sharded, routed_query_fn, sharded_insert_step,
)
from sim import ecoli_like, make_fastq

CFG = dict(k=31, bloom_log2_width=16, batch_reads=128, max_read_len=100,
           exact_capacity=1 << 16)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    _, reads = ecoli_like(seed=88, genome_len=1200, coverage=25,
                          read_len=100, error_rate=0.01)
    p = tmp_path_factory.mktemp("dist") / "reads.fastq"
    p.write_bytes(make_fastq(reads))
    return str(p), reads


MESHES = [(1, 1), (2, 4), (4, 2), (8, 1), (1, 8)]


def test_count_mesh_invariance(dataset):
    path, reads = dataset
    tables, thresholds, exacts = [], [], []
    for (d, s) in MESHES:
        cfg = KmeraxConfig(mesh_data=d, mesh_bucket=s, **CFG)
        state = run_count(cfg, [path])
        tables.append(np.asarray(state.bloom_table).reshape(-1))
        thresholds.append(state.threshold)
        uniq, counts, n = state.exact
        n = int(n)
        exacts.append((np.asarray(uniq)[:n], np.asarray(counts)[:n]))
    for i in range(1, len(MESHES)):
        assert np.array_equal(tables[0], tables[i]), \
            f"bloom table differs for mesh {MESHES[i]}"
        assert thresholds[0] == thresholds[i]
        assert np.array_equal(exacts[0][0], exacts[i][0])
        assert np.array_equal(exacts[0][1], exacts[i][1])


def test_sharded_table_matches_oracle(dataset):
    path, reads = dataset
    cfg = KmeraxConfig(mesh_data=2, mesh_bucket=4, **CFG)
    state = run_count(cfg, [path])
    obl = oracle.CountingBloomOracle(31, log2_width=16, num_hashes=4)
    obl.add_reads([r.bases for r in reads])
    assert np.array_equal(np.asarray(state.bloom_table),
                          obl.table.astype(np.int32))


def test_correct_on_mesh_counted_spectrum(dataset, tmp_path):
    """Corrected FASTQ from mesh-counted spectrum == single-device bytes."""
    path, _ = dataset
    outs = []
    for (d, s) in [(1, 1), (2, 4)]:
        cfg = KmeraxConfig(mesh_data=d, mesh_bucket=s, **CFG)
        state = run_count(cfg, [path])
        out = tmp_path / f"c_{d}x{s}.fastq"
        run_correct(cfg, [path], state, str(out))
        outs.append(out.read_bytes())
    assert outs[0] == outs[1]


def test_routed_query_matches_replicated(dataset):
    """all-to-all probe routing returns the same counts as local queries."""
    path, reads = dataset
    cfg = KmeraxConfig(mesh_data=2, mesh_bucket=4, **CFG)
    mesh = make_mesh(MeshSpec(2, 4))
    sp = ShardedParams(_bloom_params(cfg, 31), n_shards=4)
    table, exact = make_sharded_state(sp, mesh, None, 31)
    step = sharded_insert_step(sp, mesh, 31, None)
    bases = np.stack([r.bases for r in reads[:128]]).astype(np.int32)
    b = jax.device_put(jnp.asarray(bases),
                       NamedSharding(mesh, P(("data", "bucket"))))
    table, _, nk, ovf = step(table, None, b)
    assert int(ovf) == 0

    merged_global = merge_and_replicate(mesh)(table)   # (width,) replicated
    merged_shards = merge_keep_sharded(mesh)(table)    # (4, width/4) sharded
    state_qf_table = merged_global

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("bucket", None), P(("data", "bucket"))),
        out_specs=P(("data", "bucket")), check_vma=False)
    def routed(table_shard, bases_blk):
        words, valid = extract_kmers(bases_blk, 31)
        canon, _ = canonical_words(words, 31)
        qf = routed_query_fn(sp, table_shard[0], 31)
        return qf(canon, valid)

    got = np.asarray(routed(merged_shards, b))

    from kmerax.spectrum.bloom import query
    words, valid = extract_kmers(jnp.asarray(bases), 31)
    canon, _ = canonical_words(words, 31)
    want = np.asarray(query(sp.bloom, state_qf_table, canon, valid))
    assert np.array_equal(got, want)


def test_exact_host_merge_dedups(dataset):
    path, reads = dataset
    cfg = KmeraxConfig(mesh_data=2, mesh_bucket=4, **CFG)
    state = run_count(cfg, [path])
    osp = oracle.ExactSpectrum(31)
    osp.add_reads([r.bases for r in reads])
    uniq, counts, n = state.exact
    assert int(n) == len(osp.counts)
