"""Fused Pallas correction kernel parity (interpret mode, CPU backend):
ops.pallas_correct must be bit-identical to the XLA _eval_entries path and
to the oracle through full correct_batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.correct import correct_batch, _eval_entries
from kmerax.ops.pallas_correct import eval_entries_fused, make_fused_eval
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, make_solid_fn


def _setup(k, B=64, L=100, seed=0, log2_width=15):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 2000).astype(np.int32)
    starts = rng.integers(0, 2000 - L, B)
    reads = genome[starts[:, None] + np.arange(L)[None, :]]
    errs = rng.random(reads.shape) < 0.03
    reads = np.where(errs, (reads + rng.integers(1, 4, reads.shape)) % 4,
                     reads).astype(np.int32)
    # sprinkle some N bases and short reads
    reads[rng.random(reads.shape) < 0.002] = 4
    lengths = np.full(B, L, np.int32)
    lengths[: B // 8] = rng.integers(k, L + 1, B // 8)
    for i in range(B):
        reads[i, lengths[i]:] = 4
    cfg = KmeraxConfig(k=k, bloom_log2_width=log2_width)
    params = _bloom_params(cfg, k)
    bases = jnp.asarray(reads)
    words, valid = extract_kmers(bases, k)
    canon, _ = canonical_words(words, k)
    table = insert(params, make_table(params), canon, valid)
    return params, table, bases, jnp.asarray(lengths)


@pytest.mark.parametrize("k", [25, 31, 63])
def test_eval_entries_parity(k):
    params, table, bases, lengths = _setup(k, L=110 if k == 63 else 100)
    B, L = bases.shape
    last_j = lengths - k
    t = 2
    sf = make_solid_fn(params, table, t)

    rng = np.random.default_rng(1)
    Q = 200
    ent_r = jnp.asarray(rng.integers(0, B, Q).astype(np.int32))
    ent_i = jnp.asarray(rng.integers(0, L, Q).astype(np.int32))
    # include padding entries and boundary positions
    ent_i = ent_i.at[:10].set(-1)
    ent_i = ent_i.at[10:15].set(0)
    ent_i = ent_i.at[15:20].set(L - 1)

    ref_b, ref_a = _eval_entries(bases, lengths, last_j, ent_r, ent_i,
                                 k, sf)
    got_b, got_a = eval_entries_fused(params, table, t, bases, lengths,
                                      last_j, ent_r, ent_i, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
    # best_b only matters where an edit is applied
    acc = np.asarray(ref_a)
    np.testing.assert_array_equal(np.asarray(got_b)[acc],
                                  np.asarray(ref_b)[acc])


@pytest.mark.parametrize("k", [31])
def test_correct_batch_fused_parity(k):
    params, table, bases, lengths = _setup(k)
    t = 2
    sf = make_solid_fn(params, table, t)
    ef = make_fused_eval(params, table, t, interpret=True)
    assert ef is not None

    ref, ref_ne = correct_batch(bases, lengths, k, t, solid_fn=sf)
    got, got_ne = correct_batch(bases, lengths, k, t, solid_fn=sf,
                                eval_fn=ef)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got_ne), np.asarray(ref_ne))


def test_make_fused_eval_gates():
    params, table, bases, lengths = _setup(31)
    # minimizer scheme -> no fused path
    p2 = type(params)(k=31, log2_width=params.log2_width,
                      num_hashes=params.num_hashes,
                      minimizer_m=params.minimizer_m,
                      log2_buckets=params.log2_buckets,
                      bucket_scheme="minimizer")
    assert make_fused_eval(p2, table, 2, interpret=True) is None
