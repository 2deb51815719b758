"""Hardware smoke tests (SURVEY.md §4.4): run with KMERAX_TPU_TESTS=1 on a
host with a real TPU. Skipped under the default CPU test config."""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("KMERAX_TPU_TESTS"),
    reason="set KMERAX_TPU_TESTS=1 on a TPU host")


@pytest.fixture(scope="module")
def tpu():
    import jax

    dev = jax.devices()[0]
    assert dev.platform != "cpu", f"expected an accelerator, got {dev}"
    from kmerax.utils.compile_cache import enable
    enable()
    return dev


def test_count_numerics_vs_oracle(tpu):
    """Device count step produces the oracle Bloom table bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import oracle
    from kmerax.config import KmeraxConfig
    from kmerax.core import canonical_words, extract_kmers
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.bloom import insert, make_table

    rng = np.random.default_rng(0)
    reads = rng.integers(0, 4, (64, 100)).astype(np.int32)
    params = _bloom_params(KmeraxConfig(k=31, bloom_log2_width=16), 31)

    @jax.jit
    def step(t, b):
        w, v = extract_kmers(b, 31)
        c, _ = canonical_words(w, 31)
        return insert(params, t, c, v)

    table = np.asarray(step(make_table(params), jnp.asarray(reads)))
    obl = oracle.CountingBloomOracle(31, log2_width=16, num_hashes=4)
    obl.add_reads([r.astype(np.uint8) for r in reads])
    assert np.array_equal(table, obl.table.astype(np.int32))


def test_pallas_insert_matches_xla(tpu):
    """The Pallas VMEM insert and the XLA scatter agree bit-for-bit on the
    real chip (bench-scale table)."""
    import jax
    import jax.numpy as jnp
    from kmerax.config import KmeraxConfig
    from kmerax.core import canonical_words, extract_kmers
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.bloom import insert, make_table
    from kmerax.spectrum.pallas_bloom import insert_pallas

    rng = np.random.default_rng(1)
    reads = np.where(rng.random((256, 150)) < 0.01, 4,
                     rng.integers(0, 4, (256, 150))).astype(np.int32)
    params = _bloom_params(KmeraxConfig(k=31, bloom_log2_width=20), 31)

    @jax.jit
    def both(t, b):
        w, v = extract_kmers(b, 31)
        c, _ = canonical_words(w, 31)
        return insert_pallas(params, t, c, v), insert(params, t, c, v)

    tp, tx = both(make_table(params), jnp.asarray(reads))
    assert np.array_equal(np.asarray(tp), np.asarray(tx))


# floor = 0.8x of the last recorded bench (BENCH_r02: 118M k-mers/s/chip
# via the Pallas VMEM insert kernel) so real regressions trip it
COUNT_FLOOR = 0.8 * 118e6


def test_count_perf_floor(tpu):
    """Counting must stay above a throughput floor on real hardware."""
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import bench_count

    r = bench_count(KmeraxConfig(k=31, bloom_log2_width=24), n_reads=16384)
    assert r["value"] > COUNT_FLOOR, f"count throughput regressed: {r}"
