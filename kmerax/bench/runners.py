"""Benchmark harness (SURVEY.md §2 #23): the BASELINE.json:2 metrics —
k-mers/s/chip (counting, k=31), reads/s/chip (correction) — measured on
in-memory synthetic reads so device throughput is isolated from disk.

No published reference numbers exist (BASELINE.json:13 "published": {});
`vs_baseline` is reported against the NOMINAL_* targets below, which encode
the speed-of-light ambition of BASELINE.json:5 for a single v5e chip.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.ops.correct import correct_batch
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table, query

# nominal single-chip targets (see module docstring)
NOMINAL_KMERS_PER_S = 1.0e8     # counting, k=31
NOMINAL_READS_PER_S = 2.0e5     # correction, PE150-like reads


def _sim_batch(n_reads: int, read_len: int, seed: int = 0,
               error_rate: float = 0.01, genome_len: int = 1 << 17):
    # default genome gives ~19-38x coverage per batch — matches the
    # acceptance configs (BASELINE.md 30-80x), so correction solidity is
    # realistic rather than all-weak.
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, genome_len).astype(np.uint8)
    starts = rng.integers(0, genome_len - read_len, n_reads)
    idx = starts[:, None] + np.arange(read_len)[None, :]
    reads = genome[idx]
    errs = rng.random(reads.shape) < error_rate
    shift = rng.integers(1, 4, reads.shape).astype(np.uint8)
    reads = np.where(errs, (reads + shift) % 4, reads)
    return reads.astype(np.int32)


def _sync(state):
    """Force full execution. On the axon tunnel platform block_until_ready
    is effectively a no-op — only a host readback truly synchronizes, so we
    read one element of every array leaf."""
    for leaf in jax.tree_util.tree_leaves(state):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def _time_steps(fn, state, batches, warmup: int = 2, reps: int = 5):
    for i in range(warmup):
        state = fn(state, batches[i % len(batches)])
    _sync(state)
    t0 = time.perf_counter()
    for i in range(reps):
        state = fn(state, batches[i % len(batches)])
    _sync(state)
    return (time.perf_counter() - t0) / reps


def bench_count(cfg: KmeraxConfig, n_reads: int = 16384,
                read_len: int = 150) -> dict:
    """k-mers/s/chip at k=cfg.k (the BASELINE.json:2 north-star metric)."""
    k = cfg.k
    params = _bloom_params(cfg, k)
    batches = [jnp.asarray(_sim_batch(n_reads, read_len, seed=s))
               for s in range(3)]

    @jax.jit
    def step(table, bases):
        words, valid = extract_kmers(bases, k)
        canon, _ = canonical_words(words, k)
        return insert(params, table, canon, valid)

    dt = _time_steps(step, make_table(params), batches)
    kmers = n_reads * (read_len - k + 1)
    rate = kmers / dt
    return {"metric": f"kmers_per_s_per_chip_k{k}", "value": round(rate, 1),
            "unit": "kmers/s/chip", "batch_wall_s": round(dt, 5),
            "vs_baseline": round(rate / NOMINAL_KMERS_PER_S, 4)}


def bench_correct(cfg: KmeraxConfig, n_reads: int = 8192,
                  read_len: int = 150) -> dict:
    """reads/s/chip for the correction engine.

    Coverage matters: weak-run candidate volume (correction work per read)
    is set by how much of the spectrum clears the solid threshold. The
    acceptance matrix is 30-80x coverage (BASELINE.md configs); genome_len
    is sized so the two spectrum batches give ~37x, inside that band.
    """
    k = cfg.k
    params = _bloom_params(cfg, k)
    genome_len = 1 << 15
    batches = [jnp.asarray(_sim_batch(n_reads, read_len, seed=s,
                                      genome_len=genome_len))
               for s in range(2)]

    @jax.jit
    def build(table, bases):
        words, valid = extract_kmers(bases, k)
        canon, _ = canonical_words(words, k)
        return insert(params, table, canon, valid)

    table = make_table(params)
    for b in batches:
        table = build(table, b)
    table.block_until_ready()
    lengths = jnp.full(n_reads, read_len, dtype=jnp.int32)
    # production correct path (run.CountState.solid_fn): Pallas VMEM query
    # kernel on TPU, packed solidity bitmap elsewhere
    from kmerax.spectrum.bloom import make_solid_fn
    from kmerax.ops.pallas_correct import make_fused_eval
    sf = make_solid_fn(params, table, 3)
    ef = make_fused_eval(params, table, 3)

    @jax.jit
    def step(state, bases):
        fixed, ne = correct_batch(bases, lengths, k, 3, solid_fn=sf,
                                  rounds=cfg.rounds, max_runs=cfg.max_runs,
                                  max_edits=cfg.max_edits, eval_fn=ef)
        return state + jnp.sum(ne)

    # warmup must touch EVERY distinct batch: the first execution of a
    # batch pays one-time dispatch/transfer costs on the tunnel platform
    # (measured ~15 ms, experiments/correct_profile_r3.py) that are not
    # steady-state throughput.
    dt = _time_steps(step, jnp.zeros((), jnp.int32), batches,
                     warmup=len(batches), reps=6)
    rate = n_reads / dt
    return {"metric": f"reads_per_s_per_chip_k{k}", "value": round(rate, 1),
            "unit": "reads/s/chip", "batch_wall_s": round(dt, 5),
            "vs_baseline": round(rate / NOMINAL_READS_PER_S, 4)}


def run_preset(preset: str, cfg: KmeraxConfig, n_reads: int = 16384) -> dict:
    if preset == "count":
        return bench_count(cfg, n_reads=n_reads)
    if preset == "correct":
        return bench_correct(cfg, n_reads=min(n_reads, 8192))
    if preset == "e2e":
        return {"count": bench_count(cfg, n_reads=n_reads),
                "correct": bench_correct(cfg, n_reads=min(n_reads, 8192))}
    raise ValueError(f"unknown preset {preset}")
