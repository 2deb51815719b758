"""Round-5 wire-format lab (results: WIRE_r5.json, COUNT_PROF_r5.json).

Measures, on the real chip:
  1. warm A/B of the 2-bit packed wire vs the int8 wire through the full
     production e2e path (bench_e2e), alternating to expose tunnel
     variance;
  2. the batch_reads sweep (larger single transfers are strictly worse
     per read on the tunnel);
  3. count-stage attribution with a CHAINED device accumulator — timing
     an extract-only step that returns per-batch scalars measures tunnel
     round-trips, not device work (53.7 ms/batch apparent vs 3.8 real).

Run: python experiments/wire_lab_r5.py
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.bench.runners import _sim_batch, _sync, bench_e2e
from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.pipeline.run import _bloom_params
from kmerax.spectrum.bloom import insert, make_table
from kmerax.utils.compile_cache import enable


def ab_packed_vs_int8(reps=3, n_reads=65536):
    for wp in (True, False):   # warm both compiled programs
        bench_e2e(KmeraxConfig(k=31, bloom_log2_width=24, wire_pack=wp),
                  n_reads=16384)
    for i in range(reps):
        for tag, wp in (("packed", True), ("int8", False)):
            e = bench_e2e(KmeraxConfig(k=31, bloom_log2_width=24,
                                       wire_pack=wp), n_reads=n_reads)
            print(json.dumps({"rep": i, "tag": tag, "v": e["value"],
                              "count_s": e["count_wall_s"],
                              "corr_s": e["correct_wall_s"]}), flush=True)


def batch_sweep(n_reads=65536):
    for br in (4096, 8192, 16384):
        cfg = KmeraxConfig(k=31, bloom_log2_width=24, batch_reads=br)
        bench_e2e(cfg, n_reads=br * 2)  # warm this shape
        e = bench_e2e(cfg, n_reads=n_reads)
        print(json.dumps({"batch_reads": br, "v": e["value"],
                          "count_s": e["count_wall_s"],
                          "corr_s": e["correct_wall_s"]}), flush=True)


def count_attribution():
    cfg = KmeraxConfig(k=31, bloom_log2_width=24)
    params = _bloom_params(cfg, 31)
    k = 31

    @jax.jit
    def full(table, bases):
        words, valid = extract_kmers(bases.astype(jnp.int32), k)
        canon, _ = canonical_words(words, k)
        return insert(params, table, canon, valid)

    @jax.jit
    def extract_only(acc, bases):
        # CHAINED accumulator: per-batch scalar returns would time the
        # tunnel readback, not the device (see module docstring)
        words, valid = extract_kmers(bases.astype(jnp.int32), k)
        canon, _ = canonical_words(words, k)
        return acc + canon.sum() + jnp.sum(valid)

    batches = [jnp.asarray(_sim_batch(16384, 150, seed=i).astype(np.int8))
               for i in range(9)]
    table, acc = make_table(params), jnp.uint32(0)
    for _ in range(2):
        table = full(table, batches[0])
        acc = extract_only(acc, batches[0])
    _sync((table, acc))
    t0 = time.perf_counter()
    for b in batches[1:]:
        table = full(table, b)
    _sync(table)
    t_full = (time.perf_counter() - t0) / 8
    t0 = time.perf_counter()
    for b in batches[1:]:
        acc = extract_only(acc, b)
    _sync(acc)
    t_ex = (time.perf_counter() - t0) / 8
    nk = 16384 * (150 - 31 + 1)
    print(json.dumps({"full_ms": round(t_full * 1e3, 2),
                      "extract_ms": round(t_ex * 1e3, 2),
                      "insert_attrib_ms": round((t_full - t_ex) * 1e3, 2),
                      "full_kmers_per_s": round(nk / t_full),
                      "extract_kmers_per_s": round(nk / t_ex)}), flush=True)


if __name__ == "__main__":
    enable()
    ab_packed_vs_int8()
    batch_sweep()
    count_attribution()
