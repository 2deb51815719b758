#!/usr/bin/env python
"""Driver benchmark entry: prints ONE JSON line with the headline metric.

Headline = k-mers/s/chip at k=31 (BASELINE.json:2 counting north-star) on
whatever accelerator jax.devices() provides (the real v5e chip under the
driver), plus the correction and align stage rates as extra keys.
vs_baseline is relative to the nominal single-chip targets in
kmerax/bench/runners.py (no published reference numbers exist,
BASELINE.json:13). All metrics use the round-4 chained fresh-batch
methodology (see kmerax/bench/runners.py docstring).
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    from kmerax.utils.compile_cache import enable
    enable()
    from kmerax.config import KmeraxConfig
    from kmerax.bench.runners import (
        bench_align, bench_correct, bench_count, bench_e2e,
    )

    cfg = KmeraxConfig(k=31, bloom_log2_width=24)
    r = bench_count(cfg, n_reads=16384)
    c = bench_correct(cfg, n_reads=4096)
    a = bench_align(cfg, n_reads=16384)
    e = bench_e2e(cfg, n_reads=65536)
    print(json.dumps({"metric": r["metric"], "value": r["value"],
                      "unit": r["unit"], "vs_baseline": r["vs_baseline"],
                      "correct_metric": c["metric"],
                      "correct_value": c["value"],
                      "correct_unit": c["unit"],
                      "correct_vs_baseline": c["vs_baseline"],
                      "align_metric": a["metric"],
                      "align_value": a["value"],
                      "align_unit": a["unit"],
                      "align_vs_baseline": a["vs_baseline"],
                      "e2e_metric": e["metric"],
                      "e2e_value": e["value"],
                      "e2e_unit": e["unit"],
                      "e2e_note": e["note"]}))


if __name__ == "__main__":
    main()
