"""Weak-scaling harness smoke (kmerax/bench/scaling.py): the measurement
path must run end-to-end for 1 and 2 emulated hosts and report sane
throughput numbers. Efficiency targets only apply on real slices."""

from kmerax.bench.scaling import run_scaling


def test_scaling_measurement_path():
    r = run_scaling(host_counts=(1, 2), devices_per_host=2, n_batches=3,
                    batch_per_host=256)
    assert [p["hosts"] for p in r["points"]] == [1, 2]
    for p in r["points"]:
        assert p["reads_per_s"] > 0
        assert p["kmers_per_s"] > p["reads_per_s"]  # ~120 k-mers per read
    assert r["points"][0]["efficiency"] == 1.0
