"""Config dataclass: validation, TOML + override precedence, manifest JSON."""

import pytest

from kmerax.config import KmeraxConfig


def test_defaults_valid():
    cfg = KmeraxConfig()
    assert cfg.k == 31 and cfg.num_words == 2


@pytest.mark.parametrize("kw", [
    dict(k=32), dict(k=65), dict(minimizer_m=16), dict(minimizer_m=31),
    dict(k2=30), dict(bloom_log2_width=33), dict(num_buckets=100),
    dict(bloom_log2_width=14, num_buckets=256), dict(mesh_bucket=3),
])
def test_invalid_rejected(kw):
    with pytest.raises(ValueError):
        KmeraxConfig(**kw)


def test_toml_and_overrides(tmp_path):
    p = tmp_path / "cfg.toml"
    p.write_text("k = 25\nbatch_reads = 512\nthreshold = 4\n")
    cfg = KmeraxConfig.load(str(p))
    assert (cfg.k, cfg.batch_reads, cfg.threshold) == (25, 512, 4)
    # explicit overrides beat TOML; None overrides are ignored
    cfg = KmeraxConfig.load(str(p), k=31, threshold=None)
    assert (cfg.k, cfg.threshold) == (31, 4)
    # unknown keys rejected loudly
    bad = tmp_path / "bad.toml"
    bad.write_text("kmer = 31\n")
    with pytest.raises(ValueError, match="unknown config"):
        KmeraxConfig.load(str(bad))


def test_json_roundtrip():
    cfg = KmeraxConfig(k=63, bloom_log2_width=20)
    assert KmeraxConfig.from_json(cfg.to_json()) == cfg


def test_cli_config_file(tmp_path):
    from kmerax.cli import main
    p = tmp_path / "cfg.toml"
    p.write_text("k = 33\n")  # odd, valid
    # config file drives k; bad input file fails AFTER config parsing
    with pytest.raises(FileNotFoundError):
        main(["count", "--config", str(p), "--in", "/nonexistent.fastq",
              "--out", str(tmp_path / "o"), "--threshold", "3", "--no-exact"])


def test_checkpoint_sharded_host_roundtrip(tmp_path):
    """save_spectrum/load_spectrum round-trip the per-process shard of a
    range-sharded host spectrum (config-5 resume support)."""
    import numpy as np
    from kmerax.config import KmeraxConfig
    from kmerax.pipeline.checkpoint import load_spectrum, save_spectrum
    from kmerax.spectrum.host import HostSpectrum
    from kmerax.spectrum.host_sharded import ShardedHostSpectrum

    rows = np.sort(np.arange(10, dtype=np.uint64) * 977)
    uniq = np.stack([rows.astype(np.uint32),
                     (rows >> np.uint64(32)).astype(np.uint32)], axis=1)
    counts = np.arange(1, 11, dtype=np.int64)
    host = ShardedHostSpectrum(HostSpectrum(uniq, counts, 31), 31,
                               n_procs=2, pid=0, bounds=np.zeros(0,
                                                                 np.uint64))
    cfg = KmeraxConfig(k=31)
    save_spectrum(str(tmp_path), cfg, bloom_table=np.zeros(256, np.int32),
                  threshold=2, host=host)
    manifest, arrays = load_spectrum(str(tmp_path), pid=0, n_procs=2)
    assert manifest["host_shard"] == [0, 2]
    assert np.array_equal(arrays["host_uniq"], uniq)
    assert np.array_equal(arrays["host_counts"], counts)
    assert np.array_equal(arrays["host_bounds"], host.bounds)
    assert "bloom_table" in arrays

    # geometry mismatch (resume under a different process count, or the
    # per-process manifest silently falling back to rank 0's shard) must
    # RAISE, not adopt the wrong key range (ADVICE r4 medium #2)
    import pytest
    with pytest.raises(RuntimeError, match="geometry mismatch"):
        load_spectrum(str(tmp_path), pid=0)          # implied n_procs=1
    with pytest.raises(RuntimeError, match="geometry mismatch"):
        load_spectrum(str(tmp_path), pid=1, n_procs=2)  # rank-0 fallback
