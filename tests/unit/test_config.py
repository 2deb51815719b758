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
