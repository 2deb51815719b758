"""C++ FASTQ extension vs pure-Python parser: byte-identical batches."""

import gzip

import numpy as np
import pytest

from kmerax.io.batcher import batch_reads
from kmerax.io.native import get_lib

from sim import ecoli_like, make_fastq

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native ext unavailable (no g++)")


@pytest.fixture(scope="module")
def fastq_file(tmp_path_factory):
    _, reads = ecoli_like(seed=303, genome_len=800, coverage=25,
                          read_len=73, error_rate=0.01)  # odd length on purpose
    p = tmp_path_factory.mktemp("nat") / "reads.fastq"
    p.write_bytes(make_fastq(reads))
    return str(p), reads


def _compare(path, batch_size, max_len):
    py = list(batch_reads(path, batch_size, max_len, use_native=False))
    nat = list(batch_reads(path, batch_size, max_len, use_native=True))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert np.array_equal(a.bases, b.bases)
        assert np.array_equal(a.lengths, b.lengths)
        assert a.n == b.n and a.index0 == b.index0
        for ra, rb in zip(a.records, b.records):
            assert ra.name == rb.name and ra.qual == rb.qual


def test_native_matches_python(fastq_file):
    path, _ = fastq_file
    _compare(path, 64, 80)
    _compare(path, 7, 73)      # batch size not dividing record count


def test_native_gz(fastq_file, tmp_path):
    path, _ = fastq_file
    gz = tmp_path / "r.fastq.gz"
    with gzip.open(gz, "wb") as f:
        f.write(open(path, "rb").read())
    _compare(str(gz), 32, 80)


def test_native_no_trailing_newline(tmp_path):
    p = tmp_path / "x.fastq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2\nTTNA\n+\nJJJJ")  # no final \n
    _compare(str(p), 8, 10)


def test_native_chunk_boundary(tmp_path):
    """Records split across the 8MB chunk boundary parse correctly."""
    import kmerax.io.batcher as bt
    old = bt._NATIVE_CHUNK
    bt._NATIVE_CHUNK = 97  # pathological chunk size
    try:
        _, reads = ecoli_like(seed=7, genome_len=500, coverage=10,
                              read_len=50, error_rate=0.0)
        p = tmp_path / "c.fastq"
        p.write_bytes(make_fastq(reads))
        _compare(str(p), 16, 60)
    finally:
        bt._NATIVE_CHUNK = old


def test_native_errors(tmp_path):
    bad = tmp_path / "bad.fastq"
    bad.write_bytes(b"r1\nACGT\n+\nIIII\n")
    with pytest.raises(ValueError, match="name line"):
        list(batch_reads(str(bad), 8, 10, use_native=True))
    trunc = tmp_path / "trunc.fastq"
    trunc.write_bytes(b"@r1\nACGT\n+\n")
    with pytest.raises(ValueError, match="truncated"):
        list(batch_reads(str(trunc), 8, 10, use_native=True))
