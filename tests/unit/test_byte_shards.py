"""Record-aligned byte-range sharding of a single FASTQ (SURVEY.md §1 L1;
round-3 VERDICT Weak #4 / task 7)."""

import numpy as np
import pytest

from kmerax.io.fastq import FastqReader, read_fastq
from kmerax.io.shard import all_input_shards, byte_shards, snap_to_record
from sim import ecoli_like, make_fastq


@pytest.fixture(scope="module")
def fastq(tmp_path_factory):
    _, reads = ecoli_like(seed=77, genome_len=1500, coverage=30,
                          read_len=100, error_rate=0.01)
    # adversarial: quality strings that START WITH '@' (legal FASTQ) —
    # the snap rule must not mistake them for headers
    for r in reads[::3]:
        r.qual = "@" + r.qual[1:]
    p = tmp_path_factory.mktemp("bs") / "reads.fastq"
    p.write_bytes(make_fastq(reads))
    return str(p), reads


@pytest.mark.parametrize("n", [2, 3, 7])
def test_shards_cover_exactly(fastq, n):
    path, reads = fastq
    shards = byte_shards(path, n)
    # contiguous cover of the file
    assert shards[0][1] == 0
    import os
    assert shards[-1][2] == os.path.getsize(path)
    for (_, _, e), (_, s, _) in zip(shards, shards[1:]):
        assert e == s
    # concatenated shard records == full-file records
    got = []
    for (_, s, e) in shards:
        got.extend(FastqReader(path, byte_range=(s, e)))
    want = read_fastq(path)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.name, g.seq, g.qual) == (w.name, w.seq, w.qual)
    # every shard is non-trivial for this size
    assert len(shards) == n


def test_snap_is_idempotent_and_monotone(fastq):
    path, _ = fastq
    import os
    size = os.path.getsize(path)
    prev = 0
    for off in range(0, size, max(1, size // 23)):
        s = snap_to_record(path, off)
        assert s >= off or s == size
        assert snap_to_record(path, s) == s
        assert s >= prev
        prev = s


def test_all_input_shards_policy(fastq, tmp_path):
    path, _ = fastq
    # fewer plain files than procs -> byte shards
    shards = all_input_shards([path], 4)
    assert len(shards) == 4 and all(isinstance(s, tuple) for s in shards)
    # enough files -> file-level
    assert all_input_shards([path, path, path, path], 4) == [path] * 4
    # .gz present -> file-level fallback
    gz = tmp_path / "x.fastq.gz"
    import gzip
    with gzip.open(gz, "wb") as f:
        f.write(b"@r\nACGT\n+\nIIII\n")
    assert all_input_shards([str(gz)], 2) == [str(gz)]
