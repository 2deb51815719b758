"""2-bit wire golden: corrected FASTQ bytes identical with wire_pack on
vs off, on a dataset that includes N-carrying reads (which must fall back
to the int8 wire per batch — io/wire.py)."""

import numpy as np

from kmerax.config import KmeraxConfig
from kmerax.pipeline import run_correct, run_count
from sim import ecoli_like, make_fastq

CFG = dict(k=31, bloom_log2_width=18, bloom_hashes=4, batch_reads=128,
           max_read_len=100, exact_capacity=1 << 17)


def test_wire_pack_bytes_identical(tmp_path):
    _, reads = ecoli_like(seed=77, genome_len=1500, coverage=30,
                          read_len=100, error_rate=0.008)
    fq = make_fastq(reads)
    # sprinkle Ns into a few reads so some batches exercise the int8
    # fallback while most ride the packed wire
    lines = fq.decode().split("\n")
    for r in (1, 5, 9):  # sequence lines of reads 0, 1, 2
        s = list(lines[r])
        s[3] = "N"
        lines[r] = "".join(s)
    path = tmp_path / "reads.fastq"
    path.write_text("\n".join(lines))

    outs = {}
    for packed in (True, False):
        cfg = KmeraxConfig(**CFG, wire_pack=packed, threshold=2)
        out = tmp_path / f"corr_{packed}.fastq"
        state = run_count(cfg, [str(path)])
        run_correct(cfg, [str(path)], state, str(out))
        outs[packed] = out.read_bytes()
    # (the corrector may EDIT the injected Ns to consensus bases — what
    # matters is that the N-carrying batches took the int8 fallback and
    # produced the same bytes as the all-int8 run)
    assert outs[True] == outs[False]
