"""Paired-end R1/R2 correction: per-file outputs, order & name preservation,
and equality with independently-corrected single files (DNBSEQ PE configs)."""

import numpy as np

from kmerax.config import KmeraxConfig
from kmerax.pipeline import run_count, run_correct
from sim import make_fastq, random_genome, simulate_pairs

CFG = dict(k=31, bloom_log2_width=17, batch_reads=128, max_read_len=100,
           exact_capacity=1 << 17)


def test_paired_end_correct(tmp_path):
    rng = np.random.default_rng(404)
    genome = random_genome(rng, 2000)
    r1s, r2s = simulate_pairs(genome, 300, 100, 0.01, seed=405)
    p1, p2 = tmp_path / "r1.fastq", tmp_path / "r2.fastq"
    p1.write_bytes(make_fastq(r1s))
    p2.write_bytes(make_fastq(r2s))

    cfg = KmeraxConfig(**CFG)
    state = run_count(cfg, [str(p1), str(p2)])  # spectrum from both mates
    o1, o2 = tmp_path / "c1.fastq", tmp_path / "c2.fastq"
    stats = run_correct(cfg, [str(p1), str(p2)], state, [str(o1), str(o2)])
    assert stats["reads"] == 600

    # names/pairing preserved per file, in order
    lines1 = o1.read_bytes().split(b"\n")
    lines2 = o2.read_bytes().split(b"\n")
    assert lines1[0].endswith(b"/1") and lines2[0].endswith(b"/2")
    assert lines1[0][:-2] == lines2[0][:-2]  # same pair name

    # per-file outputs equal correcting each file alone (same spectrum)
    oa, ob = tmp_path / "a.fastq", tmp_path / "b.fastq"
    run_correct(cfg, [str(p1)], state, str(oa))
    run_correct(cfg, [str(p2)], state, str(ob))
    assert o1.read_bytes() == oa.read_bytes()
    assert o2.read_bytes() == ob.read_bytes()

    # correction actually helps
    errs_before = sum(int((r.bases != r.true_bases).sum()) for r in r1s)
    fixed1 = [l for i, l in enumerate(lines1) if i % 4 == 1 and l]
    from kmerax.core.codec import seq_bytes_to_bases
    errs_after = sum(
        int((seq_bytes_to_bases(np.frombuffer(s, np.uint8))
             != r.true_bases).sum())
        for s, r in zip(fixed1, r1s))
    assert errs_after < errs_before * 0.2
