"""Two-pass correct+assemble pipeline (BASELINE.md config 5; SURVEY.md §3.4).

Pass 1: count at k -> correct reads.  Pass 2: re-count corrected reads at k2
-> unitig assembly.  With a `workdir`, every stage checkpoints (spectrum dirs
+ done-markers) and a crashed run resumes from the last complete stage,
re-executing unfinished stages only (SURVEY.md §5 failure recovery); resume
output is bit-identical to an uninterrupted run (tested).
"""

from __future__ import annotations

import os
from typing import Optional

from kmerax.config import KmeraxConfig
from kmerax.pipeline.checkpoint import load_spectrum, save_spectrum
from kmerax.pipeline.run import CountState, run_correct, run_count
from kmerax.utils.logging import get_logger
from kmerax.utils.metrics import MetricsWriter

log = get_logger("kmerax.twopass")


def _marker(workdir: str, stage: str) -> str:
    return os.path.join(workdir, f"{stage}.done")


def _is_done(workdir: Optional[str], stage: str) -> bool:
    return workdir is not None and os.path.exists(_marker(workdir, stage))


def _mark_done(workdir: Optional[str], stage: str) -> None:
    """Write the stage done-marker. Rank 0 only: every process racing an
    os.replace on the SAME tmp name made one worker consume the other's
    tmp (FileNotFoundError, intermittent in the 2-process two-pass test);
    markers are only read at resume time from the shared FS, so a single
    writer behind the save barrier is complete."""
    import jax

    if workdir is None or jax.process_index() != 0:
        return
    tmp = _marker(workdir, stage) + ".tmp"
    with open(tmp, "w") as f:
        f.write("complete\n")
    os.replace(tmp, _marker(workdir, stage))


def _count_stage(cfg: KmeraxConfig, paths, workdir, stage: str,
                 m: MetricsWriter) -> CountState:
    """run_count with spectrum checkpointing + resume."""
    import numpy as np
    import jax.numpy as jnp

    spec_dir = workdir and os.path.join(workdir, stage)
    if _is_done(workdir, stage):
        import jax

        manifest, arrays = load_spectrum(spec_dir,
                                         pid=jax.process_index(),
                                         n_procs=jax.process_count())
        if manifest is not None:
            log.info("%s: resumed from checkpoint", stage)
            from kmerax.spectrum.host import HostSpectrum
            exact = None
            host = None
            if "exact_uniq" in arrays:
                exact = (jnp.asarray(arrays["exact_uniq"]),
                         jnp.asarray(arrays["exact_counts"]),
                         jnp.asarray(arrays["exact_n"]))
                n = int(arrays["exact_n"])
                host = HostSpectrum(
                    arrays["exact_uniq"][:n],
                    arrays["exact_counts"][:n].astype(np.int64), cfg.k)
            elif "host_uniq" in arrays:
                host = HostSpectrum(arrays["host_uniq"],
                                    arrays["host_counts"].astype(np.int64),
                                    cfg.k)
                if "host_shard" in manifest:
                    from kmerax.spectrum.host_sharded import \
                        ShardedHostSpectrum

                    pid, nprocs = manifest["host_shard"]
                    host = ShardedHostSpectrum(
                        host, cfg.k, nprocs, pid,
                        arrays.get("host_bounds",
                                   np.zeros(0, np.uint64)))
            if "bloom_table" not in arrays:
                raise RuntimeError(
                    f"{stage}: checkpoint has no replicated bloom table "
                    "(counted past the replicate budget) — resume by "
                    "re-counting (delete the stage marker)")
            if cfg.mesh_data * cfg.mesh_bucket > 1:
                # resumed states carry no sharded/sharded_table, so a
                # resumed mesh run corrects via the replicated bitmap
                # rather than routed-sharded (identical bytes; different
                # memory contract) — say so (ADVICE r4 low #1)
                log.info("%s: resumed state has no bucket-sharded table — "
                         "mesh correction will use the replicated bitmap "
                         "path", stage)
            return CountState(
                cfg, jnp.asarray(arrays["bloom_table"]), exact,
                arrays.get("hist"), manifest["threshold"],
                manifest.get("n_reads", 0), manifest.get("n_kmers", 0),
                host=host)
    state = run_count(cfg, paths, metrics=m)
    if workdir is not None:
        import jax

        from kmerax.spectrum.host_sharded import ShardedHostSpectrum

        # sharded spectra: every process saves its own per-pid files;
        # everything else (one shared spectrum.npz + manifest.json) has a
        # single writer — concurrent identical writers raced on the same
        # tmp names (same class as the _mark_done race)
        if isinstance(state.host, ShardedHostSpectrum) \
                or jax.process_index() == 0:
            save_spectrum(spec_dir, cfg, bloom_table=state.bloom_table,
                          exact=state.exact, threshold=state.threshold,
                          hist=state.hist, host=state.host, stage=stage,
                          extra={"n_reads": state.n_reads,
                                 "n_kmers": state.n_kmers})
        if jax.process_count() > 1:
            # the done marker must imply EVERY process's shard is on disk
            # (a crash between one process's save and another's would
            # otherwise resume rank 0's shard as everyone's —
            # ADVICE r4 medium #2)
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(f"kmerax:save_{stage}")
        _mark_done(workdir, stage)
    return state


def run_two_pass(cfg: KmeraxConfig, paths, out_fastq: str,
                 out_fasta: Optional[str] = None,
                 metrics_path: Optional[str] = None,
                 workdir: Optional[str] = None) -> dict:
    if not cfg.k2:
        raise ValueError("two-pass mode needs cfg.k2 set")
    if workdir is not None:
        os.makedirs(workdir, exist_ok=True)
    m = MetricsWriter(metrics_path)
    # out_fastq may be a list (paired-end R1/R2 per-file outputs)
    out_list = [out_fastq] if isinstance(out_fastq, str) else list(out_fastq)

    # pass 1: count at k, correct
    state1 = _count_stage(cfg, paths, workdir, "count_k1", m)
    if _is_done(workdir, "correct") and all(os.path.exists(p)
                                            for p in out_list):
        log.info("correct: resumed (output exists)")
        stats = {"reads": state1.n_reads, "resumed": True}
    else:
        stats = run_correct(cfg, paths, state1, out_fastq, metrics=m)
        _mark_done(workdir, "correct")

    result = {"threshold_k1": state1.threshold, **stats}

    # pass 2: count corrected reads at k2, assemble
    cfg2 = cfg.replace(k=cfg.k2, k2=0)
    state2 = _count_stage(cfg2, out_list, workdir, "count_k2", m)
    result["threshold_k2"] = state2.threshold
    if out_fasta is not None:
        from kmerax.graph import assemble_to_fasta
        if _is_done(workdir, "assemble") and os.path.exists(out_fasta):
            log.info("assemble: resumed (output exists)")
            with open(out_fasta) as f:
                result["unitigs"] = sum(1 for ln in f if ln.startswith(">"))
        else:
            m.stage_start("assemble")
            n = assemble_to_fasta(cfg2, state2, out_fasta)
            m.stage_end("assemble", unitigs=n)
            _mark_done(workdir, "assemble")
            result["unitigs"] = n
    m.close()
    return result
