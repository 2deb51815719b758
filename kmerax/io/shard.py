"""Per-host input sharding (SURVEY.md §1 L1: "each host reads its own file
shard"; round-2 VERDICT Missing #4).

Multi-host runs must not have every process parse the full input — host
parse bandwidth has to scale with hosts. Input FASTQ files are assigned to
processes balanced by on-disk size (deterministic greedy: biggest file to
the least-loaded process, ties by original order), and each process parses
only its own files:

  * count: processes stream their shards in lockstep global batches (each
    contributes its local rows via make_array_from_process_local_data);
    counting is order-free, so the merged spectrum is bit-identical to the
    single-process stream (DESIGN.md §13).
  * correct: with a replicated solidity bitmap there are NO cross-host
    dependencies — each process corrects and writes its own files
    independently (run.py), which also removes the all-host gather of
    corrected rows (round-2 VERDICT Weak #7).
"""

from __future__ import annotations

import os


def assign_paths(paths: list[str], n_procs: int) -> list[list[int]]:
    """Deterministic size-balanced assignment: list of path-index lists,
    one per process. Every index appears exactly once; within a process,
    indices keep their original order (so per-file outputs concatenate
    back in global path order)."""
    sizes = []
    for i, p in enumerate(paths):
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            sizes.append(0)
    order = sorted(range(len(paths)), key=lambda i: (-sizes[i], i))
    load = [0] * n_procs
    owner = [0] * len(paths)
    for i in order:
        p = min(range(n_procs), key=lambda q: (load[q], q))
        owner[i] = p
        load[p] += sizes[i]
    return [[i for i in range(len(paths)) if owner[i] == q]
            for q in range(n_procs)]


def local_paths(paths: list[str], n_procs: int, pid: int) -> list[str]:
    return [paths[i] for i in assign_paths(paths, n_procs)[pid]]
