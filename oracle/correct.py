"""Oracle spectrum-based error correction. Frozen algorithm: DESIGN.md §8."""

from __future__ import annotations

import numpy as np

from oracle.codec import canonical_int, kmer_int


def _kmer_counts(R: np.ndarray, k: int, query) -> np.ndarray:
    L = len(R)
    out = np.zeros(L - k + 1, dtype=np.int64)
    for j in range(L - k + 1):
        v = kmer_int(R[j:j + k])
        out[j] = query(canonical_int(v, k)) if v >= 0 else 0
    return out


def _weak_runs(solid: np.ndarray):
    """Maximal intervals [j0, j1] (inclusive) of consecutive weak positions."""
    runs = []
    j = 0
    n = len(solid)
    while j < n:
        if not solid[j]:
            j0 = j
            while j + 1 < n and not solid[j + 1]:
                j += 1
            runs.append((j0, j))
        j += 1
    return runs


def _candidates(runs, k: int, last_j: int, max_runs: int):
    """Candidate edit positions per DESIGN.md §8, deduped keeping first."""
    cands = []
    for (j0, j1) in runs[:max_runs]:
        if j0 > 0 and j1 < last_j:
            cs = [j0 + k - 1, j1]
        elif j0 == 0 and j1 < last_j:
            cs = [j1]
        elif j0 > 0 and j1 == last_j:
            cs = [j0 + k - 1]
        else:  # whole read weak
            cs = [j1, j0 + k - 1]
        cands.extend(cs)
    seen, out = set(), []
    for c in cands:
        if c not in seen:
            seen.add(c)
            out.append(c)
    return out


def _score(R: np.ndarray, i: int, b: int, k: int, t: int, query) -> int:
    """#covering kmers that are solid when base i is set to b."""
    L = len(R)
    tmp = R.copy()
    tmp[i] = b
    lo = max(0, i - k + 1)
    hi = min(i, L - k)
    s = 0
    for j in range(lo, hi + 1):
        v = kmer_int(tmp[j:j + k])
        if v >= 0 and query(canonical_int(v, k)) >= t:
            s += 1
    return s


def correct_read(R: np.ndarray, k: int, t: int, query,
                 rounds: int = 2, max_runs: int = 8,
                 max_edits: int = 8, max_cands: int = 4) -> np.ndarray:
    """Correct one read per DESIGN.md §8 v2 (round-parallel evaluation with
    conflict suppression). `query(canon)->count`. Returns new base array."""
    L = len(R)
    if L < k:
        return R.copy()
    R = R.astype(np.int64).copy()
    orig = R.copy()
    last_j = L - k
    edits_total = 0
    for _ in range(rounds):
        counts = _kmer_counts(R, k, query)
        solid = counts >= t
        if solid.all():
            break
        if not solid.any():
            break
        runs = _weak_runs(solid)
        cands = _candidates(runs, k, last_j, max_runs)[:max_cands]
        # v2: ALL candidates scored against the round-start R, then applied
        # simultaneously unless within k-1 of an earlier-applied edit.
        applied_pos = []
        new_R = R.copy()
        for i in cands:
            cur_b = int(R[i])
            cur_score = _score(R, i, cur_b, k, t, query) if cur_b < 4 else 0
            best_b, best_s = -1, -1
            for b in range(4):
                s = _score(R, i, b, k, t, query)
                if s > best_s:
                    best_b, best_s = b, s
            accept = best_b != cur_b and best_s > cur_score and best_s >= 1
            if accept and all(abs(i - ip) >= k for ip in applied_pos):
                new_R[i] = best_b
                applied_pos.append(i)
        if not applied_pos:
            break
        R = new_R
        edits_total += len(applied_pos)
    if edits_total > max_edits:
        return orig.astype(np.uint8)
    return R.astype(np.uint8)


def correct_reads(reads, k: int, t: int, query, **kw):
    return [correct_read(np.asarray(r), k, t, query, **kw) for r in reads]
