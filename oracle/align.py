"""Oracle banded global alignment. Frozen scoring: DESIGN.md §10.

match +2, mismatch -3, linear gap -4; cells with |i-j| > band are -inf.
Traceback tie-break: diagonal > up (consume query) > left (consume target).
"""

from __future__ import annotations

import numpy as np

MATCH, MISMATCH, GAP = 2, -3, -4
NEG_INF = -(1 << 30)


def build_contig_index(contigs, k: int):
    """Read-to-contig validation index (DESIGN.md §10b).

    contigs: list of base arrays. Returns (cat uint8, {canon_int: (pos,
    fwd)}) — every valid position of the N-separated concatenation, keeping
    the smallest position per canonical k-mer.
    """
    from oracle.codec import kmer_int, revcomp_int

    sep = np.full(k - 1, 4, np.uint8)
    parts = []
    for i, c in enumerate(contigs):
        if i:
            parts.append(sep)
        parts.append(np.asarray(c, dtype=np.uint8))
    cat = np.concatenate(parts) if parts else np.zeros(0, np.uint8)
    index = {}
    for p in range(max(0, len(cat) - k + 1)):
        v = kmer_int(cat[p:p + k])
        if v < 0:
            continue
        rc = revcomp_int(v, k)
        canon, fwd = (v, True) if v <= rc else (rc, False)
        if canon not in index:
            index[canon] = (p, fwd)
    return cat, index


def validate_read(R, cat, index, k: int, band: int = 15):
    """Seed-extend validation of one read (DESIGN.md §10b).

    Returns (found, strand, pos, score); unaligned = (False, 0, -1, NEG_INF).
    """
    from oracle.codec import kmer_int, revcomp_int

    R = np.asarray(R, dtype=np.int64)
    L = len(R)
    if L >= k:
        for j in range(L - k + 1):
            v = kmer_int(R[j:j + k])
            if v < 0:
                continue
            rc = revcomp_int(v, k)
            canon, rfwd = (v, True) if v <= rc else (rc, False)
            hit = index.get(canon)
            if hit is None:
                continue
            p, cfwd = hit
            s = 0 if rfwd == cfwd else 1
            if s:
                rev = R[::-1]
                Q = np.where(rev < 4, 3 - rev, 4)
                jq = L - k - j
            else:
                Q, jq = R, j
            start = p - jq
            T = np.full(L, 4, np.int64)
            lo, hi = max(0, start), min(len(cat), start + L)
            if hi > lo:
                T[lo - start:hi - start] = cat[lo:hi]
            score, _ = banded_align(Q, T, band)
            return True, s, p, score
    return False, 0, -1, NEG_INF


def banded_align(query, target, band: int = 15):
    """Banded global DP. Returns (score, transcript) with transcript over
    {'M' match, 'X' mismatch, 'I' gap-in-target (consumes query),
     'D' gap-in-query (consumes target)}.
    """
    q = np.asarray(query, dtype=np.int64)
    r = np.asarray(target, dtype=np.int64)
    n, m = len(q), len(r)
    S = np.full((n + 1, m + 1), NEG_INF, dtype=np.int64)
    for j in range(0, min(m, band) + 1):
        S[0][j] = GAP * j
    for i in range(0, min(n, band) + 1):
        S[i][0] = GAP * i
    for i in range(1, n + 1):
        lo = max(1, i - band)
        hi = min(m, i + band)
        for j in range(lo, hi + 1):
            sub = MATCH if (q[i - 1] == r[j - 1] and q[i - 1] < 4) else MISMATCH
            best = S[i - 1][j - 1] + sub
            if S[i - 1][j] + GAP > best:
                best = S[i - 1][j] + GAP
            if S[i][j - 1] + GAP > best:
                best = S[i][j - 1] + GAP
            S[i][j] = best
    score = int(S[n][m])
    if score < NEG_INF // 2:     # no in-band path: no transcript
        return score, ""
    # traceback (diag > up > left)
    i, j = n, m
    ops = []
    while i > 0 or j > 0:
        s = S[i][j]
        if i > 0 and j > 0 and S[i - 1][j - 1] != NEG_INF:
            sub = MATCH if (q[i - 1] == r[j - 1] and q[i - 1] < 4) else MISMATCH
            if S[i - 1][j - 1] + sub == s:
                ops.append("M" if sub == MATCH else "X")
                i, j = i - 1, j - 1
                continue
        if i > 0 and S[i - 1][j] != NEG_INF and S[i - 1][j] + GAP == s:
            ops.append("I")
            i -= 1
            continue
        ops.append("D")
        j -= 1
    return score, "".join(reversed(ops))
