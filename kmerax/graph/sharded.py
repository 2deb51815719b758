"""Range-sharded distributed assembly: no O(global) state or work per host
(round-4 VERDICT Missing #2 / task 2; SURVEY.md §2 SP/CP row).

The round-4 design bounded DEVICE memory but still gathered the entire
global solid set, allgather-summed full edge tables, and rebuilt every
chain on every host. Here the global solid array NEVER materializes
anywhere:

  * each process keeps only ITS key range's solid rows (the same ranges as
    spectrum.host_sharded.ShardedHostSpectrum — their concatenation in pid
    order IS the global sorted solid array, so global node id = local row
    + an allgathered row offset);
  * every cross-range access — the 8-way extension membership join, the
    successor-degree lookup of the unitig-internal rule, each pointer-
    doubling hop, and the has-pred scatter — is a CHUNKED OWNER-SERVES
    EXCHANGE: a bounded chunk of queries is allgathered, every process
    answers the ones its range owns (zeros elsewhere), and the disjoint
    per-range answers sum back exactly ("graph traversal -> batched
    collective joins", BASELINE.json:5). Transient footprint is
    O(P * chunk), never O(C);
  * pointer doubling runs on the distributed halves in O(log 2C) rounds,
    each a single (value, successor) exchange;
  * chains are emitted by the owner of their END node only — each element
    routes one fixed-size record (plus the head k-mer words for chain
    starts) to that owner; each process writes its chains to a part file
    and rank 0 merges them (dedupe + global order) into the FASTA, so only
    the writer ever holds the full output.

Byte-identical FASTA vs graph.unitig.emit_unitigs (the single-process
truth): same internal rule, same cycle cut, same head/keep rule, same
canonicalization and ordering (tests/dist/test_shard_host_spectrum.py).

The earlier device-mesh variant (graph/distributed.py, all-gather joins of
REPLICATED spectra) was deleted in round 5: it required the full spectrum
on every device, which is exactly what configs 4-5 rule out — this module
is the production scale-out of the SP/CP contract.
"""

from __future__ import annotations

import numpy as np
import jax

from kmerax.graph.partitioned import _extensions
from kmerax.spectrum.host import pack_rows, searchsorted_packed
from kmerax.spectrum.host_sharded import _allgather
from kmerax.utils.logging import get_logger

log = get_logger("kmerax.graph.sharded")

EXCHANGE_CHUNK = 1 << 18        # queries per exchange step (per process)
EXCHANGE_BUDGET = 256 << 20     # bytes allowed for the (P, P, chunk, V)
                                # transient answer gather per step


def _eff_chunk(chunk: int, n_out: int) -> int:
    """Clamp the per-step chunk so the P^2-shaped answer gather stays
    within EXCHANGE_BUDGET (P=16, V=2 -> 64k rows/step). Deterministic in
    (P, n_out), so every process derives the same collective schedule."""
    P = jax.process_count()
    cap = max(1 << 10, EXCHANGE_BUDGET // max(1, P * P * n_out * 8))
    return min(chunk, cap)

# observability for the scale tests: per-process peak resident rows of the
# last assemble_sharded call
LAST_STATS: dict = {}


def _chunked(n: int, chunk: int):
    for s in range(0, max(n, 1), chunk):
        yield s, min(s + chunk, n)
    if n == 0:
        return


def _exchange_serve(queries: np.ndarray, serve, n_out: int,
                    chunk: int = EXCHANGE_CHUNK) -> np.ndarray:
    """Answer int64 id `queries` (n,) from their range owners.

    serve(ids (m,)) -> (m, n_out) int64 for ids THIS process owns; ids
    outside its range must contribute zeros. Disjoint ownership makes the
    cross-process sum exact. Returns (n, n_out) int64.
    """
    chunk = _eff_chunk(chunk, n_out)
    n = len(queries)
    maxn = int(_allgather(np.asarray([n], np.int64)).max())
    out = np.zeros((n, n_out), np.int64)
    for s, e in _chunked(maxn, chunk):
        q = np.zeros(chunk, np.int64)
        m = max(0, min(e, n) - s)
        if m:
            q[:m] = queries[s:s + m]
        allq = _allgather(q)                       # (P, chunk)
        ans = serve(allq.reshape(-1))              # (P*chunk, n_out)
        allans = _allgather(
            ans.reshape(len(allq), chunk, n_out))  # (P, P, chunk, n_out)
        mine = allans.sum(axis=0)[jax.process_index()]   # (chunk, n_out)
        if m:
            out[s:s + m] = mine[:m]
    return out


def _exchange_member(cand: np.ndarray, skeys, row_lo: int,
                     chunk: int = EXCHANGE_CHUNK):
    """Distributed membership join: (n, W) uint32 candidate k-mers ->
    (found (n,), global solid row id (n,) int64). Every process searches
    every chunk against its OWN sorted solid keys; a key matches in at
    most one range, so found/id sum exactly."""
    chunk = _eff_chunk(chunk, 2)
    n, w = cand.shape
    maxn = int(_allgather(np.asarray([n], np.int64)).max())
    found = np.zeros(n, bool)
    gid = np.zeros(n, np.int64)
    nloc = len(skeys) if skeys.ndim == 1 else skeys.shape[0]
    for s, e in _chunked(maxn, chunk):
        q = np.full((chunk, w), 0xFFFFFFFF, np.uint32)
        m = max(0, min(e, n) - s)
        if m:
            q[:m] = cand[s:s + m]
        allq = _allgather(q).reshape(-1, w)        # (P*chunk, W)
        qk = pack_rows(allq)
        if nloc:
            idx = searchsorted_packed(skeys, qk)
            idx = np.minimum(idx, nloc - 1)
            if skeys.ndim == 1:
                hit = skeys[idx] == qk
            else:
                hit = np.all(skeys[idx] == qk, axis=1)
            ans = np.zeros((len(allq), 2), np.int64)
            ans[:, 0] = hit
            ans[:, 1] = np.where(hit, idx + row_lo, 0)
        else:
            ans = np.zeros((len(allq), 2), np.int64)
        allans = _allgather(ans.reshape(-1, chunk, 2))
        mine = allans.sum(axis=0)[jax.process_index()]
        if m:
            found[s:s + m] = mine[:m, 0] > 0
            gid[s:s + m] = mine[:m, 1]
    return found, gid


def _exchange_mark(targets: np.ndarray, flag: np.ndarray, enc_lo: int,
                   chunk: int = EXCHANGE_CHUNK) -> None:
    """Distributed scatter: set flag[t - enc_lo] = True for every process's
    `targets` (int64 enc ids) that fall in this process's enc range."""
    n = len(targets)
    maxn = int(_allgather(np.asarray([n], np.int64)).max())
    hi = enc_lo + len(flag)
    for s, e in _chunked(maxn, chunk):
        q = np.full(chunk, -1, np.int64)
        m = max(0, min(e, n) - s)
        if m:
            q[:m] = targets[s:s + m]
        allq = _allgather(q).reshape(-1)
        mine = allq[(allq >= enc_lo) & (allq < hi)]
        flag[mine - enc_lo] = True


def _solid_edges_local(suniq: np.ndarray, skeys, row_lo: int, k: int,
                       partition_rows: int):
    """Edges of THIS range's solid rows, successors as GLOBAL ids, via the
    distributed membership join. Returns succ_v/succ_o/outdeg (C_p, 2)."""
    C, W = suniq.shape
    outdeg = np.zeros((C, 2), np.int32)
    succ_v = np.zeros((C, 2), np.int64)
    succ_o = np.zeros((C, 2), np.int32)
    import jax.numpy as jnp

    # every process walks the same number of device partitions (exchange
    # collectives must line up); the global max partition count rules
    nparts_mine = max(1, -(-C // partition_rows)) if C else 1
    nparts = int(_allgather(
        np.asarray([nparts_mine], np.int64)).max())
    for pi in range(nparts):
        s = pi * partition_rows
        e = min(s + partition_rows, C)
        if s >= C:
            cand = np.zeros((0, 2, 4, W), np.uint32)
            is_fwd = np.zeros((0, 2, 4), bool)
            n = 0
        else:
            cand_d, fwd_d = _extensions(jnp.asarray(suniq[s:e]), k)
            cand = np.asarray(cand_d)
            is_fwd = np.asarray(fwd_d)
            n = e - s
        found, gid = _exchange_member(cand.reshape(-1, W), skeys, row_lo)
        found = found.reshape(n, 2, 4)
        gid = gid.reshape(n, 2, 4)
        for o in range(2):
            ex = found[:, o, :]
            outdeg[s:e, o] = ex.sum(axis=1)
            v = np.zeros(n, np.int64)
            osel = np.zeros(n, np.int32)
            for b in range(4):      # later existing base overwrites
                hit = ex[:, b]
                v = np.where(hit, gid[:, o, b], v)
                osel = np.where(hit,
                                np.where(is_fwd[:, o, b], 0, 1), osel)
            succ_v[s:e, o] = v
            succ_o[s:e, o] = osel
    return {"succ_v": succ_v, "succ_o": succ_o, "outdeg": outdeg}


def assemble_sharded(shost, t: int, k: int, out_fasta: str,
                     partition_rows: int = 1 << 20,
                     chunk: int = EXCHANGE_CHUNK) -> int:
    """Unitigs from a range-sharded host spectrum, fully distributed.

    Each process emits ONLY the chains whose end node its range owns,
    writes them to `{out_fasta}.part{pid}`, and rank 0 merges the parts
    (dedupe + global (-len, seq) order — identical bytes to the
    single-process emit_unitigs output). Per-process resident state stays
    O(C/P + P*chunk) throughout; only rank 0 ever holds the full
    sequence set (it writes the file anyway). Returns the unitig count
    (identical on every process).
    """
    pid, P = jax.process_index(), jax.process_count()
    sidx = shost.local.solid_indices(t)
    suniq = np.ascontiguousarray(shost.local.uniq[sidx])
    C_p, W = suniq.shape
    counts = _allgather(np.asarray([C_p], np.int64))[:, 0]
    offsets = np.concatenate([[0], np.cumsum(counts)])
    row_lo = int(offsets[pid])
    C = int(offsets[-1])
    log.info("assemble[sharded]: %d/%d solid k-mers resident (range %d/%d)",
             C_p, C, pid, P)
    LAST_STATS.clear()
    LAST_STATS.update(peak_solid_rows=C_p, peak_edge_rows=C_p,
                      global_solid=C)
    if C == 0:
        if pid == 0:
            from kmerax.io.fasta import write_fasta
            write_fasta(out_fasta, [])
        return 0
    skeys = pack_rows(suniq) if C_p else \
        (np.zeros((0, 2), np.uint64) if W > 2 else np.zeros(0, np.uint64))

    # ---- edges for my rows (distributed membership join)
    edges = _solid_edges_local(suniq, skeys, row_lo, k, partition_rows)
    succ_v, succ_o, outdeg = (edges["succ_v"], edges["succ_o"],
                              edges["outdeg"])

    # ---- internal rule: outdeg(u,o)==1 & outdeg(v,1-o')==1 & v!=u
    # (graph.partitioned.finalize_edges, with the target degree fetched
    # from the successor's owner)
    def serve_outdeg(ids):
        ids = np.asarray(ids)
        if C_p == 0:                   # empty range: nothing to serve
            return np.zeros((len(ids), 2), np.int64)
        ok = (ids >= row_lo) & (ids < row_lo + C_p)
        loc = np.where(ok, ids - row_lo, 0).astype(np.int64)
        vals = outdeg[loc].astype(np.int64)        # (m, 2)
        vals[~ok] = 0
        return vals

    tgt_deg = _exchange_serve(succ_v.reshape(-1), serve_outdeg, 2,
                              chunk)               # (2C_p, 2)
    tgt_back = tgt_deg[np.arange(2 * C_p),
                       (1 - succ_o.reshape(-1))].reshape(C_p, 2)
    rows_g = row_lo + np.arange(C_p, dtype=np.int64)
    internal = ((outdeg == 1) & (tgt_back == 1)
                & (succ_v != rows_g[:, None]))

    # ---- distributed pointer doubling over enc = 2*gid + o
    enc_lo = 2 * row_lo
    enc_self = enc_lo + np.arange(2 * C_p, dtype=np.int64)
    internal_f = internal.reshape(-1)
    succ_enc = (succ_v * 2 + succ_o).reshape(-1)
    nxt = np.where(internal_f, succ_enc, enc_self)
    terminal = ~internal_f

    R = max(1, int(2 * C - 1).bit_length())

    def hop(vals: np.ndarray, e: np.ndarray):
        """One doubling round: fetch (vals[e], e[e]) from e's owners."""
        def serve(ids):
            ids = np.asarray(ids)
            if C_p == 0:
                return np.zeros((len(ids), 2), np.int64)
            ok = (ids >= enc_lo) & (ids < enc_lo + 2 * C_p)
            loc = np.where(ok, ids - enc_lo, 0).astype(np.int64)
            out = np.stack([vals[loc], eloc[loc]], axis=1)
            out[~ok] = 0
            return out
        eloc = ecur
        got = _exchange_serve(e, serve, 2, chunk)
        return got[:, 0], got[:, 1]

    # phase A: cycle detection + per-cycle min
    m = enc_self.copy()
    ecur = nxt.copy()
    for _ in range(R):
        m_at_e, e_at_e = hop(m, ecur)
        m = np.minimum(m, m_at_e)
        ecur = e_at_e

    def serve_terminal(ids):
        ids = np.asarray(ids)
        if C_p == 0:
            return np.zeros((len(ids), 1), np.int64)
        ok = (ids >= enc_lo) & (ids < enc_lo + 2 * C_p)
        loc = np.where(ok, ids - enc_lo, 0).astype(np.int64)
        out = terminal[loc].astype(np.int64)[:, None]
        out[~ok] = 0
        return out

    on_cycle = _exchange_serve(ecur, serve_terminal, 1, chunk)[:, 0] == 0
    cut = on_cycle & (nxt == m)

    # phase B: acyclic end/dist doubling
    internal2 = internal_f & ~cut
    nxt2 = np.where(cut, enc_self, nxt)
    d = np.where(internal2, 1, 0).astype(np.int64)
    ecur = nxt2.copy()
    for _ in range(R):
        d_at_e, e_at_e = hop(d, ecur)
        d = d + d_at_e
        ecur = e_at_e
    end, dist = ecur, d

    has_pred = np.zeros(2 * C_p, bool)
    _exchange_mark(nxt2[internal2], has_pred, enc_lo, chunk)
    is_start = ~has_pred

    # ---- last_base per element (graph.unitig.chains_from_edges_np)
    top_shift = (2 * k - 2) % 32
    first_base = (suniq[:, W - 1] >> np.uint32(top_shift)) & 3
    lb0 = suniq[:, 0] & 3
    lb1 = 3 - first_base
    last_base = np.stack([lb0, lb1], axis=1).reshape(-1).astype(np.uint8)

    # ---- route emission records to the owner of each element's END node
    # record: [end, pos_in_chain (=dist_head - dist, resolved owner-side
    # from dist), dist, last_base | flags]  — head k-mer words ride only
    # on is_start records
    flags = (is_start.astype(np.int64)
             | (on_cycle.astype(np.int64) << 1)
             | ((enc_self & 1) << 2))
    rec = np.stack([end, dist, last_base.astype(np.int64), flags], axis=1)

    # owner-serves doesn't fit a variable-size route; emit via chunked
    # allgather-and-filter (the shard_spectrum pattern): each process keeps
    # records whose end id falls in its enc range
    def route_records(rows_arr, key_col):
        n = len(rows_arr)
        v = rows_arr.shape[1]
        maxn = int(_allgather(np.asarray([n], np.int64)).max())
        kept = []
        for s, e in _chunked(maxn, chunk):
            q = np.full((chunk, v), -1, np.int64)
            mm = max(0, min(e, n) - s)
            if mm:
                q[:mm] = rows_arr[s:s + mm]
            allq = _allgather(q).reshape(-1, v)
            keys = allq[:, key_col]
            mine = (keys >= enc_lo) & (keys < enc_lo + 2 * C_p)
            kept.append(allq[mine])
        return np.concatenate(kept, axis=0) if kept else \
            np.zeros((0, v), np.int64)

    my_rec = route_records(rec, 0)
    # head words: is_start elements carry their node's k-mer words + enc
    sidx_h = np.nonzero(is_start)[0]
    head_rows = np.concatenate(
        [end[sidx_h][:, None],                       # route key
         enc_self[sidx_h][:, None],
         suniq[sidx_h // 2].astype(np.int64)], axis=1)
    my_heads = route_records(head_rows, 0)

    LAST_STATS["emission_rows"] = int(len(my_rec))

    # ---- local emission per end-group (emit_unitigs semantics)
    seqs = _emit_groups(my_rec, my_heads, k, W)

    # ---- per-process part files; rank 0 merges (dedupe + global order)
    return _merge_parts(seqs, out_fasta)


def _emit_groups(my_rec: np.ndarray, my_heads: np.ndarray, k: int,
                 W: int) -> list[bytes]:
    """Emit this owner's chains, vectorized over chains (the emit_unitigs
    flat-buffer scheme, with in-chain rank = dist_head - dist).

    my_rec rows: [end, dist, last_base, flags(is_start|was_cycle<<1|
    orient<<2)]; my_heads rows: [end, enc, words...].
    """
    if len(my_rec) == 0:
        return []
    end_r = my_rec[:, 0]
    dist_r = my_rec[:, 1]
    lb_r = my_rec[:, 2].astype(np.uint8)
    fl_r = my_rec[:, 3]

    order = np.lexsort((-dist_r, end_r))
    end_s = end_r[order]
    first = np.concatenate([[True], end_s[1:] != end_s[:-1]])
    starts_at = np.nonzero(first)[0]
    bounds = np.append(starts_at, len(order))
    heads = order[starts_at]                      # max-dist element / group

    f = fl_r[heads]
    keep = ((f & 1) == 1) & ~(((f & 2) == 2) & (((f >> 2) & 1) == 1))
    ci = np.nonzero(keep)[0]
    if len(ci) == 0:
        return []
    lo, hi = bounds[ci], bounds[ci + 1]
    nlens = hi - lo
    seq_lens = (k - 1) + nlens
    S = len(ci)
    offs = np.concatenate([[0], np.cumsum(seq_lens)])
    total = int(offs[-1])
    out = np.empty(total, np.uint8)

    # head k-mer words per kept chain: my_heads maps end -> words
    h_end = my_heads[:, 0]
    h_sort = np.argsort(h_end, kind="stable")
    pos_h = np.searchsorted(h_end[h_sort], end_r[heads[ci]])
    hrows = my_heads[h_sort[pos_h]]               # aligned to kept chains
    assert np.array_equal(hrows[:, 0], end_r[heads[ci]]), \
        "chain start element missing from its end-owner"
    words = hrows[:, 2:2 + W].astype(np.uint32)   # (S, W)
    orient = (fl_r[heads[ci]] >> 2) & 1

    sb = np.empty((S, k), np.uint8)
    for i in range(k):
        wi = 0
        while not (max(k - 16 * (wi + 1), 0) <= i < k - 16 * wi):
            wi += 1
        shift = 2 * ((k - 16 * wi) - 1 - i)
        sb[:, i] = (words[:, wi] >> np.uint32(shift)) & 3
    sb = np.where((orient == 1)[:, None], 3 - sb[:, ::-1], sb)
    head_pos = offs[:-1, None] + np.arange(k)[None, :]
    out[head_pos.reshape(-1)] = sb.reshape(-1)

    # body bases: element e of group g sits at rank dist_head - dist
    cid = np.cumsum(first) - 1                    # group per sorted element
    slot = np.full(len(bounds) - 1, -1, np.int64)
    slot[ci] = np.arange(S)
    sl = slot[cid]
    rank = dist_r[heads][cid] - dist_r[order]
    sel = (sl >= 0) & (rank >= 1)
    pos = offs[sl[sel]] + (k - 1) + rank[sel]
    out[pos] = lb_r[order[sel]]

    # canonicalization: per-chain min(fwd, revcomp)
    e_pos = np.arange(total)
    seg = np.searchsorted(offs, e_pos, side="right") - 1
    rev_idx = offs[seg] + (offs[seg + 1] - 1) - e_pos
    rc = (3 - out)[rev_idx]
    table = np.frombuffer(b"ACGT", dtype=np.uint8)
    fwd_b = table[out].tobytes()
    rc_b = table[rc].tobytes()
    seqs = []
    for c in range(S):
        a, b = int(offs[c]), int(offs[c + 1])
        seqs.append(min(fwd_b[a:b], rc_b[a:b]))
    return seqs


def _merge_parts(seqs: list[bytes], out_fasta: str) -> int:
    """Write this process's chains to {out_fasta}.part{pid}; rank 0 merges
    every part into the final FASTA (set-dedupe + (-len, seq) order —
    emit_unitigs' output contract). Returns the global unitig count on
    every process."""
    import os

    from jax.experimental import multihost_utils

    pid, P = jax.process_index(), jax.process_count()
    part = f"{out_fasta}.part{pid}"
    with open(part, "wb") as fh:
        for s in seqs:
            fh.write(s)
            fh.write(b"\n")
    multihost_utils.sync_global_devices("kmerax:assemble_parts")
    n_unitigs = 0
    if pid == 0:
        from kmerax.io.fasta import write_fasta

        allseq = set()
        for p in range(P):
            with open(f"{out_fasta}.part{p}", "rb") as fh:
                for line in fh:
                    line = line.rstrip(b"\n")
                    if line:
                        allseq.add(line)
        final = sorted((s.decode("ascii") for s in allseq),
                       key=lambda s: (-len(s), s))
        write_fasta(out_fasta, final)
        n_unitigs = len(final)
    multihost_utils.sync_global_devices("kmerax:assemble_merge")
    for_all = _allgather(np.asarray([n_unitigs], np.int64)).sum()
    if pid == 0:
        for p in range(P):
            os.remove(f"{out_fasta}.part{p}")
    return int(for_all)
