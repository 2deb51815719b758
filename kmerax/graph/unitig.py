"""Unitig compaction by pointer doubling (SURVEY.md §2 #16).

The reference's pointer-chasing walk becomes O(log N) rounds of batched
gathers ("graph traversal → batched collective joins", BASELINE.json:5):
  phase A  detect succ-cycles + their minimal oriented node (min-doubling),
  phase B  cut each cycle before its minimal node, then end/distance
           doubling on the now-acyclic chain forest.
Sequence emission groups nodes by chain end on the host (output formatting
is host-side anyway). Semantics: DESIGN.md §9, bit-exact vs oracle.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.graph.build import build_edges
from kmerax.spectrum.histogram import solid_threshold


def unitig_arrays(uniq: jnp.ndarray, solid: jnp.ndarray, k: int):
    """Chain decomposition of the solid dBG.

    Returns dict of flat (2C,) arrays indexed by enc = 2*node + orientation:
      end (enc of chain end), dist (distance to end), is_start, was_cycle,
      active (participates in a chain), last_base (appended base, int32),
      plus the edge dict from build_edges.
    """
    edges = build_edges(uniq, solid, k)
    return chains_from_edges(uniq, solid, edges, k)


def chains_from_edges(uniq, solid, edges, k: int):
    """Pointer-doubling chain decomposition given full edge arrays (shared by
    the single-device and distributed graph paths)."""
    C = uniq.shape[0]
    enc_self = jnp.arange(2 * C, dtype=jnp.int32)

    internal = edges["internal"].reshape(-1)            # (2C,) [u*2+o]
    succ_enc = (edges["succ_v"] * 2 + edges["succ_o"]).reshape(-1)
    nxt = jnp.where(internal, succ_enc, enc_self)
    terminal = ~internal

    R = max(1, (2 * C - 1).bit_length())

    # Phase A: cycle detection + per-cycle min (min-doubling)
    m = enc_self
    e = nxt
    for _ in range(R):
        m = jnp.minimum(m, m[e])
        e = e[e]
    on_cycle = ~terminal[e]
    cut = on_cycle & (nxt == m)          # edge into the cycle's minimal node

    # Phase B: acyclic end/dist doubling
    internal2 = internal & ~cut
    nxt2 = jnp.where(cut, enc_self, nxt)
    d = jnp.where(internal2, 1, 0).astype(jnp.int32)
    e = nxt2
    for _ in range(R):
        d = d + d[e]
        e = e[e]
    end, dist = e, d

    has_pred = (jnp.zeros(2 * C, dtype=bool)
                .at[jnp.where(internal2, nxt2, 2 * C)]
                .set(True, mode="drop"))
    active = jnp.repeat(solid, 2)
    is_start = active & ~has_pred

    # appended base per node = last base of orient(u,o):
    #   o=0: low 2 bits of word0; o=1: 3 - top base of the forward kmer.
    top_shift = (2 * k - 2) % 32
    w = uniq.shape[1]
    first_base = (uniq[:, w - 1] >> top_shift) & 3
    lb0 = uniq[:, 0] & 3
    lb1 = 3 - first_base
    last_base = jnp.stack([lb0, lb1], axis=1).reshape(-1).astype(jnp.int32)

    return {"end": end, "dist": dist, "is_start": is_start,
            "was_cycle": on_cycle, "active": active,
            "last_base": last_base, **edges}


def chains_from_edges_np(uniq_np: np.ndarray, solid_np: np.ndarray,
                         edges: dict, k: int) -> dict:
    """Host-side (numpy) pointer-doubling chain decomposition — the
    scale path for graphs whose O(2C) flat arrays exceed one chip's HBM
    (round-3 VERDICT Missing #4: "walk chains host-side from partitioned
    successor tables"). Semantics identical to chains_from_edges; host RAM
    is the only bound and device memory stays at the edge-discovery
    partition size."""
    C = uniq_np.shape[0]
    enc_self = np.arange(2 * C, dtype=np.int64)

    internal = np.asarray(edges["internal"]).reshape(-1)
    succ_enc = (np.asarray(edges["succ_v"]).astype(np.int64) * 2
                + np.asarray(edges["succ_o"])).reshape(-1)
    nxt = np.where(internal, succ_enc, enc_self)
    terminal = ~internal

    R = max(1, int(2 * C - 1).bit_length())

    m = enc_self.copy()
    e = nxt.copy()
    for _ in range(R):
        m = np.minimum(m, m[e])
        e = e[e]
    on_cycle = ~terminal[e]
    cut = on_cycle & (nxt == m)

    internal2 = internal & ~cut
    nxt2 = np.where(cut, enc_self, nxt)
    d = np.where(internal2, 1, 0).astype(np.int64)
    e = nxt2.copy()
    for _ in range(R):
        d = d + d[e]
        e = e[e]
    end, dist = e, d

    has_pred = np.zeros(2 * C + 1, dtype=bool)
    has_pred[np.where(internal2, nxt2, 2 * C)] = True
    has_pred = has_pred[:2 * C]
    active = np.repeat(np.asarray(solid_np), 2)
    is_start = active & ~has_pred

    top_shift = (2 * k - 2) % 32
    w = uniq_np.shape[1]
    first_base = (uniq_np[:, w - 1] >> top_shift) & 3
    lb0 = uniq_np[:, 0] & 3
    lb1 = 3 - first_base
    last_base = np.stack([lb0, lb1], axis=1).reshape(-1).astype(np.int64)

    return {"end": end, "dist": dist, "is_start": is_start,
            "was_cycle": on_cycle, "active": active,
            "last_base": last_base, **edges}


_BASES = "ACGT"
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _rc(s: str) -> str:
    return "".join(_COMP[c] for c in reversed(s))


def emit_unitigs(uniq_np: np.ndarray, arrays: dict, k: int) -> list[str]:
    """Host-side sequence emission + canonicalization (DESIGN.md §9).

    Fully numpy-vectorized: all chain bases land in one flat uint8 code
    buffer via fancy indexing (plus its per-chain-reversed complement for
    canonicalization); per-unitig Python work is O(#unitigs) byte-slice
    operations, never per-base loops — chr21-scale chains stay cheap.
    """
    end = np.asarray(arrays["end"])
    dist = np.asarray(arrays["dist"])
    is_start = np.asarray(arrays["is_start"])
    was_cycle = np.asarray(arrays["was_cycle"])
    active = np.asarray(arrays["active"])
    last_base = np.asarray(arrays["last_base"]).astype(np.uint8)

    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return []
    # group by chain end; order within chain by descending dist (start first)
    order = np.lexsort((-dist[idx], end[idx]))
    idx = idx[order]
    ends = end[idx]
    first = np.concatenate([[True], ends[1:] != ends[:-1]])
    starts_at = np.nonzero(first)[0]
    bounds = np.append(starts_at, len(idx))
    heads = idx[starts_at]

    keep = is_start[heads] & ~(was_cycle[heads] & ((heads & 1) == 1))
    ci = np.nonzero(keep)[0]
    if len(ci) == 0:
        return []
    lo, hi = bounds[ci], bounds[ci + 1]
    nlens = hi - lo                                  # nodes per kept chain
    seq_lens = (k - 1) + nlens                       # k start + (n-1) body
    S = len(ci)
    offs = np.concatenate([[0], np.cumsum(seq_lens)])
    total = int(offs[-1])
    out = np.empty(total, np.uint8)

    # start k-mer decode, vectorized over chains: base i of the forward
    # k-mer lives at a static (word, shift) per i (core.kmers packing)
    hk = heads[ci]
    u, o = hk >> 1, hk & 1
    words = uniq_np[u].astype(np.uint32)             # (S, W)
    sb = np.empty((S, k), np.uint8)
    for i in range(k):
        wi = 0
        while not (max(k - 16 * (wi + 1), 0) <= i < k - 16 * wi):
            wi += 1
        shift = 2 * ((k - 16 * wi) - 1 - i)
        sb[:, i] = (words[:, wi] >> shift) & 3
    sb = np.where((o == 1)[:, None], 3 - sb[:, ::-1], sb)
    head_pos = offs[:-1, None] + np.arange(k)[None, :]
    out[head_pos.reshape(-1)] = sb.reshape(-1)

    # body bases: element e of idx belongs to chain cid[e] at rank r[e];
    # kept chains map to compact slot c; rank r >= 1 appends one base at
    # offs[c] + k - 1 + r
    cid = np.cumsum(first) - 1                       # per element of idx
    rank = np.arange(len(idx)) - starts_at[cid]
    slot = np.full(len(bounds) - 1, -1, np.int64)
    slot[ci] = np.arange(S)
    sl = slot[cid]
    sel = (sl >= 0) & (rank >= 1)
    pos = offs[sl[sel]] + (k - 1) + rank[sel]
    out[pos] = last_base[idx[sel]]

    # canonicalization: rc buffer = complement of per-chain-reversed codes
    e_pos = np.arange(total)
    seg = np.searchsorted(offs, e_pos, side="right") - 1
    rev_idx = offs[seg] + (offs[seg + 1] - 1) - e_pos
    rc = (3 - out)[rev_idx]

    table = np.frombuffer(b"ACGT", dtype=np.uint8)
    fwd_b = table[out].tobytes()
    rc_b = table[rc].tobytes()
    seqs = set()
    for c in range(S):
        a, b = int(offs[c]), int(offs[c + 1])
        seqs.add(min(fwd_b[a:b], rc_b[a:b]))
    return sorted((s.decode("ascii") for s in seqs),
                  key=lambda s: (-len(s), s))


def assemble_to_fasta(cfg, state, out_fasta: str,
                      corrected_fastq=None) -> int:
    """Assemble stage: exact spectrum -> unitig FASTA (SURVEY.md §3.3).

    If corrected_fastq (path or list of paths, e.g. paired-end R1/R2) is
    given, the spectrum is re-counted from it first (the pipeline assembles
    corrected reads, BASELINE.json:5).

    The host-resident partitioned path (graph/partitioned.py) is the
    default: device memory stays O(#solid), so assembly scales past one
    chip's HBM (configs 4-5). The monolithic device path remains for
    states that carry only device arrays (old checkpoints); both produce
    identical FASTA bytes (tests/golden/test_partitioned.py).
    """
    from kmerax.io.fasta import write_fasta
    from kmerax.pipeline.run import run_count

    if corrected_fastq is not None:
        paths = ([corrected_fastq] if isinstance(corrected_fastq, str)
                 else list(corrected_fastq))
        state = run_count(cfg, paths)
    t = state.threshold
    if getattr(state, "host", None) is not None:
        from kmerax.graph.partitioned import assemble_host
        from kmerax.spectrum.host_sharded import ShardedHostSpectrum

        host = state.host
        if isinstance(host, ShardedHostSpectrum) and host.n_procs > 1:
            # fully distributed assembly (round-5, graph/sharded.py): the
            # global solid set never materializes on any host — owner-
            # serves joins, distributed pointer doubling, per-owner
            # emission, rank-0 part merge (writes the FASTA itself)
            from kmerax.graph.sharded import assemble_sharded

            return assemble_sharded(host, t, cfg.k, out_fasta)
        if isinstance(host, ShardedHostSpectrum):
            host = host.local
        seqs = assemble_host(host, t, cfg.k)
    elif state.exact is not None:
        uniq, counts, _ = state.exact
        arrays = jax.jit(unitig_arrays, static_argnums=2)(
            uniq, counts >= t, cfg.k)
        seqs = emit_unitigs(np.asarray(uniq), arrays, cfg.k)
    else:
        raise ValueError("assembly needs exact_spectrum=True")
    # multi-host: every process derives identical unitigs from the
    # replicated spectrum (deterministic); process 0 is the sole writer.
    if jax.process_index() == 0:
        write_fasta(out_fasta, seqs)
    return len(seqs)
