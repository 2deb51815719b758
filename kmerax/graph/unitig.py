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


_BASES = "ACGT"
_COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def _rc(s: str) -> str:
    return "".join(_COMP[c] for c in reversed(s))


def emit_unitigs(uniq_np: np.ndarray, arrays: dict, k: int) -> list[str]:
    """Host-side sequence emission + canonicalization (DESIGN.md §9)."""
    end = np.asarray(arrays["end"])
    dist = np.asarray(arrays["dist"])
    is_start = np.asarray(arrays["is_start"])
    was_cycle = np.asarray(arrays["was_cycle"])
    active = np.asarray(arrays["active"])
    last_base = np.asarray(arrays["last_base"])

    idx = np.nonzero(active)[0]
    if len(idx) == 0:
        return []
    # group by chain end; order within chain by descending dist (start first)
    order = np.lexsort((-dist[idx], end[idx]))
    idx = idx[order]
    ends = end[idx]
    starts_at = np.nonzero(np.concatenate(
        [[True], ends[1:] != ends[:-1]]))[0]
    bounds = np.append(starts_at, len(idx))

    # decode the k bases of an oriented start k-mer
    def start_bases(enc: int) -> str:
        u, o = enc >> 1, enc & 1
        words = uniq_np[u]
        v = 0
        for i in range(len(words) - 1, -1, -1):
            v = (v << 32) | int(words[i])
        s = "".join(_BASES[(v >> (2 * (k - 1 - i))) & 3] for i in range(k))
        return s if o == 0 else _rc(s)

    seqs = set()
    for si in range(len(starts_at)):
        lo, hi = bounds[si], bounds[si + 1]
        chain = idx[lo:hi]
        s0 = chain[0]
        if not is_start[s0]:
            continue  # defensive: every active chain head must be a start
        if was_cycle[s0] and (s0 & 1) == 1:
            continue  # flipped twin emits this cycle (DESIGN.md §9)
        seq = start_bases(int(s0)) + "".join(
            _BASES[int(last_base[n])] for n in chain[1:])
        seqs.add(min(seq, _rc(seq)))
    return sorted(seqs, key=lambda s: (-len(s), s))


def assemble_to_fasta(cfg, state, out_fasta: str,
                      corrected_fastq=None) -> int:
    """Assemble stage: exact spectrum -> unitig FASTA (SURVEY.md §3.3).

    If corrected_fastq (path or list of paths, e.g. paired-end R1/R2) is
    given, the spectrum is re-counted from it first (the pipeline assembles
    corrected reads, BASELINE.json:5).
    """
    from kmerax.io.fasta import write_fasta
    from kmerax.pipeline.run import run_count

    if corrected_fastq is not None:
        paths = ([corrected_fastq] if isinstance(corrected_fastq, str)
                 else list(corrected_fastq))
        state = run_count(cfg, paths)
    if state.exact is None:
        raise ValueError("assembly needs exact_spectrum=True")
    uniq, counts, _ = state.exact
    t = state.threshold

    arrays = jax.jit(unitig_arrays, static_argnums=2)(
        uniq, counts >= t, cfg.k)
    seqs = emit_unitigs(np.asarray(uniq), arrays, cfg.k)
    # multi-host: every process derives identical unitigs from the
    # replicated spectrum (deterministic); process 0 is the sole writer.
    if jax.process_index() == 0:
        write_fasta(out_fasta, seqs)
    return len(seqs)
