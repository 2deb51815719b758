"""Oracle de-Bruijn-graph unitig assembler. Frozen semantics: DESIGN.md §9."""

from __future__ import annotations

import numpy as np

from oracle.codec import bases_to_seq, canonical_int, kmer_to_bases, revcomp_int


def _revcomp_seq(seq: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    return "".join(comp[c] for c in reversed(seq))


def build_graph(spectrum, t: int):
    """Solid canonical k-mers (count >= t) -> (sorted node list, id map)."""
    keys, counts = spectrum.sorted_items()
    nodes = [v for v, c in zip(keys, counts) if c >= t]
    idx = {v: i for i, v in enumerate(nodes)}
    return nodes, idx


class _DBG:
    def __init__(self, nodes, idx, k):
        self.nodes = nodes
        self.idx = idx
        self.k = k
        self.sufmask = (1 << (2 * (k - 1))) - 1

    def orient(self, u: int, o: int) -> int:
        v = self.nodes[u]
        return v if o == 0 else revcomp_int(v, self.k)

    def out_edges(self, u: int, o: int):
        """List of (v, o') over b in 0..3 where the extension is a node."""
        f = self.orient(u, o)
        out = []
        for b in range(4):
            w = ((f & self.sufmask) << 2) | b
            c = canonical_int(w, self.k)
            v = self.idx.get(c)
            if v is not None:
                out.append((v, 0 if w == c else 1))
        return out

    def outdeg(self, u: int, o: int) -> int:
        return len(self.out_edges(u, o))


def _successors(g: _DBG):
    """succ[(u,o)] = (v,o') if the unique out-edge is unitig-internal."""
    n = len(g.nodes)
    succ = {}
    outdeg = [[g.outdeg(u, 0), g.outdeg(u, 1)] for u in range(n)]
    for u in range(n):
        for o in (0, 1):
            if outdeg[u][o] != 1:
                continue
            (v, op) = g.out_edges(u, o)[0]
            if v == u:
                continue  # self-edge guard
            if outdeg[v][1 - op] != 1:
                continue
            succ[(u, o)] = (v, op)
    return succ


def unitigs_of(nodes, idx, k: int) -> list[str]:
    """All unitig sequences, canonicalized + deduped per DESIGN.md §9."""
    g = _DBG(nodes, idx, k)
    succ = _successors(g)
    has_pred = set(succ.values())
    seqs = set()

    def emit_chain(chain):
        u, o = chain[0]
        bases = list(kmer_to_bases(g.orient(u, o), k))
        for (v, op) in chain[1:]:
            bases.append(g.orient(v, op) & 3)
        seq = bases_to_seq(np.array(bases, dtype=np.uint8))
        return min(seq, _revcomp_seq(seq))

    visited = set()
    # Linear chains: start at oriented nodes with no internal predecessor.
    for u in range(len(nodes)):
        for o in (0, 1):
            if (u, o) in has_pred:
                continue
            chain = [(u, o)]
            visited.add((u, o))
            cur = (u, o)
            while cur in succ:
                cur = succ[cur]
                if cur in visited:
                    break
                chain.append(cur)
                visited.add(cur)
            seqs.add(emit_chain(chain))
    # Cycles: everything still unvisited lies on succ-cycles.
    for u in range(len(nodes)):
        for o in (0, 1):
            if (u, o) in visited:
                continue
            # walk the cycle, collect members
            cyc = []
            cur = (u, o)
            while cur not in visited:
                visited.add(cur)
                cyc.append(cur)
                cur = succ[cur]
            start = min(range(len(cyc)), key=lambda i: cyc[i])
            if cyc[start][1] != 0:
                continue  # flipped twin emits this cycle
            chain = cyc[start:] + cyc[:start]
            seqs.add(emit_chain(chain))
    return sorted(seqs, key=lambda s: (-len(s), s))


def assemble_fasta(spectrum, t: int, k: int) -> str:
    """Full assemble stage: spectrum -> FASTA text (DESIGN.md §§9,11)."""
    nodes, idx = build_graph(spectrum, t)
    out = []
    for i, seq in enumerate(unitigs_of(nodes, idx, k)):
        out.append(f">unitig_{i} len={len(seq)}\n{seq}\n")
    return "".join(out)
