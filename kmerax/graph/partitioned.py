"""Bucket-partitioned assembly from a host-resident spectrum (SURVEY.md §7
hard-parts: configs 4-5 scale; round-3 evolution of graph/unitig.py).

The monolithic device path needs the full exact spectrum in HBM
(~10^9 distinct k-mers x 8B does not fit one chip). Here the spectrum stays
on the host (spectrum.host.HostSpectrum); only the SOLID nodes — typically
~genome-size, 20-60x smaller than the distinct set at sequencing error
rates — are materialized for the graph stage, and edge discovery streams
over contiguous partitions:

  per partition of solid nodes:
    device: 8 candidate extensions per node (4 bases x 2 orientations),
            canonicalized — vectorized jnp, one fixed-shape jit
    host:   membership joins against the packed solid key array
            (np.searchsorted — the "hash join" side of the batched
            collective joins, BASELINE.json:5, on one host)

Chain pointer-doubling + emission then run on O(#solid) arrays (device +
host), never on O(#distinct). Output is bit-identical to
graph.unitig.unitig_arrays -> emit_unitigs: the compacted node ids differ
but unitig sequences (the FASTA contract, DESIGN.md §9) are id-independent
and the edge rules are replicated exactly (later-base-wins successor
select; the finalize_internal rule).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.core.codec import canonical_words, revcomp_words
from kmerax.graph.build import shift_append_base
from kmerax.graph.unitig import chains_from_edges_np, emit_unitigs
from kmerax.spectrum.host import HostSpectrum, pack_rows, searchsorted_packed
from kmerax.utils.logging import get_logger

log = get_logger("kmerax.graph.partitioned")


@functools.partial(jax.jit, static_argnums=(1,))
def _extensions(rows: jnp.ndarray, k: int):
    """Candidate extensions of (n, W) forward k-mers.

    Returns (cand (n, 2, 4, W) canonical words, is_fwd (n, 2, 4)) for
    orientations o in {0=+,1=-} and appended bases b in 0..3 — the same
    (o, b) loop order as graph.build.build_edges.
    """
    fwd = rows
    rc = revcomp_words(rows, k)
    cands, fwds = [], []
    for f in (fwd, rc):
        cb, fb = [], []
        for b in range(4):
            wext = shift_append_base(f, b, k)
            cw, is_fwd = canonical_words(wext, k)
            cb.append(cw)
            fb.append(is_fwd)
        cands.append(jnp.stack(cb, axis=1))
        fwds.append(jnp.stack(fb, axis=1))
    return jnp.stack(cands, axis=1), jnp.stack(fwds, axis=1)


def solid_edges_host(suniq: np.ndarray, k: int,
                     partition_rows: int = 1 << 20,
                     n_procs: int = 1, pid: int = 0):
    """Edge arrays of the solid dBG, streamed over partitions.

    suniq: (C, W) uint32 SOLID canonical k-mers in global sorted order.
    Returns the edges dict of graph.build.build_edges with node ids being
    rows of suniq: succ_v/succ_o/outdeg/internal, each (C, 2).

    Multi-process: partitions round-robin across processes (pid handles
    partitions p % n_procs == pid; rows of unowned partitions stay zero) —
    the caller merges the disjoint per-process arrays by summation
    (assemble_host). Edge discovery — the 8 candidate extensions + packed
    binary-search joins per node, the dominant assembly cost — then scales
    1/N per host (round-3 VERDICT Missing #4).
    """
    C, W = suniq.shape
    skeys = pack_rows(suniq)
    outdeg = np.zeros((C, 2), np.int32)
    succ_v = np.zeros((C, 2), np.int32)
    succ_o = np.zeros((C, 2), np.int32)

    for pi, s in enumerate(range(0, max(C, 1), partition_rows)):
        if pi % n_procs != pid:
            continue
        e = min(s + partition_rows, C)
        if e == s:
            break
        cand, is_fwd = _extensions(jnp.asarray(suniq[s:e]), k)
        cand = np.asarray(cand)                       # (n, 2, 4, W)
        is_fwd = np.asarray(is_fwd)
        n = e - s
        q = pack_rows(cand.reshape(-1, W))
        idx = searchsorted_packed(skeys, q)
        idx = np.minimum(idx, max(C - 1, 0))
        if skeys.ndim == 1:
            found = skeys[idx] == q
        else:
            found = np.all(skeys[idx] == q, axis=1)
        found = found.reshape(n, 2, 4)
        idx = idx.reshape(n, 2, 4).astype(np.int32)
        # replicate build_edges' successor select: iterate b in 0..3,
        # later existing b overwrites (jnp.where chain)
        for o in range(2):
            ex = found[:, o, :]
            outdeg[s:e, o] = ex.sum(axis=1)
            v = np.zeros(n, np.int32)
            osel = np.zeros(n, np.int32)
            for b in range(4):
                hit = ex[:, b]
                v = np.where(hit, idx[:, o, b], v)
                osel = np.where(hit, np.where(is_fwd[:, o, b], 0, 1), osel)
            succ_v[s:e, o] = v
            succ_o[s:e, o] = osel

    partial = {"succ_v": succ_v, "succ_o": succ_o, "outdeg": outdeg}
    if n_procs > 1:
        return partial        # caller merges, then finalize_edges
    return finalize_edges(partial)


def finalize_edges(partial: dict) -> dict:
    """internal rule over COMPLETE edge arrays: outdeg(u,o)==1 &
    outdeg(v, 1-o')==1 & v!=u (graph.build.finalize_internal semantics)."""
    succ_v, succ_o, outdeg = (partial["succ_v"], partial["succ_o"],
                              partial["outdeg"])
    C = succ_v.shape[0]
    rows = np.arange(C, dtype=np.int32)
    tgt_back = outdeg[succ_v, 1 - succ_o]
    internal = ((outdeg == 1) & (tgt_back == 1)
                & (succ_v != rows[:, None]))
    return {**partial, "internal": internal}


def assemble_host(host: HostSpectrum, t: int, k: int,
                  partition_rows: int = 1 << 20,
                  suniq: np.ndarray | None = None) -> list[str]:
    """Unitig sequences from a host-resident spectrum.

    Scale contract (round-3 VERDICT Missing #4): device memory is bounded
    by the edge-discovery partition (the (partition_rows, 2, 4, W)
    extension batch) — the distinct set, the solid set, the edge tables,
    and the pointer-doubling chains never materialize on device
    (chains_from_edges_np runs on host numpy).

    Multi-process: edge-discovery partitions split round-robin across
    processes (1/N of the join work per host); the disjoint partial edge
    arrays merge by an allgather-sum, then every process derives identical
    chains + unitigs (deterministic; process 0 writes the FASTA).

    `suniq` overrides the solid-set source (sharded host spectra pass the
    gathered global solid array).
    """
    if suniq is None:
        sidx = host.solid_indices(t)
        suniq = np.ascontiguousarray(host.uniq[sidx])
    C = len(suniq)
    log.info("assemble[host]: %d solid k-mers", C)
    if C == 0:
        return []
    nproc, pid = jax.process_count(), jax.process_index()
    edges = solid_edges_host(suniq, k, partition_rows,
                             n_procs=nproc, pid=pid)
    if nproc > 1:
        # merge disjoint per-process partial arrays: unowned partitions
        # contributed zeros, so an elementwise allgather-sum reconstructs
        # the complete tables ("batched collective joins", BASELINE.json:5)
        from jax.experimental import multihost_utils as mh

        merged = {}
        for key in ("succ_v", "succ_o", "outdeg"):
            parts = np.asarray(mh.process_allgather(edges[key]))
            merged[key] = parts.sum(axis=0).astype(edges[key].dtype)
        edges = merged
    edges = finalize_edges(edges) if "internal" not in edges else edges
    arrays = chains_from_edges_np(suniq, np.ones(C, dtype=bool), edges, k)
    return emit_unitigs(suniq, arrays, k)
