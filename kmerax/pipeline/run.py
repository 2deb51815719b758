"""Pipeline orchestrator: count → correct → assemble stages (SURVEY.md §2 #17).

Single-host driver over the streamed batcher; every device step is one jit
with fixed shapes, so each stage compiles exactly once. Stage call stacks
mirror SURVEY.md §3.1-3.2. The distributed (mesh) variants live in
kmerax/dist and kmerax/spectrum/sharded and plug in via the same jit steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from kmerax.config import KmeraxConfig
from kmerax.core.codec import canonical_words
from kmerax.core.kmers import extract_kmers
from kmerax.io.batcher import BackgroundBatcher
from kmerax.io.fastq import FastqWriter
from kmerax.ops.correct import correct_batch
from kmerax.spectrum import (
    BloomParams, SENTINEL_WORD, insert, lookup_sorted, make_table,
)
from kmerax.spectrum.exact import mask_invalid, sentinel_rows
from kmerax.spectrum.histogram import count_histogram, solid_threshold
from kmerax.utils.logging import get_logger
from kmerax.utils.metrics import MetricsWriter
from kmerax.utils.tracing import maybe_trace

log = get_logger("kmerax.pipeline")


@dataclass
class CountState:
    cfg: KmeraxConfig
    bloom_table: jnp.ndarray        # (width,) single dev | (S,width) sharded-merged
    exact: Optional[tuple]          # (uniq, counts, n_unique) or None
    hist: Optional[np.ndarray]
    threshold: int
    n_reads: int
    n_kmers: int
    sharded: Optional[object] = None  # ShardedParams when counted on a mesh
    host: Optional[object] = None   # HostSpectrum — always set when
                                    # exact_spectrum=True; scales past HBM
    sharded_table: Optional[jnp.ndarray] = None  # (S, width/S) merged
                                    # bucket-sharded table (mesh counts):
                                    # the routed-correction spectrum for
                                    # tables too large to replicate/fuse

    # NOTE: correction consumers use make_correct_step (spectrum threaded
    # as a jit ARGUMENT) — closure-style query/solid/eval accessors were
    # removed in round 4 because closing the table into a jit embeds it as
    # an XLA literal (100s compiles + per-process cache misses).


# replicated merged-table ceiling: past this the mesh count keeps the
# spectrum bucket-sharded only and correction routes probes to owners
REPLICATE_TABLE_BUDGET = 1 << 29        # 512 MB

# observability: the spectrum path the last mesh correct step selected
# (fused-pallas | routed-sharded | replicated-bitmap), how many
# route-overflow batch replays the last mesh count performed, and the
# route_safety level the stage ENDED at (decay hygiene: should be back at
# baseline in steady state)
LAST_CORRECT_PATH = None
LAST_COUNT_RETRIES = 0
LAST_ROUTE_SAFETY = None


def _bloom_params(cfg: KmeraxConfig, k: int) -> BloomParams:
    counter = cfg.bloom_counter
    if counter == "auto":
        # p16 exactly when it rescues VMEM/Pallas residency (the counting
        # VMEM cliff, round-3 VERDICT Missing #3); mesh counts keep i32
        # shards (psum of packed halfwords would carry across counters).
        # Off the TPU backend there is no Pallas/VMEM residency to rescue
        # — p16 would only add unpack/pack work and SAT16 saturation
        # (ADVICE r4 low #2)
        import jax

        from kmerax.spectrum.pallas_bloom import VMEM_BUDGET

        width = 1 << cfg.bloom_log2_width
        single = cfg.mesh_data * cfg.mesh_bucket == 1
        counter = "p16" if (single and jax.default_backend() == "tpu"
                            and width * 4 > VMEM_BUDGET
                            and width * 2 <= VMEM_BUDGET) else "i32"
    return BloomParams(k, cfg.bloom_log2_width, cfg.bloom_hashes,
                       cfg.minimizer_m, (cfg.num_buckets - 1).bit_length(),
                       cfg.bucket_scheme, counter=counter)


def _wire_rows(bases, lengths):
    """Trace-time wire dispatch: (int32 rows, rewrap) for a correct step.

    uint8 input = 2-bit packed wire (io/wire.py): unpack in-graph (pad=4
    rebuilt from lengths; the up-to-3 extra columns are pure padding) and
    re-pack the corrected rows for the D2H leg. int8 = legacy wire."""
    from kmerax.io import wire

    if bases.dtype == jnp.uint8:
        rows = wire.unpack2_dev_all(bases, lengths).astype(jnp.int32)
        return rows, wire.pack2_dev
    return bases.astype(jnp.int32), lambda f: f.astype(jnp.int8)


def make_correct_step(params, table, t, *, rounds, max_runs, max_edits):
    """Jitted single-device correct step with the spectrum threaded as an
    ARGUMENT: (step, spec) where step(spec, bases, lengths).

    Closing the table into the jit (the round-1..3 pattern) embedded it as
    an XLA literal: ~100 s compiles for the 64 MB default table, 50-230 MB
    persistent-cache entries, and a cache MISS on every process because the
    table bytes enter the cache key (measured round 4,
    experiments/e2e_profile). With the table as an argument the program is
    table-independent: seconds to compile once, cache hits forever after.

    The spectrum path mirrors spectrum.bloom.make_solid_fn: Pallas
    VMEM-resident query (+ fused eval when it applies) on TPU, else the
    packed solidity bitmap.
    """
    from kmerax.ops.correct import correct_batch as _cb
    from kmerax.ops.pallas_correct import eval_entries_fused, \
        make_fused_eval
    from kmerax.spectrum.bloom import query_solid, solidity_bitmap
    from kmerax.spectrum.pallas_bloom import pallas_insert_ok, \
        query_solid_pallas

    k = params.k
    kw = dict(rounds=rounds, max_runs=max_runs, max_edits=max_edits)
    # wire-dtype dispatch (io/wire.py): uint8 rows are the 2-bit packed
    # wire — unpack AND re-pack inside the one jitted step (a separate
    # pack/unpack dispatch loses on per-dispatch link overhead); int8 rows
    # are the legacy wire. Device compute stays int32 either way.
    if pallas_insert_ok(params, table_entries=table.shape[0]):
        fused = make_fused_eval(params, table, t) is not None

        @jax.jit
        def step(spec, bases, lengths):
            sf = lambda cw, v: query_solid_pallas(params, spec, t, cw, v)
            ef = None
            if fused:
                ef = lambda bs, ln, lj, er, ei: eval_entries_fused(
                    params, spec, t, bs, ln, lj, er, ei)
            rows, rewrap = _wire_rows(bases, lengths)
            fixed, ne = _cb(rows, lengths, k, t,
                            solid_fn=sf, eval_fn=ef, **kw)
            return rewrap(fixed), ne

        return step, table

    bitmap = jax.jit(solidity_bitmap, static_argnums=0)(params, table, t)

    @jax.jit
    def step(spec, bases, lengths):
        sf = lambda cw, v: query_solid(params, spec, cw, v)
        rows, rewrap = _wire_rows(bases, lengths)
        fixed, ne = _cb(rows, lengths, k, t, solid_fn=sf, **kw)
        return rewrap(fixed), ne

    return step, bitmap


def _feed_global(arr, sharding):
    """Place a host batch array onto the mesh (SURVEY.md §3.4): plain
    device_put single-process; in multi-host runs each process supplies only
    its local_batch_slice rows via make_array_from_process_local_data (every
    process streams the same global batches, so slices line up)."""
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    from kmerax.dist.mesh import local_batch_slice

    arr = np.asarray(arr)
    sl = local_batch_slice(sharding.mesh, arr.shape[0])
    return jax.make_array_from_process_local_data(
        sharding, arr[sl], global_shape=arr.shape)


def _to_host_global(x) -> np.ndarray:
    """Device array -> full global numpy array on every process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _use_per_host_io(cfg: KmeraxConfig, paths) -> bool:
    """Per-host input sharding applies with at least one file per process
    OR plain (non-.gz) files, which split into record-aligned byte ranges
    (io.shard.byte_shards) — a single big FASTQ still parses 1/N per host
    (round-3 VERDICT Weak #4)."""
    if jax.process_count() <= 1 or not cfg.per_host_io:
        return False
    return (len(paths) >= jax.process_count()
            or not any(str(p).endswith(".gz") for p in paths))


def _global_batches(cfg: KmeraxConfig, paths, reads_sh):
    """Yield (global bases array, real reads in batch) for the mesh count
    loop (SURVEY.md §3.1).

    Per-host mode (SURVEY.md §1 L1): each process parses ONLY its own
    size-balanced file shard (io/shard.py) and contributes its local rows;
    processes stay in lockstep by exchanging (has_more, n_local) each
    batch, with exhausted processes feeding empty rows. Counting is
    order-free, so the final spectrum is bit-identical to the
    single-stream order (DESIGN.md §13).
    """
    if not _use_per_host_io(cfg, paths):
        for batch in BackgroundBatcher(paths, cfg.batch_reads,
                                       cfg.max_read_len):
            yield _feed_global(batch.bases.astype(np.int8),
                               reads_sh), batch.n
        return

    from jax.experimental import multihost_utils as mh
    from kmerax.io.shard import local_shards

    nproc, pid = jax.process_count(), jax.process_index()
    lp = local_shards(paths, nproc, pid)
    log.info("count[per-host]: process %d parses %d shards of %d files: %s",
             pid, len(lp), len(paths), [str(p) for p in lp])
    assert cfg.batch_reads % nproc == 0
    B_local = cfg.batch_reads // nproc
    empty = np.full((B_local, cfg.max_read_len), 4, np.int8)
    it = iter(BackgroundBatcher(lp, B_local, cfg.max_read_len)) if lp \
        else iter(())
    while True:
        batch = next(it, None)
        flags = np.asarray(mh.process_allgather(np.asarray(
            [0 if batch is None else 1,
             0 if batch is None else batch.n], dtype=np.int64)))
        if flags[:, 0].sum() == 0:
            break
        rows = empty if batch is None else batch.bases.astype(np.int8)
        bases = jax.make_array_from_process_local_data(
            reads_sh, rows,
            global_shape=(cfg.batch_reads, cfg.max_read_len))
        yield bases, int(flags[:, 1].sum())


def _count_steps(cfg: KmeraxConfig, k: int):
    """Build the jitted per-batch count step(s) for this config.

    Exact-spectrum accumulation is AMORTIZED: per batch, raw masked k-mer
    rows are appended into a pending buffer (one dynamic_update_slice — no
    sort); the O(cap log cap) sort+dedup merge runs only when the buffer
    fills (every PEND_M batches) and once at stage end. Counts are
    order-independent sums, so the merged spectrum is bit-identical to the
    per-batch-merge formulation for any merge schedule (DESIGN.md §13).
    """
    params = _bloom_params(cfg, k)
    w = (k + 15) // 16
    pend_rows = cfg.batch_reads * (cfg.max_read_len - k + 1)
    # buffer ~cap/2 raw rows per flush: flush count stays O(stream/cap)
    # regardless of batch size, so per-batch cost is flat at any scale
    pend_m = max(1, (cfg.exact_capacity // 2) // pend_rows)
    P = pend_m * pend_rows

    # wire-dtype dispatch (io/wire.py): uint8 rows are the 2-bit packed
    # wire and unpack in-graph (pad rebuilt from lengths); int8 rows are
    # the legacy wire. One dispatch per batch either way — a separate
    # unpack step measurably LOSES on the tunnel (per-dispatch overhead
    # outweighs the byte savings; experiments, round 5).
    def _rows(bases, lengths):
        from kmerax.io import wire

        if bases.dtype == jnp.uint8:
            # slice back to max_read_len: pend_rows sizing depends on it
            bases = wire.unpack2_dev_all(bases,
                                         lengths)[:, :cfg.max_read_len]
        return bases.astype(jnp.int32)

    @jax.jit
    def bloom_step(table, bases, lengths):
        words, valid = extract_kmers(_rows(bases, lengths), k)
        canon, _ = canonical_words(words, k)
        table = insert(params, table, canon, valid)
        return table, jnp.sum(valid.astype(jnp.int32))

    @jax.jit
    def pend_append(pending, off, bases, lengths):
        words, valid = extract_kmers(_rows(bases, lengths), k)
        canon, _ = canonical_words(words, k)
        flat = mask_invalid(canon, valid).reshape(-1, w)
        return jax.lax.dynamic_update_slice(pending, flat, (off, 0))

    def exact_flush(uniq_np, counts_np, pending, off):
        """Host merge (spectrum.exact.np_merge_counted): giant 1-D device
        sorts pad ~64x on TPU — one D2H of the raw buffer + a host radix
        merge is far cheaper and bit-identical (counts are order-free sums).
        """
        from kmerax.spectrum.exact import np_merge_counted

        pend = np.asarray(pending)[:off]
        pend = pend[~np.all(pend == np.uint32(SENTINEL_WORD), axis=1)]
        rows = np.concatenate([uniq_np, pend], axis=0)
        wts = np.concatenate(
            [counts_np, np.ones(len(pend), dtype=np.int64)])
        return np_merge_counted(rows, wts)

    return params, bloom_step, pend_append, exact_flush, P, pend_rows


def run_count(cfg: KmeraxConfig, paths, k: Optional[int] = None,
              metrics: Optional[MetricsWriter] = None) -> CountState:
    """Count pass (SURVEY.md §3.1): stream batches -> Bloom (+ exact)."""
    if cfg.mesh_data * cfg.mesh_bucket > 1:
        return _run_count_sharded(cfg, paths, k, metrics)
    k = k or cfg.k
    m = metrics or MetricsWriter(None)
    (params, bloom_step, pend_append, exact_flush, P,
     pend_rows) = _count_steps(cfg, k)
    table = make_table(params)
    exact = None
    pending = None
    host_ex = None
    off = 0
    if cfg.exact_spectrum:
        cap, w = cfg.exact_capacity, (k + 15) // 16
        host_ex = (np.zeros((0, w), np.uint32), np.zeros(0, np.int64))
        pending = sentinel_rows(P, w)

    n_reads = n_kmers = 0
    # 2-bit wire (io/wire.py): N-free batches cross the link packed 4
    # bases/byte (uint8) and unpack inside the jitted steps; batches with
    # real Ns fall back to the int8 wire — identical rows either way
    from kmerax.io import wire

    m.stage_start("count")
    with maybe_trace("count"):
        for batch in BackgroundBatcher(paths, cfg.batch_reads,
                                       cfg.max_read_len):
            if cfg.wire_pack and not wire.batch_has_n(batch.bases,
                                                      batch.lengths):
                bases = jnp.asarray(wire.pack2_host(batch.bases))
            else:
                # int8 wire: 4x fewer H2D bytes than int32 (device casts)
                bases = jnp.asarray(batch.bases.astype(np.int8))
            lens = jnp.asarray(batch.lengths)
            table, nk = bloom_step(table, bases, lens)
            if host_ex is not None:
                pending = pend_append(pending, jnp.int32(off), bases, lens)
                off += pend_rows
                if off == P:
                    host_ex = exact_flush(*host_ex, pending, off)
                    off = 0
            n_reads += batch.n
            n_kmers += int(nk)
    if host_ex is not None and off > 0:
        host_ex = exact_flush(*host_ex, pending, off)
    hist = None
    host = None
    if host_ex is not None:
        from kmerax.spectrum.host import HostSpectrum

        uniq_np, counts_np = host_ex
        host = HostSpectrum(uniq_np, counts_np, k)
        n_unique = host.n_unique
        cap = cfg.exact_capacity
        log.info("count: %d reads, %d k-mers, %d distinct",
                 n_reads, n_kmers, n_unique)
        if n_unique < cap:
            exact = host.to_device(cap)
        else:
            # past device capacity the spectrum stays host-resident; the
            # later stages stream partitions (graph/partitioned.py) — no
            # hard overflow at configs 4-5 scale (SURVEY.md §7 hard-parts)
            log.info("count: %d distinct >= capacity %d — spectrum kept "
                     "host-resident", n_unique, cap)
        hist = host.histogram(255)

    t = solid_threshold(hist, cfg.threshold) if hist is not None \
        else (cfg.threshold if cfg.threshold is not None else 2)
    if cfg.threshold is None and hist is None:
        raise ValueError("auto threshold needs exact_spectrum=True")
    m.stage_end("count", reads=n_reads, kmers=n_kmers, threshold=t)
    log.info("count: threshold=%d", t)
    return CountState(cfg, table, exact, hist, t, n_reads, n_kmers,
                      host=host)


def _run_count_sharded(cfg: KmeraxConfig, paths, k, metrics) -> CountState:
    """Distributed count pass over the ("data","bucket") mesh (DESIGN.md §12).

    Exact-spectrum accumulation mirrors the single-device amortized design:
    routed raw rows append into a per-device pending buffer; the HOST
    drains every process's local shards at wraparound and radix-merges —
    no per-shard capacity wall, so configs 4-5 cannot overflow (round-2
    VERDICT Missing #1). Counts are order-free sums, so any flush schedule
    yields the bit-identical spectrum (DESIGN.md §13)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kmerax.dist.mesh import AXIS_BUCKET, AXIS_DATA, MeshSpec, make_mesh
    from kmerax.spectrum.host import HostSpectrum
    from kmerax.spectrum.sharded import (
        ShardedParams, allgather_spectrum, flush_pending_local,
        make_sharded_state, merge_and_replicate, recv_rows,
        sharded_insert_step,
    )

    k = k or cfg.k
    m = metrics or MetricsWriter(None)
    mesh = make_mesh(MeshSpec(cfg.mesh_data, cfg.mesh_bucket))
    D, S = cfg.mesh_data, cfg.mesh_bucket
    if cfg.batch_reads % (D * S) != 0:
        raise ValueError("batch_reads must divide by mesh size")
    sp = ShardedParams(_bloom_params(cfg, k), n_shards=S)
    w = (k + 15) // 16
    pend_rows = None
    step_rows = 0
    if cfg.exact_spectrum:
        n_flat = (cfg.batch_reads // (D * S)) * (cfg.max_read_len - k + 1)
        step_rows = recv_rows(sp, n_flat)
        # buffer ~cap/2 raw rows globally per flush (flat per-batch cost)
        pend_m = max(1, (cfg.exact_capacity // 2) // (step_rows * D * S))
        pend_rows = pend_m * step_rows
    table, pending = make_sharded_state(sp, mesh, pend_rows, k)
    step = sharded_insert_step(sp, mesh, k, pend_rows is not None)
    reads_sh = NamedSharding(mesh, P((AXIS_DATA, AXIS_BUCKET)))

    host_rows = np.zeros((0, w), np.uint32)
    host_cnts = np.zeros(0, np.int64)

    def flush(pending, off):
        nonlocal host_rows, host_cnts
        from kmerax.spectrum.exact import np_merge_counted
        raw = flush_pending_local(pending, off, k)
        host_rows, host_cnts = np_merge_counted(
            np.concatenate([host_rows, raw], axis=0),
            np.concatenate([host_cnts, np.ones(len(raw), np.int64)]))
        log.info("count[mesh]: flushed %d raw rows (%d distinct resident)",
                 len(raw), len(host_rows))

    if isinstance(paths, str):
        paths = [paths]
    n_reads = n_kmers = 0
    off = 0
    global LAST_COUNT_RETRIES, LAST_ROUTE_SAFETY
    LAST_COUNT_RETRIES = 0
    import dataclasses

    # route-safety hygiene (round-4 VERDICT Weak #8): compiled steps are
    # CACHED per capacity level (a replay never re-traces a level it has
    # seen), and after DECAY_AFTER overflow-free batches the capacity
    # halves back toward baseline — one adversarial batch no longer
    # inflates the routed-buffer memory for the rest of the stage.
    base_safety = sp.route_safety
    steps_by_safety = {base_safety: step}
    clean_streak = 0
    DECAY_AFTER = 8

    def _set_safety(new_safety: int):
        nonlocal sp, step, step_rows, pend_rows, pending, off
        sp = dataclasses.replace(sp, route_safety=new_safety)
        if pending is not None:
            if off > 0:
                flush(pending, off)
            off = 0
            step_rows = recv_rows(sp, n_flat)
            pend_m = max(1, (cfg.exact_capacity // 2)
                         // (step_rows * D * S))
            pend_rows = pend_m * step_rows
            _, pending = make_sharded_state(sp, mesh, pend_rows, k)
        if new_safety not in steps_by_safety:
            steps_by_safety[new_safety] = sharded_insert_step(
                sp, mesh, k, pending is not None)
        step = steps_by_safety[new_safety]

    import os as _os
    _memdbg = _os.environ.get("KMERAX_MEMDEBUG")

    def _rss_mb():
        with open("/proc/self/status") as fh:
            for ln in fh:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) // 1024
        return -1

    _nb = 0
    m.stage_start("count")
    for bases, n_real in _global_batches(cfg, paths, reads_sh):
        _nb += 1
        if _memdbg and _nb % 25 == 0:
            log.info("count[mesh] memdbg: batch %d rss=%dMB", _nb,
                     _rss_mb())
        while True:
            table, pending, nk, ovf = step(table, pending, bases,
                                           jnp.int32(off))
            if int(ovf) == 0:
                break
            # route overflow: the device step was a no-op (gated update in
            # sharded_insert_step) — double the per-destination capacity
            # and REPLAY this batch; counts stay bit-identical because
            # nothing was inserted (SURVEY.md §7 recirculation)
            LAST_COUNT_RETRIES += 1
            new_safety = sp.route_safety * 2
            if new_safety > 4 * S:
                raise RuntimeError(
                    f"bucket route overflow persists at route_safety="
                    f"{sp.route_safety} ({int(ovf)} k-mers)")
            log.info("count[mesh]: route overflow (%d k-mers) — retrying "
                     "batch with route_safety=%d", int(ovf), new_safety)
            _set_safety(new_safety)
            clean_streak = 0
        if pending is not None:
            off += step_rows
            if off + step_rows > pend_rows:
                flush(pending, off)
                off = 0
        n_reads += n_real
        n_kmers += int(nk)
        if sp.route_safety > base_safety:
            clean_streak += 1
            if clean_streak >= DECAY_AFTER:
                log.info("count[mesh]: %d clean batches — decaying "
                         "route_safety %d -> %d", clean_streak,
                         sp.route_safety, max(base_safety,
                                              sp.route_safety // 2))
                _set_safety(max(base_safety, sp.route_safety // 2))
                clean_streak = 0
    if pending is not None and off > 0:
        flush(pending, off)
    LAST_ROUTE_SAFETY = sp.route_safety

    from kmerax.spectrum.sharded import merge_keep_sharded
    merged_sharded = merge_keep_sharded(mesh)(table)  # (S, width/S) sharded
    if sp.bloom.width * 4 <= REPLICATE_TABLE_BUDGET:
        merged = merge_and_replicate(mesh)(table)    # (width,) replicated
    else:
        # tables past the replication budget stay bucket-sharded only;
        # correction runs the routed-query path (round-3 VERDICT Missing
        # #2) and never materializes a per-device full-width copy
        log.info("count[mesh]: table %d B > replicate budget — keeping "
                 "bucket-sharded only (routed correction)",
                 sp.bloom.width * 4)
        merged = None
    hist = None
    exact_state = None
    host = None
    if cfg.exact_spectrum:
        # None = auto: the range-sharded (~1/P-resident) spectrum is the
        # multi-host DEFAULT; cfg False forces full replication
        shard = cfg.shard_host_spectrum
        shard = True if shard is None else shard
        if shard and jax.process_count() > 1:
            from kmerax.spectrum.host_sharded import shard_spectrum

            host = shard_spectrum(host_rows, host_cnts, k)
            n_unique = host.n_unique
        else:
            uniq_np, counts_np = allgather_spectrum(host_rows, host_cnts)
            host = HostSpectrum(uniq_np, counts_np, k)
            n_unique = host.n_unique
            if n_unique < cfg.exact_capacity:
                exact_state = host.to_device(cfg.exact_capacity)
            else:
                log.info("count[mesh]: %d distinct >= capacity %d — "
                         "spectrum kept host-resident", n_unique,
                         cfg.exact_capacity)
        hist = host.histogram(255)
        log.info("count[mesh %dx%d]: %d reads, %d k-mers, %d distinct",
                 D, S, n_reads, n_kmers, n_unique)

    t = solid_threshold(hist, cfg.threshold) if hist is not None \
        else (cfg.threshold if cfg.threshold is not None else 2)
    if cfg.threshold is None and hist is None:
        raise ValueError("auto threshold needs exact_spectrum=True")
    m.stage_end("count", reads=n_reads, kmers=n_kmers, threshold=t,
                route_retries=LAST_COUNT_RETRIES,
                route_safety_end=sp.route_safety)
    return CountState(cfg, merged, exact_state, hist, t, n_reads, n_kmers,
                      sharded=sp, host=host, sharded_table=merged_sharded)


def _correct_step_mesh(cfg: KmeraxConfig, state: CountState, mesh=None,
                       batch_reads: int | None = None):
    """Mesh-distributed correct step (SURVEY.md §3.2): reads sharded over
    ("data","bucket"), every device corrects its own rows against the
    replicated solidity bitmap (2^LW bits — 128x smaller than the table, so
    replication is cheap; BASELINE.json:5 DP correction). Per-read work is
    independent, so shard_map(correct_batch) is bit-identical to the
    single-device path (batch-split invariance, DESIGN.md §13).

    `mesh` defaults to the cfg global mesh; per-host independent correction
    passes a LOCAL mesh (this process's devices only) so no collective or
    cross-host transfer exists anywhere in the stage."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from kmerax.dist.mesh import AXIS_BUCKET, AXIS_DATA, MeshSpec, make_mesh
    from kmerax.spectrum.bloom import query_solid, solidity_bitmap

    local_only = mesh is not None
    if mesh is None:
        mesh = make_mesh(MeshSpec(cfg.mesh_data, cfg.mesh_bucket))
    ndev = mesh.devices.size
    B = batch_reads or cfg.batch_reads
    if B % ndev != 0:
        raise ValueError("batch_reads must divide by mesh size")
    k, t = cfg.k, state.threshold
    params = _bloom_params(cfg, k)
    table = state.bloom_table
    if local_only and table is not None:
        # the merged table is replicated on the GLOBAL mesh; re-home a
        # local copy so the whole stage touches only this process's devices
        table = jax.device_put(np.asarray(table),
                               NamedSharding(mesh, P(None)))
    rspec = P((AXIS_DATA, AXIS_BUCKET))

    # correction spectrum priority (round-3 VERDICT Missing #2):
    #   1. fused Pallas lookup+edit against a replicated VMEM table
    #      (hash scheme, TPU, table within budget);
    #   2. routed queries against the bucket-SHARDED merged table
    #      (spectra too large to replicate/fuse; per-device memory 1/S);
    #   3. replicated packed solidity bitmap + XLA eval (single-shard
    #      meshes / no sharded table available).
    from kmerax.ops.pallas_correct import make_fused_eval
    fused = table is not None and \
        make_fused_eval(params, table, t) is not None
    routed = (not fused and not local_only and state.sharded is not None
              and state.sharded_table is not None
              and mesh.shape[AXIS_BUCKET] > 1)
    global LAST_CORRECT_PATH
    LAST_CORRECT_PATH = ("fused-pallas" if fused else
                         "routed-sharded" if routed else
                         "replicated-bitmap")
    log.info("correct[mesh]: spectrum path = %s", LAST_CORRECT_PATH)

    if fused:
        from kmerax.ops.pallas_correct import eval_entries_fused
        from kmerax.spectrum.pallas_bloom import query_solid_pallas

        def local(tbl, b, l):
            sf = lambda cw, v: query_solid_pallas(params, tbl, t, cw, v)
            ef = lambda bs, ln, lj, er, ei: eval_entries_fused(
                params, tbl, t, bs, ln, lj, er, ei)
            return correct_batch(b, l, k, t, solid_fn=sf, eval_fn=ef,
                                 rounds=cfg.rounds, max_runs=cfg.max_runs,
                                 max_edits=cfg.max_edits)

        rep = table
        tspec = P(None)
    elif routed:
        from kmerax.spectrum.sharded import routed_query_fn

        sp = state.sharded

        def local(tbl_shard, b, l):
            qf = routed_query_fn(sp, tbl_shard[0], k)
            sf = lambda cw, v: (qf(cw, v) >= t) & v
            return correct_batch(b, l, k, t, solid_fn=sf,
                                 rounds=cfg.rounds, max_runs=cfg.max_runs,
                                 max_edits=cfg.max_edits,
                                 uniform_width=True)

        rep = state.sharded_table
        tspec = P(AXIS_BUCKET, None)
    else:
        if table is None:
            raise ValueError(
                "no replicated table (past replicate budget) and the "
                "routed path is unavailable — count on a bucket-sharded "
                "mesh (mesh_bucket > 1) for tables this large")

        def local(bm, b, l):
            sf = lambda cw, v: query_solid(params, bm, cw, v)
            return correct_batch(b, l, k, t, solid_fn=sf, rounds=cfg.rounds,
                                 max_runs=cfg.max_runs,
                                 max_edits=cfg.max_edits)

        rep = jax.jit(solidity_bitmap, static_argnums=0)(params, table, t)
        tspec = P(None)

    def local8(tbl, b, l):
        # wire dispatch at the H2D/D2H boundary (_wire_rows): uint8 =
        # 2-bit packed, int8 = legacy; int32 on device either way
        rows, rewrap = _wire_rows(b, l)
        fixed, ne = local(tbl, rows, l)
        return rewrap(fixed), ne

    sm = shard_map(local8, mesh=mesh, in_specs=(tspec, rspec, rspec),
                   out_specs=(rspec, rspec), check_vma=False)
    # rep rides as an ARGUMENT: closing it over would embed the table /
    # bitmap as an XLA constant (100s compiles + per-process cache misses,
    # see make_correct_step)
    sm_j = jax.jit(sm)
    step = lambda b, l: sm_j(rep, b, l)
    rsh = NamedSharding(mesh, rspec)
    if local_only:
        return step, (lambda a: jax.device_put(jnp.asarray(a), rsh))
    return step, (lambda a: _feed_global(a, rsh))


def _local_mesh():
    """A ("data","bucket") mesh over THIS process's devices only."""
    from jax.sharding import Mesh
    from kmerax.dist.mesh import AXIS_BUCKET, AXIS_DATA

    devs = jax.local_devices()
    return Mesh(np.asarray(devs).reshape(len(devs), 1),
                (AXIS_DATA, AXIS_BUCKET))


def run_correct(cfg: KmeraxConfig, paths, state: CountState, out_path: str,
                metrics: Optional[MetricsWriter] = None,
                use_exact: bool = False) -> dict:
    """Correct pass (SURVEY.md §3.2): stream -> correct_batch -> FASTQ."""
    m = metrics or MetricsWriter(None)
    k, t = cfg.k, state.threshold

    if isinstance(paths, str):
        paths = [paths]
    # paired-end / per-file outputs: a list of out paths (one per input,
    # e.g. R1/R2 of DNBSEQ pairs) corrects each file to its own output.
    if isinstance(out_path, (list, tuple)):
        if len(out_path) != len(paths):
            raise ValueError("need one --out per input file")
        units = [([p], o, None) for p, o in zip(paths, out_path)]
        concat = None
    elif _use_per_host_io(cfg, paths) and not use_exact:
        # single output, per-host mode: the global input-shard list (files,
        # or record-aligned byte ranges of a single big FASTQ) — each shard
        # becomes an owned part; rank 0 concatenates in shard order, which
        # is original read order, so bytes match the single-stream run.
        from kmerax.io.shard import all_input_shards

        shards = all_input_shards(paths, jax.process_count())
        units = [([sh], f"{out_path}.part{i:04d}", i)
                 for i, sh in enumerate(shards)]
        concat = out_path
    else:
        units = [(paths, out_path, None)]
        concat = None

    # per-host independent correction needs the REPLICATED table (the
    # local-mesh step has no bucket axis to route over); past the
    # replicate budget bloom_table is None, so fall back to the global
    # mesh's routed-sharded path instead of aborting (per-host I/O and
    # big-table correction compose — ADVICE r4 medium #1)
    per_host = _use_per_host_io(cfg, paths) and not use_exact \
        and len(units) >= jax.process_count() \
        and state.bloom_table is not None
    if _use_per_host_io(cfg, paths) and not use_exact and not per_host \
            and state.bloom_table is None:
        log.info("correct: per-host mode disabled (table past the "
                 "replicate budget) — using global-mesh routed correction")
    if per_host:
        # per-host independent correction (SURVEY.md §1 L1 + round-2
        # VERDICT Weak #7): the solidity bitmap is replicated, so there is
        # no cross-host dependency — each process corrects and writes only
        # its own size-balanced input shard on its LOCAL devices; corrected
        # rows never cross hosts.
        from kmerax.io.shard import _assign_by_size, shard_size

        nproc, pid = jax.process_count(), jax.process_index()
        sizes_by = [shard_size(u[0][0]) for u in units]
        mine = set(_assign_by_size(sizes_by, nproc)[pid])
        step, put = _correct_step_mesh(cfg, state, mesh=_local_mesh())
        log.info("correct[per-host]: process %d owns %d/%d shards: %s",
                 pid, len(mine), len(units),
                 [units[i][1] for i in sorted(mine)])
        my_units = [u for i, u in enumerate(units) if i in mine]
        write_here = True
    else:
        my_units = units
        write_here = jax.process_index() == 0
        if cfg.mesh_data * cfg.mesh_bucket > 1 and not use_exact:
            step, put = _correct_step_mesh(cfg, state)
        elif use_exact:
            if state.exact is None:
                raise ValueError("exact spectrum not built")
            uniq_d, counts_d, _ = state.exact

            @jax.jit
            def step_x(spec, bases, lengths):
                u, c = spec
                sf = lambda cw, v: (jnp.where(
                    v, lookup_sorted(u, c, cw)[0], 0) >= t) & v
                rows, rewrap = _wire_rows(bases, lengths)
                fixed, ne = correct_batch(rows, lengths,
                                          k, t, solid_fn=sf,
                                          rounds=cfg.rounds,
                                          max_runs=cfg.max_runs,
                                          max_edits=cfg.max_edits)
                return rewrap(fixed), ne

            spec = (uniq_d, counts_d)
            step = lambda b, l: step_x(spec, b, l)
            put = jnp.asarray
        else:
            params = _bloom_params(cfg, k)
            step0, spec = make_correct_step(
                params, state.bloom_table, t, rounds=cfg.rounds,
                max_runs=cfg.max_runs, max_edits=cfg.max_edits)
            step = lambda b, l: step0(spec, b, l)
            put = jnp.asarray

    # 2-bit wire (io/wire.py): on local-readback paths (single process or
    # per-host) N-free batches cross the link packed 4 bases/byte in BOTH
    # directions; N-carrying batches fall back to int8 per batch —
    # identical output bytes (tests/golden/test_wire_pipeline.py)
    from kmerax.io import wire

    use_pack = cfg.wire_pack and (per_host or jax.process_count() == 1)

    n_reads = n_edited = n_edits = 0
    m.stage_start("correct")
    with maybe_trace("correct"):
        for gpaths, gout, _ in my_units:
            with FastqWriter(gout if write_here else None) as out:
                def flush(pend):
                    """Read back + write one completed batch."""
                    nonlocal n_reads, n_edited, n_edits
                    batch, fixed, ne, packed = pend
                    if per_host or jax.process_count() == 1:
                        fixed, ne = np.asarray(fixed), np.asarray(ne)
                    else:
                        fixed = _to_host_global(fixed)
                        ne = _to_host_global(ne)
                    if packed:
                        fixed = wire.unpack2_host(fixed, cfg.max_read_len)
                    if write_here:
                        for i in range(batch.n):
                            rec = batch.records[i]
                            out.write_record(rec,
                                             fixed[i, :batch.lengths[i]])
                    n_reads += batch.n
                    n_edited += int((ne[:batch.n] > 0).sum())
                    n_edits += int(ne[:batch.n].sum())

                # one-deep software pipeline: batch i's D2H + write overlap
                # batch i+1's parse + H2D + compute (async dispatch)
                pend = None
                for batch in BackgroundBatcher(gpaths, cfg.batch_reads,
                                               cfg.max_read_len):
                    if use_pack and not wire.batch_has_n(batch.bases,
                                                         batch.lengths):
                        # 2-bit wire both ways, ONE dispatch: the jitted
                        # step unpacks uint8 input and re-packs its output
                        # in-graph (wire-dtype dispatch, _wire_rows)
                        fixed, ne = step(put(wire.pack2_host(batch.bases)),
                                         put(batch.lengths))
                        pend2 = (batch, fixed, ne, True)
                    else:
                        fixed, ne = step(put(batch.bases.astype(np.int8)),
                                         put(batch.lengths))
                        pend2 = (batch, fixed, ne, False)
                    if pend is not None:
                        flush(pend)
                    pend = pend2
                if pend is not None:
                    flush(pend)
    if jax.process_count() > 1:
        # downstream stages (assemble re-count) read the corrected FASTQ
        # from the shared FS on every host — barrier until writes land
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("kmerax:correct_write")
        if per_host:
            stats_all = np.asarray(multihost_utils.process_allgather(
                np.asarray([n_reads, n_edited, n_edits], np.int64)))
            n_reads, n_edited, n_edits = (int(x) for x in
                                          stats_all.sum(axis=0))
    if concat is not None:
        # parts carry a .partNNNN suffix, so FastqWriter wrote them raw;
        # rank 0 streams them in path order through one final writer (a
        # single deterministic gzip stream when out_path is .gz) — bytes
        # identical to the single-process single-stream run.
        if jax.process_index() == 0:
            import os
            from kmerax.io.fastq import _open_w
            with _open_w(concat) as dst:
                for _, part, _i in units:
                    with open(part, "rb") as src:
                        while True:
                            chunk = src.read(8 << 20)
                            if not chunk:
                                break
                            dst.write(chunk)
            for _, part, _i in units:
                os.remove(part)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("kmerax:correct_concat")
    stats = {"reads": n_reads, "edited_reads": n_edited, "edits": n_edits}
    m.stage_end("correct", **stats)
    log.info("correct: %s", stats)
    return stats


def run_align(cfg: KmeraxConfig, paths, contigs_fasta: str,
              out_tsv: Optional[str] = None,
              metrics: Optional[MetricsWriter] = None) -> dict:
    """Align/validation stage (SURVEY.md §3.3, DESIGN.md §10b): seed-extend
    banded alignment of reads against assembled contigs; reports the
    aligned fraction and mean identity, optionally a per-read TSV."""
    from kmerax.core.codec import seq_bytes_to_bases
    from kmerax.io.fasta import read_fasta
    from kmerax.ops.align import build_contig_index, validate_batch

    m = metrics or MetricsWriter(None)
    k, band = cfg.k, cfg.band
    contigs = [seq_bytes_to_bases(
        np.frombuffer(seq.encode("ascii"), dtype=np.uint8))
        for _, seq in read_fasta(contigs_fasta)]
    cat, uniq, pay = build_contig_index(contigs, k)
    cat_dev = jnp.asarray(cat.astype(np.int8)) if len(cat) \
        else jnp.zeros(1, jnp.int8)
    from kmerax.ops.align import validate_batch_phased
    from kmerax.ops.seed_hash import build_seed_hash
    sh = build_seed_hash(uniq, pay)

    # index arrays ride as ARGUMENTS (closing them over would embed them
    # as XLA constants — see make_correct_step)
    @jax.jit
    def step_x(spec, bases, lengths):
        cd, tab = spec
        return validate_batch_phased(cd, (tab, sh.n_slots, sh.attempt),
                                     bases, lengths, k, band)

    # index_uniq/index_pay are unused on the hash path — tiny placeholders
    # keep them out of the compiled program
    _dummy_u = jnp.zeros((1, (k + 15) // 16), jnp.uint32)
    _dummy_p = jnp.zeros(1, jnp.int32)

    @jax.jit
    def step_full_x(spec, bases, lengths):
        cd, tab = spec
        return validate_batch(cd, _dummy_u, _dummy_p, bases, lengths, k,
                              band, index_hash=(tab, sh.n_slots, sh.attempt))

    spec = (cat_dev, sh.tab)

    def step(b, l):
        """Phased seed search; the rare overflow batch (>B/4 reads with no
        seed in the prefix window) replays through the exact full-width
        step — same driver-replay idiom as the count stage's route
        overflow."""
        found, strand, pos, score, ok = step_x(spec, b, l)
        if not bool(ok):
            log.info("align: phased seed search overflowed — replaying "
                     "batch through the full-width probe")
            return step_full_x(spec, b, l)
        return found, strand, pos, score

    if isinstance(paths, str):
        paths = [paths]
    # multi-host: each process aligns only ITS OWN size-balanced input
    # shards (per-read work is independent; the index is replicated) —
    # TSV parts concat in shard order = original read order; stats sum.
    per_host = _use_per_host_io(cfg, paths)
    if per_host:
        from kmerax.io.shard import _assign_by_size, all_input_shards, \
            shard_size

        shards = all_input_shards(paths, jax.process_count())
        sizes = [shard_size(sh_) for sh_ in shards]
        nproc, pid = jax.process_count(), jax.process_index()
        mine = set(_assign_by_size(sizes, nproc)[pid])
        my_units = [([sh_], i) for i, sh_ in enumerate(shards)
                    if i in mine]
        log.info("align[per-host]: process %d aligns %d/%d shards",
                 pid, len(my_units), len(shards))
    else:
        my_units = [(paths, None)]

    n_reads = n_aligned = 0
    sum_ident = 0.0
    m.stage_start("align")
    with maybe_trace("align"):
        for gpaths, unit_i in my_units:
            tpath = out_tsv if out_tsv and unit_i is None else \
                (f"{out_tsv}.part{unit_i:04d}" if out_tsv else None)
            tsv = open(tpath, "w") if tpath else None
            for batch in BackgroundBatcher(gpaths, cfg.batch_reads,
                                           cfg.max_read_len):
                found, strand, pos, score = step(jnp.asarray(batch.bases),
                                                 jnp.asarray(batch.lengths))
                found = np.asarray(found)[:batch.n]
                strand = np.asarray(strand)[:batch.n]
                pos = np.asarray(pos)[:batch.n]
                score = np.asarray(score)[:batch.n]
                lens = batch.lengths[:batch.n]
                ident = np.where(found & (lens > 0),
                                 score / (2.0 * np.maximum(lens, 1)), 0.0)
                n_reads += batch.n
                n_aligned += int(found.sum())
                sum_ident += float(ident[found].sum())
                if tsv:
                    for i in range(batch.n):
                        tsv.write(f"{batch.records[i].name.decode()}\t"
                                  f"{int(found[i])}\t{int(strand[i])}\t"
                                  f"{int(pos[i])}\t{int(score[i])}\t"
                                  f"{ident[i]:.4f}\n")
            if tsv:
                tsv.close()
    if per_host:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("kmerax:align_parts")
        # int64-safe allgather (x64 is disabled; identity sums ride as
        # micro-identity integers to dodge the float32 truncation)
        from kmerax.spectrum.host_sharded import _allgather

        totals = _allgather(np.asarray(
            [n_reads, n_aligned, int(round(sum_ident * 1e6))], np.int64))
        n_reads = int(totals[:, 0].sum())
        n_aligned = int(totals[:, 1].sum())
        sum_ident = float(totals[:, 2].sum()) / 1e6
        if out_tsv and jax.process_index() == 0:
            import os

            with open(out_tsv, "w") as dst:
                for i in range(len(shards)):
                    with open(f"{out_tsv}.part{i:04d}") as src:
                        dst.write(src.read())
                    os.remove(f"{out_tsv}.part{i:04d}")
        multihost_utils.sync_global_devices("kmerax:align_concat")
    stats = {"reads": n_reads, "aligned": n_aligned,
             "aligned_frac": round(n_aligned / max(n_reads, 1), 4),
             "mean_identity": round(sum_ident / max(n_aligned, 1), 4)}
    m.stage_end("align", **stats)
    log.info("align: %s", stats)
    return stats


def run_pipeline(cfg: KmeraxConfig, paths, out_fastq: str,
                 out_fasta: Optional[str] = None,
                 metrics_path: Optional[str] = None,
                 validate: bool = False) -> dict:
    """count -> correct [-> assemble [-> align-validate]]; two-pass (k2)
    is handled by the caller CLI."""
    m = MetricsWriter(metrics_path)
    state = run_count(cfg, paths, metrics=m)
    stats = run_correct(cfg, paths, state, out_fastq, metrics=m)
    result = {"threshold": state.threshold, **stats}
    if out_fasta is not None:
        from kmerax.graph import assemble_to_fasta
        m.stage_start("assemble")
        n_unitigs = assemble_to_fasta(cfg, state, out_fasta,
                                      corrected_fastq=out_fastq)
        m.stage_end("assemble", unitigs=n_unitigs)
        result["unitigs"] = n_unitigs
        if validate:
            corrected = out_fastq if isinstance(out_fastq, (list, tuple)) \
                else [out_fastq]
            result["validate"] = run_align(cfg, corrected, out_fasta,
                                           metrics=m)
    m.close()
    return result
