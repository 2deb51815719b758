"""Pallas TPU kernels for the counting-Bloom spectrum (SURVEY.md §2 #10,
BASELINE.json "sharded device-HBM counting array" at speed of light).

Design (measured in experiments/vmem_lab.py + scatter_lab.py on v5e):
  * XLA's scatter-add ceiling is ~54M rows/s and a naive serial Pallas RMW
    loop costs ~26 cyc/elem (loop overhead dominates). Both are far from
    VMEM speed.
  * This kernel keeps the WHOLE table resident in VMEM (v5e has ~128MB —
    a 2^24-counter int32 table is 64MB) and splits the insert into:
      stage A (vectorized): build the 128-lane one-hot increment row of 128
        elements at once — broadcast the packed lane quads across sublanes,
        compare against a sublane iota in TRANSPOSED orientation, then
        transpose back through the MXU (bf16 one-hot values are exact).
      stage B (unrolled serial): row += one-hot RMW per element with the
        one-hot precomputed, so the loop body is load/add/store only.
  * Insert order is irrelevant (commutative integer adds), so results are
    bit-identical to spectrum.bloom.insert / oracle.CountingBloomOracle.

The kernel is engaged by spectrum.bloom.insert on TPU backends when the
table fits the VMEM budget; the XLA scatter path remains the fallback (and
the CPU-test reference — tests assert both paths agree bit-for-bit).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# stream chunk per grid step; SUB is the SMEM window minor size
# (large 2-D SMEM blocks get lane-padded, so windows are (1, 8, SUB))
CHUNK = 2048
SUB = CHUNK // 8
VALID_BIT = 28                      # lanepack bit flagging a live element
VMEM_BUDGET = 100 * 1024 * 1024     # table bytes allowed in VMEM


def _insert_kernel(d: int, packed16: bool, blocks_ref, lp_ref, tbl_hbm,
                   out_hbm, tbl_ref, oh_ref, sem):
    """One grid step: scatter-add CHUNK elements into the resident table.

    The table stays in HBM between calls (an aliased VMEM in/out window
    would double-count: 2x64MB > VMEM); the first grid step DMAs it into
    the VMEM scratch `tbl_ref`, the last step DMAs it back — ~80us each at
    HBM speed, amortized over the whole batch.

    Element e of the chunk lives at lanepack window [e // 128, e % 128] and
    at blocks window [0, e // SUB, e % SUB] (its natural reshape). The RMW
    loop iterates columns g and unrolls the 8 sublanes u (element u*SUB+g)
    manually — Mosaic fori_loop can't partially unroll — so SMEM sublane
    indices stay static and the per-iteration loop overhead (~12 cyc on
    v5e, experiments/vmem_lab.py) amortizes over 16 elements.
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(tbl_hbm, tbl_ref, sem)
        cp.start()
        cp.wait()

    nsub = CHUNK // 128
    pos_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    eye = jnp.eye(128, dtype=jnp.bfloat16)

    # stage A (vectorized): one-hot rows for all CHUNK elements, 128 at a time
    for sub in range(nsub):
        row = lp_ref[sub:sub + 1, :]                       # (1,128) lanepacks
        lpb = jnp.broadcast_to(row, (128, 128))            # sublane replicate
        oht = jnp.zeros((128, 128), dtype=jnp.int32)
        for j in range(d):
            oht = oht + ((lpb >> (7 * j)) & 127 == pos_s).astype(jnp.int32)
        vmask = (lpb >> VALID_BIT) & 1
        oht = (oht * vmask).astype(jnp.bfloat16)
        # transpose via MXU: out[e, p] = sum_k oht[k, e] * eye[k, p]
        # (one-hot sums are <= d <= 4: exact in bf16)
        oh = jax.lax.dot_general(
            oht, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        oh_ref[sub * 128:(sub + 1) * 128, :] = oh.astype(jnp.int32)

    # stage B: read-modify-write per element, manually 16x unrolled.
    # p16 (bloom.pack16 layout): block b lives at word row b>>1, halfword
    # b&1; its one-hot (values <= d) adds shifted into that half. The low
    # half stays <= SAT16 before the clamp (SAT16 + d < 2^16), so the add
    # can never carry across the halfword boundary; both halves re-clamp
    # to SAT16 every touch (idempotent on untouched halves).
    def body(g, _):
        for v in range(2):
            col = 2 * g + v
            for u in range(8):
                b = blocks_ref[0, u, col]
                if packed16:
                    r = b >> 1
                    w = tbl_ref[pl.ds(r, 1), :] \
                        + (oh_ref[pl.ds(u * SUB + col, 1), :] << ((b & 1)
                                                                  * 16))
                    lo = jnp.minimum(w & 0xFFFF, 0x7FFF)
                    hi = jnp.minimum((w >> 16) & 0xFFFF, 0x7FFF)
                    tbl_ref[pl.ds(r, 1), :] = lo | (hi << 16)
                else:
                    tbl_ref[pl.ds(b, 1), :] = (
                        tbl_ref[pl.ds(b, 1), :]
                        + oh_ref[pl.ds(u * SUB + col, 1), :])
        return 0

    jax.lax.fori_loop(0, SUB // 2, body, 0)

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        cp = pltpu.make_async_copy(tbl_ref, out_hbm, sem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5))
def _insert_pallas_flat(d: int, nrows: int, blocks, lp, interpret: bool,
                        packed16: bool, table2d):
    """blocks/lp: flat (N,) int32 padded to CHUNK multiples; table (nrows,128)."""
    n = blocks.shape[0]
    nsteps = n // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 8, SUB), lambda c: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK // 128, 128), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # table stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.int32),
                        pltpu.VMEM((CHUNK, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(
        functools.partial(_insert_kernel, d, packed16),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.int32),
        grid_spec=grid_spec,
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(nrows * 128 * 4 + 16 * 1024 * 1024),
            has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=n * 600, bytes_accessed=n * 1100, transcendentals=0),
        interpret=interpret,
    )
    return f(blocks.reshape(nsteps, 8, SUB),
             lp.reshape(nsteps * CHUNK // 128, 128), table2d)


def insert_pallas(params, table, canon_words, valid, *,
                  local_bits: int | None = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas variant of spectrum.bloom.insert (full table or a
    2^local_bits range shard of it).

    Bit-identical to the XLA scatter path: same probe addressing
    (bloom.blocks_lanepack), commutative adds, invalid lanes contribute a
    zero one-hot. `interpret=True` runs the kernel in interpreter mode for
    CPU-backend tests.
    """
    from kmerax.spectrum.bloom import blocks_lanepack

    block, lp = blocks_lanepack(params, canon_words)
    if local_bits is not None:
        block = block & ((1 << (local_bits - 7)) - 1)
    fb = block.reshape(-1)
    fl = lp.reshape(-1)
    fv = valid.reshape(-1)
    fb = jnp.where(fv, fb, 0)
    fl = jnp.where(fv, fl | (1 << VALID_BIT), 0)
    n = fb.shape[0]
    pad = (-n) % CHUNK
    if pad:
        fb = jnp.concatenate([fb, jnp.zeros(pad, jnp.int32)])
        fl = jnp.concatenate([fl, jnp.zeros(pad, jnp.int32)])
    nrows = table.shape[0] // 128
    out = _insert_pallas_flat(params.num_hashes, nrows, fb, fl, interpret,
                              params.counter == "p16",
                              table.reshape(nrows, 128))
    return out.reshape(-1)


def _query_kernel(d: int, packed16: bool, t_ref, blocks_ref, lp_ref,
                  tbl_hbm, out_ref, tbl_ref, oh_ref, rowbuf, sem):
    """One grid step: solidity-test CHUNK elements against the resident
    count table (the Pallas "spectrum lookup" of BASELINE.json:5).

    Same addressing and stage-A one-hot construction as _insert_kernel;
    stage B gathers each element's 128-lane table row serially (manually
    16x unrolled — pure load/store, no RMW); stage C tests all probed
    lanes >= t vectorized over the whole chunk. An element is solid iff
    every probed lane meets the threshold; invalid elements (zero one-hot
    row, as in insert) fail the "any probed lane" test and report 0.
    """
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        cp = pltpu.make_async_copy(tbl_hbm, tbl_ref, sem)
        cp.start()
        cp.wait()

    nsub = CHUNK // 128
    pos_s = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    eye = jnp.eye(128, dtype=jnp.bfloat16)

    for sub in range(nsub):
        row = lp_ref[sub:sub + 1, :]
        lpb = jnp.broadcast_to(row, (128, 128))
        oht = jnp.zeros((128, 128), dtype=jnp.int32)
        for j in range(d):
            oht = oht + ((lpb >> (7 * j)) & 127 == pos_s).astype(jnp.int32)
        vmask = (lpb >> VALID_BIT) & 1
        oht = (oht * vmask).astype(jnp.bfloat16)
        oh = jax.lax.dot_general(
            oht, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        oh_ref[sub * 128:(sub + 1) * 128, :] = oh.astype(jnp.int32)

    def body(g, _):
        for v in range(2):
            col = 2 * g + v
            for u in range(8):
                b = blocks_ref[0, u, col]
                if packed16:
                    w = tbl_ref[pl.ds(b >> 1, 1), :]
                    rowbuf[pl.ds(u * SUB + col, 1), :] = \
                        (w >> ((b & 1) * 16)) & 0xFFFF
                else:
                    rowbuf[pl.ds(u * SUB + col, 1), :] = \
                        tbl_ref[pl.ds(b, 1), :]
        return 0

    jax.lax.fori_loop(0, SUB // 2, body, 0)

    t = t_ref[0]
    probed = (oh_ref[:] > 0).astype(jnp.int32)
    nbad = jnp.sum(((rowbuf[:] < t) & (oh_ref[:] > 0)).astype(jnp.int32),
                   axis=1, keepdims=True)
    npro = jnp.sum(probed, axis=1, keepdims=True)
    out_ref[:] = ((nbad == 0) & (npro > 0)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _query_pallas_flat(d: int, nrows: int, t, blocks, lp, interpret: bool,
                       packed16: bool, table2d):
    """blocks/lp: flat (N,) int32 padded to CHUNK multiples. Returns
    (N, 1) int32 solidity flags."""
    n = blocks.shape[0]
    nsteps = n // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            # index maps receive (grid idx, *scalar-prefetch refs)
            pl.BlockSpec((1, 8, SUB), lambda c, t: (c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK // 128, 128), lambda c, t: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # table stays in HBM
        ],
        out_specs=pl.BlockSpec((CHUNK, 1), lambda c, t: (c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nrows, 128), jnp.int32),
                        pltpu.VMEM((CHUNK, 128), jnp.int32),
                        pltpu.VMEM((CHUNK, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(
        functools.partial(_query_kernel, d, packed16),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(nrows * 128 * 4 + 32 * 1024 * 1024)),
        cost_estimate=pl.CostEstimate(
            flops=n * 400, bytes_accessed=n * 1100, transcendentals=0),
        interpret=interpret,
    )
    return f(t.reshape(1), blocks.reshape(nsteps, 8, SUB),
             lp.reshape(nsteps * CHUNK // 128, 128), table2d)


def query_solid_pallas(params, table, t, canon_words, valid, *,
                       interpret: bool = False) -> jnp.ndarray:
    """Pallas solidity predicate against the int32 count table: equivalent
    to `bloom.query(...) >= t` (and bit-identical to
    `bloom.query_solid(bitmap_built_with_t, ...)`). The table stays
    VMEM-resident across the whole probe batch, so per-probe cost is a
    serial VMEM row load instead of an XLA HBM gather (~11 cyc issue each,
    experiments/scatter_lab.py)."""
    from kmerax.spectrum.bloom import blocks_lanepack

    block, lp = blocks_lanepack(params, canon_words)
    fb = block.reshape(-1)
    fl = lp.reshape(-1)
    fv = valid.reshape(-1)
    fb = jnp.where(fv, fb, 0)
    fl = jnp.where(fv, fl | (1 << VALID_BIT), 0)
    n = fb.shape[0]
    pad = (-n) % CHUNK
    if pad:
        fb = jnp.concatenate([fb, jnp.zeros(pad, jnp.int32)])
        fl = jnp.concatenate([fl, jnp.zeros(pad, jnp.int32)])
    nrows = table.shape[0] // 128
    out = _query_pallas_flat(params.num_hashes, nrows,
                             jnp.asarray(t, jnp.int32), fb, fl, interpret,
                             params.counter == "p16",
                             table.reshape(nrows, 128))
    return out[:n, 0].reshape(valid.shape) > 0


def pallas_insert_ok(params, backend: str | None = None,
                     table_entries: int | None = None) -> bool:
    """True when the Pallas insert path applies: TPU backend and the table
    (or range shard) fits the VMEM budget."""
    import os

    if os.environ.get("KMERAX_NO_PALLAS"):
        return False
    backend = backend or jax.default_backend()
    entries = table_entries if table_entries is not None \
        else params.table_entries
    return backend == "tpu" and entries * 4 <= VMEM_BUDGET and \
        entries % 128 == 0
