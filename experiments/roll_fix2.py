"""Deduce pltpu.roll traced-shift semantics: roll an iota row, read indices."""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kmerax.utils.compile_cache import enable
enable()

Lp = 256
row_np = np.arange(Lp, dtype=np.int32)[None, :]   # value == lane index


def kern(c_ref, row_ref, out_ref):
    for u in range(8):
        c = c_ref[0, u]
        r = row_ref[:]
        out_ref[pl.ds(u, 1), :] = pltpu.roll(r, shift=c, axis=1)


@jax.jit
def run(cs, row):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, Lp), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cs, row)


cs = np.array([[0, 1, 2, 67, 88, 128, 200, 255]], dtype=np.int32)
out = np.asarray(run(jnp.asarray(cs), jnp.asarray(row_np)))
for i in range(8):
    c = cs[0, i]
    print(f"shift={c:3d}: out[0..5] = {out[i, :6]}  out[250..] = {out[i, 250:]}")
