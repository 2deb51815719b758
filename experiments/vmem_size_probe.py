"""Probe usable VMEM: try pallas_call with increasingly large VMEM blocks."""
import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from kmerax.utils.compile_cache import enable
enable()

def probe(mb):
    rows = mb * 1024 * 1024 // (128 * 4)
    def kern(x_ref, o_ref):
        o_ref[0, :] = x_ref[0, :] + 1
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.zeros((rows, 128), jnp.int32)
    try:
        r = jax.jit(f)(x)
        np.asarray(r)
        print(f"VMEM {mb} MB block: OK", flush=True)
        return True
    except Exception as e:
        print(f"VMEM {mb} MB block: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return False

for mb in (16, 32, 64, 96, 112, 120):
    if not probe(mb):
        break
