"""Feasibility: dynamic gathers inside a Pallas TPU kernel."""
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW, C, P = 65536, 32, 131072  # table 8MB fits VMEM

def kern(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]                       # [P] int32 in VMEM
    out_ref[:] = jnp.take(tab_ref[:], idx, axis=0)

rng = np.random.default_rng(0)
tab = jnp.asarray(rng.normal(size=(HW, C)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, HW, P).astype(np.int32))

try:
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    ref = jnp.take(tab, idx, axis=0)
    print("take-in-pallas OK, max err", float(jnp.max(jnp.abs(out - ref))))
except Exception as e:
    print("take-in-pallas FAILED:", type(e).__name__, str(e)[:500])

# timing if it works
import time
def timed():
    f = jax.jit(lambda t, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    o = f(tab, idx); s=float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(3): o = f(tab, idx); s=float(jnp.sum(o))
    print(f"pallas take: {(time.perf_counter()-t0)/3*1000:.2f} ms for P={P}")
    g = jax.jit(lambda t,i: jnp.take(t,i,axis=0))
    o = g(tab, idx); s=float(jnp.sum(o))
    t0=time.perf_counter()
    for _ in range(3): o = g(tab, idx); s=float(jnp.sum(o))
    print(f"xla take:    {(time.perf_counter()-t0)/3*1000:.2f} ms for P={P}")
try:
    timed()
except Exception as e:
    print("timing failed:", type(e).__name__, str(e)[:300])
