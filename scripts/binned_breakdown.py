"""Phase breakdown of the binned scatter at production shapes (real TPU).

Times, per phase and end-to-end:
  sort        jax.lax.sort of (idx, iota) per split
  reorder     payload gather into sorted order per split
  kernel      the Pallas binned accumulation given pre-sorted inputs
  total       binned_segment_sum as shipped (split + sort + reorder + kernel)
  xla         the XLA scatter-add emitter, for reference

Run: python scripts/binned_breakdown.py [rows] [P]
Defaults: rows=640*640 (the 640^3 plane table), P=1.36M (production index
count at batch 4096, occ-compacted M=332).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from localrf_tpu.ops.pallas.binned_scatter import (  # noqa: E402
    CHUNK,
    SPLIT_MAX_BYTES,
    TILE_ROWS,
    binned_segment_sum,
)


def timeit(fn, *args, n=20, warmup=3):
    # a 1-element host pull is the only reliable fence on the tunneled
    # backend (block_until_ready returns early there — see roofline_scatter)
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out[0, 0]) if out.ndim == 2 else float(out[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(out[0, 0]) if out.ndim == 2 else float(out[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 640 * 640
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 1_360_000
    c = 128
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (p,), 0, rows, jnp.int32)
    g = jax.random.normal(jax.random.PRNGKey(1), (p, c), jnp.bfloat16)

    max_rows = max(CHUNK, SPLIT_MAX_BYTES // (c * 2))
    n_splits = -(-p // max_rows)
    csize = -(-p // n_splits)
    print(
        f"rows={rows} P={p} C={c} tile_rows={TILE_ROWS} chunk={CHUNK}"
        f" splits={n_splits} (split size {csize})"
    )

    @jax.jit
    def phase_sort(idx):
        outs = []
        for i in range(n_splits):
            part = idx[i * csize : (i + 1) * csize]
            pos = jax.lax.iota(jnp.int32, part.shape[0])
            outs.append(jax.lax.sort((part, pos), dimension=0, num_keys=1)[0])
        return jnp.concatenate(outs)

    @jax.jit
    def phase_reorder(idx, g):
        outs = []
        for i in range(n_splits):
            part = idx[i * csize : (i + 1) * csize]
            gp = g[i * csize : (i + 1) * csize]
            pos = jax.lax.iota(jnp.int32, part.shape[0])
            _, order = jax.lax.sort((part, pos), dimension=0, num_keys=1)
            outs.append(gp.at[order].get(mode="promise_in_bounds"))
        return jnp.concatenate(outs)

    @jax.jit
    def total(idx, g):
        return binned_segment_sum(idx, g, rows)

    @jax.jit
    def xla_emitter(idx, g):
        return (
            jnp.zeros((rows, c), jnp.float32)
            .at[idx]
            .add(g.astype(jnp.float32), mode="promise_in_bounds")
        )

    t_sort = timeit(phase_sort, idx)
    t_reorder = timeit(phase_reorder, idx, g)
    t_total = timeit(total, idx, g)
    t_xla = timeit(xla_emitter, idx, g)
    # kernel+combine ~= total - reorder (reorder includes its sort)
    print(f"sort (x{n_splits}):            {t_sort:7.2f} ms")
    print(f"sort+reorder (x{n_splits}):    {t_reorder:7.2f} ms")
    print(f"binned total:                  {t_total:7.2f} ms")
    print(f"  -> kernel+partials:          {t_total - t_reorder:7.2f} ms")
    print(f"XLA emitter reference:         {t_xla:7.2f} ms")
    bytes_model = p * (c * 2 + c * 2) + rows * c * 4
    print(
        f"bytes model (payload r/w + out w): {bytes_model / 1e6:.0f} MB"
        f" -> roof {bytes_model / 819e9 * 1e3:.2f} ms at 819 GB/s"
    )


if __name__ == "__main__":
    main()
