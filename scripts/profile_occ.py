"""Microbenchmark: occupancy cull + compaction alternatives at 640^3 shapes.

Current path: occupancy_valid (1 byte-gather/sample over R*S=9M samples) +
compact_valid_samples (lax.top_k over [4096, 2187]). Candidates:
  A. top_k (current)
  B. cumsum + vmapped searchsorted over the rank array
  C. cumsum + scatter-by-rank (per-row scatter into M slots)
All must return the same (sel, sel_valid).
"""
from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(out[0] if isinstance(out, tuple) else out).ravel()[:1]
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from localrf_tpu.ops.occupancy import compact_valid_samples, occupancy_valid, pack_alpha_corners

    R, S, M = 4096, 2187, 332
    G2 = 320
    rng = np.random.default_rng(0)

    # coherent-ish validity: ball occupancy ~12%
    ax = np.linspace(-1, 1, G2)
    zz, yy, xx = np.meshgrid(ax, ax, ax, indexing="ij")
    vol = ((xx**2 + yy**2 + zz**2) < 0.535**2).astype(np.float32)
    packed = pack_alpha_corners(jnp.asarray(vol))
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (R * S, 3)).astype(np.float32))

    occ = jax.jit(lambda p, c: occupancy_valid(p, (G2, G2, G2), c))
    print(f"occupancy_valid 9M samples      : {timeit(occ, packed, coords):7.2f} ms")

    valid = np.asarray(occ(packed, coords)).reshape(R, S)
    valid_j = jnp.asarray(valid)

    topk = jax.jit(lambda v: compact_valid_samples(v, M))
    print(f"compact top_k [4096,2187]->332  : {timeit(topk, valid_j):7.2f} ms")

    def compact_searchsorted(v):
        rank = jnp.cumsum(v.astype(jnp.int32), axis=1)
        q = jnp.arange(1, M + 1, dtype=jnp.int32)[None].repeat(v.shape[0], 0)
        sel = jax.vmap(jnp.searchsorted)(rank, q).astype(jnp.int32)
        sel = jnp.minimum(sel, v.shape[1] - 1).at[:, -1].set(v.shape[1] - 1)
        sel_valid = jnp.take_along_axis(v, sel, axis=1)
        return sel, sel_valid

    ss = jax.jit(compact_searchsorted)
    print(f"compact searchsorted            : {timeit(ss, valid_j):7.2f} ms")

    def compact_scatter(v):
        r, s = v.shape
        rank = jnp.cumsum(v.astype(jnp.int32), axis=1)  # 1-based at valid
        dst = jnp.where(v, rank - 1, M)  # invalid -> dump slot
        cols = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (r, s))
        sel = jnp.full((r, M + 1), s - 1, jnp.int32)
        # reverse column order so the FIRST (smallest s) write wins
        sel = sel.at[jnp.arange(r)[:, None], dst[:, ::-1]].set(cols[:, ::-1])
        sel = sel[:, :M].at[:, -1].set(s - 1)
        sel_valid = jnp.take_along_axis(v, sel, axis=1)
        return sel, sel_valid

    sc = jax.jit(compact_scatter)
    print(f"compact scatter-by-rank         : {timeit(sc, valid_j):7.2f} ms")

    s1, sv1 = jax.device_get(topk(valid_j))
    s2, sv2 = jax.device_get(ss(valid_j))
    s3, sv3 = jax.device_get(sc(valid_j))
    # compare where valid counts < M (the exact regime)
    exact = valid.sum(1) < M
    print("searchsorted == top_k (exact rows):", np.array_equal(s1[exact], s2[exact]))
    print("scatter     == top_k (exact rows):", np.array_equal(s1[exact], s3[exact]))
    print("sel_valid eq:", np.array_equal(sv1[exact], sv2[exact]), np.array_equal(sv1[exact], sv3[exact]))


if __name__ == "__main__":
    main()
