"""Microbenchmark: component breakdown of the 640^3 train step on real TPU.

Times isolated pieces (gathers, scatters, composite, app path) plus the full
step, to target optimization. All benched functions reduce to a scalar
inside the jit so only a scalar crosses the (slow) tunnel. Not part of the
test suite.
"""
from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out)  # drain the queue
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / n
    return dt * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    G = 640
    P_DENS = 4096 * 332  # compacted density points
    P_APP = 4096 * 128   # top-K app points
    R = G * G            # plane rows

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    idx_d = jax.random.randint(k1, (P_DENS,), 0, R, jnp.int32)
    idx_a = jax.random.randint(k2, (P_APP,), 0, R, jnp.int32)
    idx_l = jax.random.randint(k3, (P_DENS,), 0, G, jnp.int32)

    tbl128 = jax.random.normal(k4, (R, 128), jnp.float32)
    tbl128_bf = tbl128.astype(jnp.bfloat16)
    line16 = jax.random.normal(k4, (G, 16), jnp.float32)
    line64 = jax.random.normal(k4, (G, 64), jnp.float32)
    line128 = jax.random.normal(k4, (G, 128), jnp.float32)

    g128_d = jax.random.normal(k1, (P_DENS, 128), jnp.float32)
    g128_a = jax.random.normal(k2, (P_APP, 128), jnp.float32)
    g16 = jax.random.normal(k3, (P_DENS, 16), jnp.float32)
    g64 = jax.random.normal(k3, (P_DENS, 64), jnp.float32)
    g128_l = jax.random.normal(k3, (P_DENS, 128), jnp.float32)

    gather = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0).astype(jnp.float32)))
    scatter = jax.jit(
        lambda t, i, g: jnp.sum(jnp.zeros_like(t).at[i].add(g).astype(jnp.float32))
    )
    sum_only = jax.jit(lambda g: jnp.sum(g.astype(jnp.float32)))

    print(f"== isolated ops, 640^3 shapes (P_dens={P_DENS}, P_app={P_APP}) ==")
    print(f"baseline sum [P_dens,128] f32       : {timeit(sum_only, g128_d):7.2f} ms")
    print(f"plane gather f32 [410k,128] @P_dens : {timeit(gather, tbl128, idx_d):7.2f} ms")
    print(f"plane gather f32 [410k,128] @P_app  : {timeit(gather, tbl128, idx_a):7.2f} ms")
    print(f"plane gather bf16 [410k,128] @P_dens: {timeit(gather, tbl128_bf, idx_d):7.2f} ms")
    print(f"plane scatter f32 [410k,128] @P_dens: {timeit(scatter, tbl128, idx_d, g128_d):7.2f} ms")
    print(f"plane scatter f32 [410k,128] @P_app : {timeit(scatter, tbl128, idx_a, g128_a):7.2f} ms")
    print(
        "plane scatter bf16 [410k,128] @P_dens:"
        f" {timeit(scatter, tbl128_bf, idx_d, g128_d.astype(jnp.bfloat16)):7.2f} ms"
    )
    print(f"line gather f32 [640,16] @P_dens    : {timeit(gather, line16, idx_l):7.2f} ms")
    print(f"line gather f32 [640,64] @P_dens    : {timeit(gather, line64, idx_l):7.2f} ms")
    print(f"line scatter f32 [640,16] @P_dens   : {timeit(scatter, line16, idx_l, g16):7.2f} ms")
    print(f"line scatter f32 [640,64] @P_dens   : {timeit(scatter, line64, idx_l, g64):7.2f} ms")
    print(f"line scatter f32 [640,128] @P_dens  : {timeit(scatter, line128, idx_l, g128_l):7.2f} ms")

    # one-hot matmul segment-sum for the line backward
    def seg_matmul(i, g):
        onehot = (
            i[:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
        ).astype(jnp.float32)
        return jnp.sum(onehot.T @ g)

    segm = jax.jit(seg_matmul)
    print(f"line segsum matmul [640,64] @P_dens : {timeit(segm, idx_l, g64):7.2f} ms")

    # full step at 640^3 for reference
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    for g in (64, 640):
        ips = bench.bench_stage(g, 10)
        print(f"full {g}^3 step: {1000.0 / ips:.1f} ms/it  ({ips:.2f} it/s, {ips * 4096:,.0f} rays/s)")


if __name__ == "__main__":
    main()
