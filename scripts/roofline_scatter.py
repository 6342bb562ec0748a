"""Roofline grounding for the gather/scatter "floor" claim (VERDICT r2 #2).

Two measurements on the real TPU:

1. Index sweep: isolated plane gather/scatter at the 640^3 table shape
   ([409.6k rows, 128 lanes] bf16) with index counts 42k -> 5.4M. Reports
   ns/index and effective GB/s vs the v5e HBM peak (819 GB/s). Flat
   ns/index => per-index latency floor; falling => fixed overhead.
2. Full-step batch sweep: bench.bench_stage at 640^3 with ray batch
   4096 -> 16384 (index counts scale linearly). Rising rays/s => per-step
   overhead amortizes; flat => per-index bound.

Bytes-moved model per scatter index (worst case, no duplicate merging):
read row (128 x 2 B) + write row + read grad payload = 768 B. Gather:
read row + write out = 512 B. Duplicates only LOWER the scatter bytes
(sorted accumulation merges rows), so the GB/s figures are upper bounds.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

HBM_GBPS = 819.0  # v5e peak HBM bandwidth
ROWS = 640 * 640
LANES = 128


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (ROWS, LANES), jnp.bfloat16)

    gather = jax.jit(
        lambda t, i: jnp.sum(
            t.at[i].get(mode="promise_in_bounds").astype(jnp.float32)
        )
    )
    scatter = jax.jit(
        lambda t, i, g: jnp.sum(jnp.zeros_like(t).at[i].add(g).astype(jnp.float32))
    )

    print("== index sweep, [409.6k, 128] bf16 table ==")
    print(f"{'P':>9} | {'gather ms':>9} {'ns/idx':>7} {'GB/s':>6} {'%HBM':>5} "
          f"| {'scatter ms':>10} {'ns/idx':>7} {'GB/s':>6} {'%HBM':>5}")
    for p in (42_000, 170_000, 680_000, 1_360_000, 2_720_000, 5_440_000):
        ki, kg = jax.random.split(jax.random.PRNGKey(p))
        idx = jax.random.randint(ki, (p,), 0, ROWS, jnp.int32)
        g = jax.random.normal(kg, (p, LANES), jnp.bfloat16)
        tg = timeit(gather, tbl, idx)
        ts = timeit(scatter, tbl, idx, g)
        bw_g = p * 512 / (tg * 1e-3) / 1e9
        bw_s = p * 768 / (ts * 1e-3) / 1e9
        print(
            f"{p:>9,} | {tg:9.2f} {tg * 1e6 / p:7.1f} {bw_g:6.0f} {100 * bw_g / HBM_GBPS:4.0f}% "
            f"| {ts:10.2f} {ts * 1e6 / p:7.1f} {bw_s:6.0f} {100 * bw_s / HBM_GBPS:4.0f}%"
        )

    import bench

    print("\n== full-step batch sweep, 640^3 ==")
    for batch in (4096, 8192, 16384):
        bench.BATCH = batch
        ips = bench.bench_stage(640, 8)
        print(
            f"batch {batch:>6}: {1000.0 / ips:7.1f} ms/it  "
            f"{ips * batch:>10,.0f} rays/s", flush=True,
        )


if __name__ == "__main__":
    main()
