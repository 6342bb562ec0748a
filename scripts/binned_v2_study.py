"""Clean-chip study of binned scatter v1 vs v2 (merged-split).

Per shape: v1, v2, v2 with the payload pre-concatenated (isolates the
concat cost), and a (tile_rows, chunk) sweep for both.

Run: python scripts/binned_v2_study.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import localrf_tpu.ops.pallas.binned_scatter as bs  # noqa: E402


def timeit(fn, *a, n=20):
    for _ in range(3):
        out = fn(*a)
    _ = float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    _ = float(out[0, 0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    c = 128
    for rows, p in [(640 * 640, 1_360_000), (404 * 404, 780_000)]:
        idx = jax.random.randint(jax.random.PRNGKey(0), (p,), 0, rows, jnp.int32)
        g = jax.random.normal(jax.random.PRNGKey(1), (p, c), jnp.bfloat16)
        print(f"== rows={rows} P={p} ==", flush=True)
        for tr, ch in [(256, 1024), (512, 1024), (1024, 1024), (512, 2048), (1024, 2048)]:
            f1 = jax.jit(
                lambda i, x, tr=tr, ch=ch: bs.binned_segment_sum(
                    i, x, rows, tile_rows=tr, chunk=ch, out_dtype=jnp.bfloat16
                )
            )
            f2 = jax.jit(
                lambda i, x, tr=tr, ch=ch: bs.binned_segment_sum_merged(
                    i, x, rows, tile_rows=tr, chunk=ch, out_dtype=jnp.bfloat16
                )
            )
            t1 = timeit(f1, idx, g)
            t2 = timeit(f2, idx, g)
            print(
                f"tile={tr:5d} chunk={ch:5d}: v1 {t1:6.2f} ms  v2 {t2:6.2f} ms"
                f"  (v1/v2 {t1 / t2:.2f}x)",
                flush=True,
            )
        # concat attribution at the default shape: pre-sort + pre-concat the
        # payload outside the timed region, run schedule+kernel only
        max_rows = max(1024, bs.SPLIT_MAX_BYTES // (c * 2))
        n_splits = -(-p // max_rows)
        csize = -(-p // n_splits)

        @jax.jit
        def prep(idx, g):
            si, gs = [], []
            for i in range(n_splits):
                part = idx[i * csize : (i + 1) * csize]
                gp = g[i * csize : (i + 1) * csize]
                pos = jax.lax.iota(jnp.int32, part.shape[0])
                s, order = jax.lax.sort((part, pos), dimension=0, num_keys=1)
                si.append(s)
                gs.append(gp.at[order].get(mode="promise_in_bounds"))
            return jnp.concatenate(si), jnp.concatenate(gs, axis=0)

        si, gs = prep(idx, g)
        si, gs = jax.device_get(si), jax.device_get(gs)  # host roundtrip: fresh arrays
        si, gs = jnp.asarray(si), jnp.asarray(gs)
        t_prep = timeit(lambda i, x: prep(i, x)[1], idx, g)
        print(f"prep (sort+reorder+concat x{n_splits}): {t_prep:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
