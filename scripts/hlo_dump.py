"""Dump the optimized HLO of the production train_chunk at a given stage
and summarize the largest divide/gather/reduce/fusion ops by operand shape.

Attribution tool for xplane-profile hotspots whose op names are truncated
(e.g. "which div is 6.4 ms at 640^3?"). Not part of the test suite; needs
the real TPU (compiles the production executable).

Usage: python scripts/hlo_dump.py [grid] [ops...]
"""
from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from localrf_tpu.models.step import FieldState, train_chunk

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 640
    want = sys.argv[2:] or ["divide", "gather", "reduce", "sort", "scatter"]
    n_timed = 10

    model, batch = bench.build_state(grid)
    f = model.fields[-1]
    statics = model._statics(optimize_poses=True)
    host = model._host_batch(batch)
    host["gate"] = model._gate()
    stacked_batch = {
        k: jnp.asarray(np.broadcast_to(v, (n_timed,) + v.shape))
        for k, v in host.items()
    }
    scal = model._scalars_py()
    stacked_scal = {
        k: jnp.asarray(
            np.broadcast_to(np.asarray(v), (n_timed,) + np.asarray(v).shape)
        )
        for k, v in scal.items()
    }
    keys = jax.random.split(jax.random.PRNGKey(0), n_timed)
    field_state = FieldState(f["params"], f["opt"])

    def chunk(fs, ps, it):
        return train_chunk(
            fs, ps, it, stacked_batch, stacked_scal, statics, keys, n_timed,
            f["alpha_volume"],
        )

    lowered = jax.jit(chunk).lower(field_state, model._pose_dev, model.intr)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    print(f"optimized HLO: {len(hlo.splitlines())} lines", flush=True)

    # rank op instances by a rough byte count of their result shape
    pat = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:[a-z0-9]+)\[[^\]]*\][^ ]*)\s+"
        r"(" + "|".join(re.escape(w) for w in want) + r")\(",
        re.M,
    )
    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
                   "pred": 1, "f16": 2, "s16": 2, "u16": 2, "f64": 8, "s64": 8}

    def nbytes(shape: str) -> int:
        m = re.match(r"([a-z0-9]+)\[([\d,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    rows = [(nbytes(shape), name, shape, op)
            for name, shape, op in pat.findall(hlo)]
    rows.sort(reverse=True)
    for nb, name, shape, op in rows[:40]:
        print(f"{nb/2**20:10.1f} MB  {op:10s} {shape:40s} {name}")


if __name__ == "__main__":
    main()
