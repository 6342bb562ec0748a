"""Real-scene occupancy statistics: validates the occ_m compaction budget.

The march compacts each ray's samples to the first `occ_m` occupied ones
(ops/occupancy.py); compaction is exact whenever a ray has < occ_m occupied
samples. The budget (--occ_ratio 0.45 of S, floor 256) was originally tuned
on a synthetic 8%-fill ball (bench.py); this script measures the actual
per-ray occupied-sample distribution on a trained scene checkpoint —
evidence that the default budget truncates (or doesn't) in practice.

Usage: JAX_PLATFORMS=cpu python scripts/occ_stats.py <logdir-with-checkpoints.th>
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from localrf_tpu.checkpoint import load_checkpoint
    from localrf_tpu.models.step import cam2world_from_params
    from localrf_tpu.ops.occupancy import occupancy_valid, pack_alpha_corners
    from localrf_tpu.ops.rays import (
        get_ray_directions_lean,
        get_rays_lean,
        sample_ray_contracted,
    )
    from localrf_tpu.models.tensorf import normalize_coord, update_alpha_volume

    logdir = sys.argv[1]
    model = load_checkpoint(os.path.join(logdir, "checkpoints.th"))
    w, h = model.cfg.WH
    focal = float(np.asarray(model.focal(w)))
    center = jnp.asarray([w / 2.0, h / 2.0])

    rng = np.random.default_rng(0)
    for fi, f in enumerate(model.fields):
        cfg = f["cfg"]
        vol = f["alpha_volume"]
        if vol is None:
            # occupancy refresh hadn't fired for this field yet; compute one
            # at the reference's mask resolution for the statistic
            g = tuple(min(int(gs), 256) for gs in cfg.grid_size)
            vol = update_alpha_volume(f["params"], cfg, g)
        packed = pack_alpha_corners(vol)
        s = cfg.n_samples // 6 * 2
        occ_m = cfg.occ_m if cfg.occ_m > 0 else s

        # rays from the scene's trained camera poses, random pixel subset
        c2w = np.asarray(
            cam2world_from_params(jnp.asarray(model.r_all), jnp.asarray(model.t_all))
        )
        world2rf = jnp.asarray(model.world2rf[fi])
        counts = []
        for _ in range(4):
            vid = rng.integers(0, c2w.shape[0])
            px = rng.integers(0, w * h, 2048)
            i, j = px % w, (px // w) % h
            dirs = get_ray_directions_lean(jnp.asarray(i), jnp.asarray(j), focal, center)
            cam2rf = jnp.asarray(c2w[vid])[None].repeat(len(px), 0)
            cam2rf = cam2rf.at[:, :3, 3].add(world2rf)
            rays_o, rays_d = get_rays_lean(dirs, cam2rf)
            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            pts, _, _ = sample_ray_contracted(rays_o, viewdirs, cfg.n_samples, False, None)
            pn = normalize_coord(pts, cfg)
            valid = occupancy_valid(packed, vol.shape, pn.reshape(-1, 3))
            counts.append(np.asarray(valid.reshape(len(px), -1).sum(-1)))
        c = np.concatenate(counts)
        q = np.quantile(c, [0.5, 0.9, 0.99, 1.0]).astype(int)
        print(
            f"field {fi}: grid={cfg.grid_size} S={s} occ_m={occ_m} | occupied/ray "
            f"p50={q[0]} p90={q[1]} p99={q[2]} max={q[3]} | "
            f"rays truncated at occ_m: {(c >= occ_m).mean() * 100:.2f}%"
        )


if __name__ == "__main__":
    main()
