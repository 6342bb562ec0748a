"""Separate P-scaling from grid-scaling in the train step."""
import time, dataclasses, numpy as np, jax, jax.numpy as jnp
import bench as B
from localrf_tpu.models.step import FieldState, train_chunk

def step_time(grid, step_ratio, occ=False, n=6):
    model, batch = B.build_state(grid)
    f = model.fields[-1]
    f["cfg"] = dataclasses.replace(f["cfg"], step_ratio=step_ratio)
    if not occ:
        f["alpha_volume"] = None
        f["cfg"] = dataclasses.replace(f["cfg"], occ_m=0)
    statics = model._statics(optimize_poses=True)
    host = model._host_batch(batch); host["gate"] = model._gate()
    sb = {k: jnp.asarray(np.broadcast_to(v, (n,)+v.shape)) for k,v in host.items()}
    sc = model._scalars_py()
    ss = {k: jnp.asarray(np.broadcast_to(np.asarray(v), (n,)+np.asarray(v).shape)) for k,v in sc.items()}
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    fs = FieldState(f["params"], f["opt"])
    out = train_chunk(fs, model._pose_dev, model.intr, sb, ss, statics, keys, n, f["alpha_volume"])
    _ = float(out[3]["total_loss"][-1])
    t0 = time.perf_counter()
    out = train_chunk(out[0], out[1], out[2], sb, ss, statics, keys, n, f["alpha_volume"])
    _ = float(out[3]["total_loss"][-1])
    dt = (time.perf_counter()-t0)/n
    s = f["cfg"].n_samples//6*2
    print(f"grid={grid} S={s} occ_m={f['cfg'].occ_m if occ else 0}: {dt*1000:7.1f} ms/step")

step_time(640, 0.5)        # S=738 dense
step_time(640, 1.0)        # S=368 dense
step_time(640, 2.0)        # S=184 dense
step_time(404, 0.5)        # S=464 dense (compare grid effect at similar S)
step_time(640, 0.5, occ=True)  # S=738 occ_m=332
