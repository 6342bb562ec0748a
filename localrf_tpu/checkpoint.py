"""Checkpoint save/load for the full progressive state.

Unlike the reference — which pickles a torch state_dict and replays
append_rf/append_frame by regex-matching keys at load time
(ref: local_tensorfs.py:326-356) — we serialize the complete host state
(pose stacks + optimizer moments + every field pytree + window/schedule
bookkeeping) so training can truly resume mid-run, which the reference lists
as a TODO (ref: train.py:263-269). Alpha volumes are bit-packed like the
reference's `np.packbits` trick (ref: models/tensorBase.py:371-380).
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Any

import jax
import numpy as np

FORMAT_VERSION = 1


def _np_tree(tree):
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_checkpoint(model, path: str, extra: dict | None = None):
    """Serialize a LocalTensorfs instance (syncs the device window first).
    `extra` carries driver-loop state (iteration counters, dataset window)
    for true mid-training resume."""
    from .models.local import LocalConfig

    model.sync_window_to_host()

    fields = []
    for i, f in enumerate(model.fields):
        alpha = f["alpha_volume"]
        entry = {
            "params": _np_tree(f["params"]),
            "grid_size": tuple(f["cfg"].grid_size),
            "alpha_shape": None,
            "alpha_bits": None,
            "opt": _np_tree(f["opt"]) if f["opt"] is not None else None,
        }
        if alpha is not None:
            a = np.asarray(jax.device_get(alpha)).astype(bool)
            entry["alpha_shape"] = a.shape
            entry["alpha_bits"] = np.packbits(a.reshape(-1))
        fields.append(entry)

    state = {
        "version": FORMAT_VERSION,
        "kwargs": dataclasses.asdict(model.cfg),
        "frames": {
            "r_all": model.r_all,
            "t_all": model.t_all,
            "exp_all": model.exp_all,
            "pose_opt_all": model.pose_opt_all,
            "pose_linked_rf": list(model.pose_linked_rf),
            "blending_weights": model.blending_weights,
        },
        "fields": fields,
        "world2rf": [np.asarray(w) for w in model.world2rf],
        "rf_iter": list(model.rf_iter),
        "intr": {
            "params": _np_tree(model.intr.params),
            "opt": _np_tree(model.intr.opt),
        },
        "init_focal": model.init_focal,
        "win_start": model.win_start,
        "extra": dict(extra) if extra else {},
        "schedule": {
            "is_refining": model.is_refining,
            "lr_factor": model.lr_factor,
            "n_iters": model.n_iters,
            "n_iters_reg": model.n_iters_reg,
            "N_voxel_list": dict(model.N_voxel_list),
            "update_AlphaMask_list": list(model.update_AlphaMask_list),
        },
    }
    with open(path, "wb") as f:
        pickle.dump(state, f, protocol=4)


def load_checkpoint(path: str, camera_prior=None, return_extra: bool = False):
    """Rebuild a LocalTensorfs from a checkpoint file."""
    import jax.numpy as jnp

    from .models.local import LocalConfig, LocalTensorfs
    from .models.tensorf import TensorfConfig
    from .optim import PyTreeAdamState, pytree_adam_init

    with open(path, "rb") as f:
        state = pickle.load(f)
    assert state["version"] == FORMAT_VERSION

    kwargs = dict(state["kwargs"])
    tf_kwargs = kwargs.pop("tensorf")
    tf_kwargs["grid_size"] = tuple(tf_kwargs["grid_size"])
    for k in ("density_n_comp", "app_n_comp", "aabb_lo", "aabb_hi"):
        tf_kwargs[k] = tuple(tf_kwargs[k])
    kwargs["tensorf"] = TensorfConfig(**tf_kwargs)
    kwargs["WH"] = tuple(kwargs["WH"])
    kwargs["N_voxel_list"] = {int(k): v for k, v in kwargs["N_voxel_list"].items()}
    cfg = LocalConfig(**kwargs)

    model = LocalTensorfs.__new__(LocalTensorfs)
    model.cfg = cfg
    model.camera_prior = camera_prior
    model.W, model.H = cfg.WH
    model._key = jax.random.PRNGKey(cfg.seed + 1)

    fr = state["frames"]
    model.r_all = fr["r_all"]
    model.t_all = fr["t_all"]
    model.exp_all = fr["exp_all"]
    model.pose_opt_all = fr["pose_opt_all"]
    model.pose_linked_rf = list(fr["pose_linked_rf"])
    model.blending_weights = fr["blending_weights"]

    model.fields = []
    for entry in state["fields"]:
        tf_cfg = cfg.tensorf.with_grid(entry["grid_size"])
        alpha = None
        if entry["alpha_bits"] is not None:
            shape = entry["alpha_shape"]
            n = int(np.prod(shape))
            alpha = jnp.asarray(
                np.unpackbits(entry["alpha_bits"])[:n].reshape(shape).astype(np.float32)
            )
        opt = entry["opt"]
        if opt is not None:
            opt = PyTreeAdamState(
                m=jax.tree.map(jnp.asarray, opt.m) if hasattr(opt, "m") else jax.tree.map(jnp.asarray, opt[0]),
                v=jax.tree.map(jnp.asarray, opt.v) if hasattr(opt, "v") else jax.tree.map(jnp.asarray, opt[1]),
                step=jnp.asarray(opt.step if hasattr(opt, "step") else opt[2]),
                lr_scale=jnp.asarray(opt.lr_scale if hasattr(opt, "lr_scale") else opt[3]),
            )
        model.fields.append(
            {
                "params": entry["params"],
                "cfg": tf_cfg,
                "alpha_volume": alpha,
                "opt": opt,
            }
        )
    # the active (last) field lives on device
    model.fields[-1]["params"] = jax.tree.map(jnp.asarray, model.fields[-1]["params"])
    if model.fields[-1]["opt"] is None:
        model.fields[-1]["opt"] = pytree_adam_init(
            model.fields[-1]["params"], model.cfg.moment_dtype
        )

    # mesh/pool attachments don't survive serialization
    model.mesh = None
    model._mesh_states_placed = False
    model.pool = None

    # restore the per-stage occupancy-compaction size (perf-only)
    for fdict in model.fields:
        fdict["cfg"] = dataclasses.replace(
            fdict["cfg"],
            occ_m=model._occ_m(fdict["cfg"], fdict["alpha_volume"] is not None),
        )

    model.world2rf = [np.asarray(w) for w in state["world2rf"]]
    model.rf_iter = list(state["rf_iter"])

    from .models.step import IntrState

    model.intr = IntrState(
        jax.tree.map(jnp.asarray, state["intr"]["params"]),
        PyTreeAdamState(
            m=jax.tree.map(jnp.asarray, state["intr"]["opt"].m),
            v=jax.tree.map(jnp.asarray, state["intr"]["opt"].v),
            step=jnp.asarray(state["intr"]["opt"].step),
            lr_scale=jnp.asarray(state["intr"]["opt"].lr_scale),
        ),
    )
    model.init_focal = state["init_focal"]

    sch = state["schedule"]
    model.is_refining = sch["is_refining"]
    model.lr_factor = sch["lr_factor"]
    model.n_iters = sch["n_iters"]
    model.n_iters_reg = sch["n_iters_reg"]
    model.N_voxel_list = dict(sch["N_voxel_list"])
    model.update_AlphaMask_list = list(sch["update_AlphaMask_list"])

    model.win_start = state["win_start"]
    model._wc = 64
    model._pose_dev = None
    model._build_window()
    if return_extra:
        return model, state.get("extra", {})
    return model
