"""Gated Adam optimizers over stacked parameter arrays.

The reference allocates one `torch.optim.Adam` per frame for rotation,
translation and exposure (ref: local_tensorfs.py:175-177) and steps only the
frames linked to the current local field (ref: local_tensorfs.py:210-276).
TPU-native equivalent: parameters for all frames live in stacked arrays
[N, ...]; each update is elementwise-gated per frame so moments, step counts
and learning rates advance only for gated frames — bit-identical to running
N independent Adam instances.

Bias correction matches torch.optim.Adam (betas=(0.9, 0.99), eps=1e-8).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

B1, B2, EPS = 0.9, 0.99, 1e-8


class AdamState(NamedTuple):
    m: jax.Array
    v: jax.Array
    step: jax.Array  # [] or [N] — per-frame step counts for gated updates
    lr: jax.Array  # [] or [N] — current (decayed) learning rate


def adam_init(param: jax.Array, lr: float, per_frame: bool = False) -> AdamState:
    """per_frame=True: leading axis of `param` indexes frames; step/lr are [N]."""
    n = param.shape[0]
    if per_frame:
        step = jnp.zeros((n,), jnp.int32)
        lr_arr = jnp.full((n,), lr, jnp.float32)
    else:
        step = jnp.zeros((), jnp.int32)
        lr_arr = jnp.asarray(lr, jnp.float32)
    return AdamState(jnp.zeros_like(param), jnp.zeros_like(param), step, lr_arr)


def _bcast(x: jax.Array, target_ndim: int) -> jax.Array:
    """Broadcast a [N] per-frame vector against [N, ...] params."""
    return x.reshape(x.shape + (1,) * (target_ndim - x.ndim))


def adam_update(
    param: jax.Array,
    grad: jax.Array,
    state: AdamState,
    gate: jax.Array | None = None,
) -> tuple[jax.Array, AdamState]:
    """One gated Adam step.

    gate: None (always update), scalar bool, or [N] per-frame bool. Where the
    gate is off, param/m/v/step are untouched (exactly as if that frame's
    optimizer was never stepped).
    """
    if gate is None:
        gate = jnp.ones((), bool)
    gate_p = _bcast(gate.astype(param.dtype), param.ndim) if gate.ndim else gate.astype(param.dtype)
    gate_s = gate.astype(state.step.dtype)

    step = state.step + gate_s
    m = state.m + gate_p * ((1 - B1) * (grad - state.m))
    v = state.v + gate_p * ((1 - B2) * (grad**2 - state.v))

    if state.lr.ndim:
        lr = _bcast(state.lr, param.ndim)
        bc1 = _bcast(1.0 - B1 ** _pf(step, param), param.ndim)
        bc2 = _bcast(1.0 - B2 ** _pf(step, param), param.ndim)
    else:
        lr = state.lr
        step_f = jnp.maximum(step, 1).astype(param.dtype)
        bc1 = 1.0 - B1**step_f
        bc2 = 1.0 - B2**step_f

    m_hat = m / bc1
    v_hat = v / bc2
    update = lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    new_param = param - gate_p * update
    return new_param, AdamState(m, v, step, state.lr)


def _pf(step: jax.Array, param: jax.Array) -> jax.Array:
    return jnp.maximum(step, 1).astype(param.dtype)


def scale_lr(state: AdamState, factor: jax.Array, gate: jax.Array | None = None) -> AdamState:
    """Multiply the (per-frame) lr by `factor` where gated — the reference's
    `param_group["lr"] *= lr_factor` (ref: local_tensorfs.py:213-224)."""
    if gate is None:
        lr = state.lr * factor
    else:
        lr = jnp.where(gate, state.lr * factor, state.lr)
    return state._replace(lr=lr)


# --------------------- pytree (field) optimizer ---------------------


class PyTreeAdamState(NamedTuple):
    m: dict
    v: dict
    step: jax.Array
    lr_scale: jax.Array  # multiplicative decay applied to every group lr


def pytree_adam_init(params, moment_dtype: str | None = None) -> PyTreeAdamState:
    """moment_dtype: storage dtype for m/v ("bfloat16" halves optimizer HBM
    — update math still runs in float32, see pytree_adam_update)."""
    dt = jnp.dtype(moment_dtype) if moment_dtype else None

    def zeros(p):
        return jnp.zeros(p.shape, dt or p.dtype)

    return PyTreeAdamState(
        m=jax.tree.map(zeros, params),
        v=jax.tree.map(zeros, params),
        step=jnp.zeros((), jnp.int32),
        lr_scale=jnp.ones((), jnp.float32),
    )


def pytree_adam_update(
    params,
    grads,
    state: PyTreeAdamState,
    base_lrs,
    gate: jax.Array | None = None,
) -> tuple[dict, PyTreeAdamState]:
    """Adam over a params pytree with per-leaf base lrs (a matching pytree of
    python floats), all scaled by the dynamic `lr_scale`. `gate` (scalar bool)
    freezes params, moments and step when off."""
    g_on = jnp.ones((), jnp.float32) if gate is None else gate.astype(jnp.float32)
    step = state.step + g_on.astype(state.step.dtype)
    step_f = jnp.maximum(step, 1).astype(jnp.float32)
    bc1 = 1.0 - B1**step_f
    bc2 = 1.0 - B2**step_f

    def upd(p, g, m, v, lr):
        # moments may be stored bf16; the update math runs in f32 and the
        # new moments round back to the storage dtype
        mdt = m.dtype
        m = m.astype(jnp.float32) + g_on * ((1 - B1) * (g.astype(jnp.float32) - m.astype(jnp.float32)))
        v = v.astype(jnp.float32) + g_on * ((1 - B2) * (g.astype(jnp.float32) ** 2 - v.astype(jnp.float32)))
        new_p = p - g_on * (lr * state.lr_scale) * (m / bc1) / (jnp.sqrt(v / bc2) + EPS)
        return new_p, m.astype(mdt), v.astype(mdt)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.m)
    flat_v = treedef.flatten_up_to(state.v)
    flat_lr = treedef.flatten_up_to(base_lrs)
    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, PyTreeAdamState(new_m, new_v, step, state.lr_scale)


def field_base_lrs(params, lr_spatial: float, lr_net: float):
    """Reference param groups: factor grids at lr_init (0.02), basis matrix
    and shading MLP at lr_basis (1e-3) (ref: models/tensoRF.py:52-64)."""

    def assign(path, _):
        name = path[0].key if hasattr(path[0], "key") else str(path[0])
        return lr_net if name in ("basis_mat", "mlp") else lr_spatial

    return jax.tree_util.tree_map_with_path(assign, params)
