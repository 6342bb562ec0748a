"""Parity of the gated/stacked Adam vs torch.optim.Adam (betas 0.9/0.99)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from localrf_tpu import optim as lo


def test_pytree_adam_matches_torch(rng):
    p0 = rng.normal(size=(5, 7)).astype(np.float32)
    params = {"a": jnp.asarray(p0)}
    state = lo.pytree_adam_init(params)
    lrs = {"a": 0.02}

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=0.02, betas=(0.9, 0.99))

    for i in range(10):
        g = rng.normal(size=(5, 7)).astype(np.float32)
        params, state = lo.pytree_adam_update(params, {"a": jnp.asarray(g)}, state, lrs)
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
    np.testing.assert_allclose(np.asarray(params["a"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_pytree_adam_lr_scale_decay(rng):
    """lr_scale emulates the multiplicative per-iteration decay."""
    p0 = rng.normal(size=(4,)).astype(np.float32)
    params = {"a": jnp.asarray(p0)}
    state = lo.pytree_adam_init(params)
    lrs = {"a": 0.02}
    factor = 0.98

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=0.02, betas=(0.9, 0.99))

    for i in range(6):
        g = rng.normal(size=(4,)).astype(np.float32)
        params, state = lo.pytree_adam_update(params, {"a": jnp.asarray(g)}, state, lrs)
        state = state._replace(lr_scale=state.lr_scale * factor)
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        for group in topt.param_groups:
            group["lr"] *= factor
    np.testing.assert_allclose(np.asarray(params["a"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_gated_adam_matches_independent_torch_adams(rng):
    """Stacked per-frame Adam with gates == N independent torch Adams stepped
    only when their frame is gated."""
    n = 6
    p0 = rng.normal(size=(n, 3, 2)).astype(np.float32)
    param = jnp.asarray(p0)
    state = lo.adam_init(param, lr=5e-3, per_frame=True)

    tps = [torch.nn.Parameter(torch.from_numpy(p0[i].copy())) for i in range(n)]
    topts = [torch.optim.Adam([tp], lr=5e-3, betas=(0.9, 0.99)) for tp in tps]

    for it in range(8):
        g = rng.normal(size=(n, 3, 2)).astype(np.float32)
        gate = rng.uniform(size=n) > 0.4
        param, state = lo.adam_update(param, jnp.asarray(g), state, jnp.asarray(gate))
        for i in range(n):
            if gate[i]:
                tps[i].grad = torch.from_numpy(g[i].copy())
                topts[i].step()
    expected = np.stack([tp.detach().numpy() for tp in tps])
    np.testing.assert_allclose(np.asarray(param), expected, rtol=1e-5, atol=1e-6)


def test_gated_adam_per_frame_lr_decay(rng):
    n = 4
    p0 = rng.normal(size=(n, 3)).astype(np.float32)
    param = jnp.asarray(p0)
    state = lo.adam_init(param, lr=1e-2, per_frame=True)
    factor = 0.95

    tps = [torch.nn.Parameter(torch.from_numpy(p0[i].copy())) for i in range(n)]
    topts = [torch.optim.Adam([tp], lr=1e-2, betas=(0.9, 0.99)) for tp in tps]

    for it in range(5):
        g = rng.normal(size=(n, 3)).astype(np.float32)
        gate = np.array([True, True, False, it % 2 == 0])
        # reference order: lr *= factor for gated frames, then step
        state = lo.scale_lr(state, factor, jnp.asarray(gate))
        param, state = lo.adam_update(param, jnp.asarray(g), state, jnp.asarray(gate))
        for i in range(n):
            if gate[i]:
                for group in topts[i].param_groups:
                    group["lr"] *= factor
                tps[i].grad = torch.from_numpy(g[i].copy())
                topts[i].step()
    expected = np.stack([tp.detach().numpy() for tp in tps])
    np.testing.assert_allclose(np.asarray(param), expected, rtol=1e-5, atol=1e-6)


def test_field_base_lrs_groups():
    params = {
        "density_plane_0": jnp.zeros((2, 3, 3)),
        "basis_mat": jnp.zeros((4, 5)),
        "mlp": {"w1": jnp.zeros((3, 3))},
    }
    lrs = lo.field_base_lrs(params, 0.02, 1e-3)
    assert lrs["density_plane_0"] == 0.02
    assert lrs["basis_mat"] == 1e-3
    assert lrs["mlp"]["w1"] == 1e-3


def test_pytree_adam_bf16_moments_track_f32():
    """bf16 moment storage (--moment_dtype bfloat16): update math runs in
    f32, so a short trajectory stays close to the f32-moment one and the
    stored moments keep their dtype across steps."""
    rng = np.random.default_rng(3)
    params = {"a": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))}
    lrs = {"a": 1e-2}
    s32 = lo.pytree_adam_init(params)
    s16 = lo.pytree_adam_init(params, "bfloat16")
    assert s16.m["a"].dtype == jnp.bfloat16
    p32, p16 = params, params
    for it in range(20):
        g = {"a": jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))}
        p32, s32 = lo.pytree_adam_update(p32, g, s32, lrs)
        p16, s16 = lo.pytree_adam_update(p16, g, s16, lrs)
    assert s16.m["a"].dtype == jnp.bfloat16
    assert s16.v["a"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(p16["a"]), np.asarray(p32["a"]), atol=5e-3
    )
