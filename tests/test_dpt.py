"""JAX DPT vs Hugging Face torch DPT — exact-graph parity with random
weights (no downloads: the HF model is built from the default config)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from localrf_tpu.preprocess.dpt import (
    DPTConfigJ,
    convert_dpt_state_dict,
    dpt_apply,
)


@pytest.fixture(scope="module")
def torch_dpt():
    from transformers import DPTConfig, DPTForDepthEstimation

    torch.manual_seed(0)
    model = DPTForDepthEstimation(DPTConfig()).eval()
    return model


@pytest.mark.slow
def test_dpt_matches_transformers(torch_dpt, rng):
    cfg = DPTConfigJ()  # defaults == HF DPTConfig defaults (DPT-base)
    params = convert_dpt_state_dict(torch_dpt.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)

    x = rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = torch_dpt(torch.from_numpy(x)).predicted_depth.numpy()

    ours = np.asarray(dpt_apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg))
    assert ours.shape == ref.shape
    denom = np.abs(ref).max() + 1e-6
    assert np.max(np.abs(ours - ref)) / denom < 2e-3, (
        np.max(np.abs(ours - ref)),
        denom,
    )


@pytest.mark.slow
def test_dpt_batched_shapes(torch_dpt):
    cfg = DPTConfigJ()
    params = convert_dpt_state_dict(torch_dpt.state_dict(), cfg)
    params = jax.tree.map(jnp.asarray, params)
    x = jnp.zeros((2, 64, 96, 3))
    out = dpt_apply(params, x, cfg)
    # 4 fusion x2 upsamples from H/32 plus the head's x2 -> input resolution
    assert out.shape == (2, 64, 96)
    assert bool(jnp.all(jnp.isfinite(out)))
