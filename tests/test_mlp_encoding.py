"""MLP init/apply vs torch Linear stacks; positional encoding layout."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from esrnerf_tpu.models import mlp
from esrnerf_tpu.ops import encoding

pytestmark = pytest.mark.quick


def test_posenc_layout_matches_reference():
    x = jnp.asarray([[0.5, -1.0, 2.0]])
    out = np.asarray(encoding.posenc(x, 2))
    emb = (np.asarray(x)[..., None] * np.array([1.0, 2.0])).reshape(1, -1)
    ref = np.concatenate([np.asarray(x), np.sin(emb), np.cos(emb)], -1)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert out.shape[-1] == encoding.posenc_dim(3, 2)


def test_mlp_matches_torch_forward():
    dims = [7, 16, 16, 3]
    params = mlp.init_mlp(jax.random.PRNGKey(0), dims)
    layers = []
    for i in range(3):
        lin = torch.nn.Linear(dims[i], dims[i + 1])
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(params[f"w{i}"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(params[f"b{i}"])))
        layers.append(lin)
        if i < 2:
            layers.append(torch.nn.ReLU())
    net = torch.nn.Sequential(*layers)

    x = np.random.default_rng(0).normal(size=(11, 7)).astype(np.float32)
    ours = np.asarray(mlp.apply_mlp(params, jnp.asarray(x)))
    ref = net(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_mlp_init_statistics_match_torch_linear():
    params = mlp.init_mlp(jax.random.PRNGKey(1), [256, 128])
    w = np.asarray(params["w0"])
    bound = 1 / np.sqrt(256)
    assert abs(w.max()) <= bound + 1e-6
    assert w.std() > bound / 3  # uniform, not degenerate

    params = mlp.init_mlp(jax.random.PRNGKey(2), [8, 8, 5], zero_final_bias=True)
    assert np.all(np.asarray(params["b1"]) == 0)
