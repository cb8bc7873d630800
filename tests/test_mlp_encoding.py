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


def test_mlp_remat_chunked_parity(monkeypatch):
    """The chunked-remat path (lax.map over fixed-height chunks, engaged for
    M > ESR_MLP_REMAT_CHUNK rows) must match the plain path to fp32
    reassociation tolerance (chunking changes XLA's matmul tiling and
    reorders the f32 dw partial sums). Includes a non-divisible M to cover the
    pad-tail (pad rows' cotangents are discarded by the [:M] slice, so they
    must not leak into param grads)."""
    dims = [6, 32, 4]
    params = mlp.init_mlp(jax.random.PRNGKey(3), dims)
    for M in (96, 100):  # 96 = 3 full chunks; 100 exercises the pad tail
        x = jnp.asarray(
            np.random.default_rng(M).normal(size=(M, 6)).astype(np.float32))

        def loss(p, chunked):
            if chunked:
                monkeypatch.setattr(mlp, "_REMAT_ROWS", 64)
                monkeypatch.setattr(mlp, "_CHUNK_ROWS", 32)
            else:
                monkeypatch.setattr(mlp, "_REMAT_ROWS", 1 << 30)
            out = mlp.apply_mlp(p, x, final_activation=jax.nn.sigmoid)
            return (out * jnp.arange(M * 4).reshape(M, 4)).sum(), out

        (l0, o0), g0 = jax.value_and_grad(loss, has_aux=True)(params, False)
        (l1, o1), g1 = jax.value_and_grad(loss, has_aux=True)(params, True)
        np.testing.assert_allclose(
            np.asarray(o0), np.asarray(o1), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(g0[k]), np.asarray(g1[k]), rtol=2e-5, atol=2e-5)


def test_mlp_init_statistics_match_torch_linear():
    params = mlp.init_mlp(jax.random.PRNGKey(1), [256, 128])
    w = np.asarray(params["w0"])
    bound = 1 / np.sqrt(256)
    assert abs(w.max()) <= bound + 1e-6
    assert w.std() > bound / 3  # uniform, not degenerate

    params = mlp.init_mlp(jax.random.PRNGKey(2), [8, 8, 5], zero_final_bias=True)
    assert np.all(np.asarray(params["b1"]) == 0)


def test_mlp_inference_mode_skips_auto_remat(monkeypatch):
    """Under mlp.inference_mode() (how cached_jit traces every eval-path
    fn) the large-M auto-remat heuristic is off — forward-only sweeps keep
    full-batch parallelism — while an explicit remat=True still engages,
    and the outputs are identical either way."""
    monkeypatch.setattr(mlp, "_REMAT_ROWS", 16)
    params = mlp.init_mlp(jax.random.PRNGKey(7), [4, 8, 2])
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32))

    calls = []
    orig = mlp.apply_mlp

    def spy(p, y, *a, **kw):
        calls.append(kw.get("remat"))
        return orig(p, y, *a, **kw)

    monkeypatch.setattr(mlp, "apply_mlp", spy)
    with mlp.inference_mode():
        out_inf = orig(params, x)
        # the auto-heuristic must not have recursed through the remat
        # wrapper (which calls apply_mlp(remat=False) per chunk)
        assert calls == []
        assert mlp._INFERENCE
    assert not mlp._INFERENCE
    out_plain = orig(params, x)
    np.testing.assert_array_equal(np.asarray(out_inf), np.asarray(out_plain))
