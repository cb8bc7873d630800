"""Transmittance scan + NeuS alpha parity vs numpy oracles implementing the
CUDA semantics (``render_utils_kernel.cu:576-707``) and the reference torch
formulas (``app/utils/base/functions.py:45-105``)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.ops import render

pytestmark = pytest.mark.quick


def oracle_alpha2weight(alpha, mask, n_rays_early_exit=1e-3):
    """Direct port of the CUDA per-ray sequential scan on the dense layout:
    invalid samples are skipped (as if compacted away)."""
    N, S = alpha.shape
    weights = np.zeros_like(alpha)
    alphainv_last = np.ones(N, alpha.dtype)
    for i in range(N):
        T = 1.0
        for s in range(S):
            if not mask[i, s]:
                continue
            weights[i, s] = T * alpha[i, s]
            T *= 1.0 - alpha[i, s]
            if T < n_rays_early_exit:
                break
        alphainv_last[i] = T
    return weights, alphainv_last


def test_alpha2weights_matches_cuda_semantics():
    rng = np.random.default_rng(0)
    alpha = rng.uniform(0, 1, size=(16, 40)).astype(np.float32)
    # some rays nearly opaque to trigger the early exit
    alpha[::3] = np.clip(alpha[::3] * 3, 0, 0.98)
    mask = rng.uniform(size=(16, 40)) > 0.3

    w, last = render.alpha2weights(jnp.asarray(alpha), jnp.asarray(mask))
    w_ref, last_ref = oracle_alpha2weight(alpha, mask)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(last), last_ref, rtol=1e-5, atol=1e-6)


def test_alpha2weights_grad_matches_finite_difference():
    rng = np.random.default_rng(1)
    alpha0 = rng.uniform(0.05, 0.4, size=(3, 8)).astype(np.float32)
    mask = jnp.asarray(rng.uniform(size=(3, 8)) > 0.2)
    gw = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    gl = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))

    def f(a):
        w, last = render.alpha2weights(a, mask, early_exit=None)
        return (w * gw).sum() + (last * gl).sum()

    g = jax.grad(f)(jnp.asarray(alpha0))
    eps = 1e-3
    for i, s in [(0, 0), (1, 3), (2, 7)]:
        da = jnp.zeros_like(g).at[i, s].set(eps)
        fd = (f(jnp.asarray(alpha0) + da) - f(jnp.asarray(alpha0) - da)) / (2 * eps)
        assert abs(float(g[i, s]) - float(fd)) < 5e-3


def oracle_neus_interp(sdf_flat, ray_id, s_val):
    """Torch-formula port (functions.py:72-105) on a compacted list."""
    sdf = sdf_flat
    same = ray_id[:-1] == ray_id[1:]
    est_next = np.concatenate(
        [np.where(same, 0.5 * (sdf[:-1] + sdf[1:]), sdf[:-1]), sdf[-1:]]
    )
    est_prev = np.concatenate(
        [sdf[:1], np.where(same, 0.5 * (sdf[:-1] + sdf[1:]), sdf[1:])]
    )

    def sig(x):
        return 1 / (1 + np.exp(-x))

    prev_cdf = sig(est_prev * s_val)
    next_cdf = sig(est_next * s_val)
    p = np.maximum(prev_cdf - next_cdf, 0)
    return np.clip((p + 1e-5) / (prev_cdf + 1e-5), 0, 1)


def test_neus_alpha_interp_matches_ragged_reference():
    rng = np.random.default_rng(2)
    N, S = 7, 24
    sdf = rng.normal(scale=0.3, size=(N, S)).astype(np.float32)
    mask = rng.uniform(size=(N, S)) > 0.35
    mask[3] = False  # fully-masked ray
    s_val = 17.0

    ours = np.asarray(render.neus_alpha_interp(jnp.asarray(sdf), jnp.asarray(mask), s_val))

    # build the compacted oracle and scatter back
    expected = np.zeros((N, S), np.float32)
    sdf_list, ray_ids, pos = [], [], []
    for i in range(N):
        for s in range(S):
            if mask[i, s]:
                sdf_list.append(sdf[i, s])
                ray_ids.append(i)
                pos.append((i, s))
    if sdf_list:
        alphas = oracle_neus_interp(
            np.asarray(sdf_list, np.float32), np.asarray(ray_ids), s_val
        )
        for (i, s), a in zip(pos, alphas):
            expected[i, s] = a
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_neus_alpha_grad_variant():
    rng = np.random.default_rng(3)
    N, S = 4, 10
    sdf = rng.normal(scale=0.2, size=(N, S)).astype(np.float32)
    grads = rng.normal(size=(N, S, 3)).astype(np.float32)
    view = rng.normal(size=(N, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    mask = np.ones((N, S), bool)
    dist, s_val = 0.05, 30.0

    ours = np.asarray(
        render.neus_alpha_grad(
            jnp.asarray(sdf), jnp.asarray(grads), jnp.asarray(view), dist,
            jnp.asarray(mask), s_val,
        )
    )

    iter_cos = (view[:, None, :] * grads).sum(-1) * dist * 0.5
    sig = lambda x: 1 / (1 + np.exp(-x))
    prev_cdf = sig((sdf - iter_cos) * s_val)
    next_cdf = sig((sdf + iter_cos) * s_val)
    p = np.maximum(prev_cdf - next_cdf, 0)
    expected = np.clip((p + 1e-5) / (prev_cdf + 1e-5), 0, 1)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_dvgo_weights_match_reference_formula():
    rng = np.random.default_rng(4)
    alpha = rng.uniform(0, 1, size=(5, 12)).astype(np.float32)
    w, cum = render.ray_marching_weights_dvgo(jnp.asarray(alpha))
    one_m = np.clip(1 - alpha, 1e-10, None)
    cum_ref = np.concatenate(
        [np.ones((5, 1), np.float32), np.cumprod(one_m, -1)], -1
    )
    np.testing.assert_allclose(np.asarray(cum), cum_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(w), alpha * cum_ref[:, :-1], rtol=1e-6)
