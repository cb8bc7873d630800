"""TV loss / TV-gradient parity vs numpy oracles of the reference Python TV
(``functions.py:34-42``) and the CUDA in-place grad kernel
(``total_variation_kernel.cu:13-133``, corrected per-axis weights)."""

import pytest
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.ops import tv

pytestmark = pytest.mark.quick


def test_total_variation_matches_reference():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(5, 6, 7, 2)).astype(np.float32)
    ours = float(tv.total_variation(jnp.asarray(v)))
    ref = (
        np.abs(np.diff(v, axis=0)).mean()
        + np.abs(np.diff(v, axis=1)).mean()
        + np.abs(np.diff(v, axis=2)).mean()
    ) / 3
    assert abs(ours - ref) < 1e-6


def test_total_variation_masked():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(5, 6, 7, 1)).astype(np.float32)
    mask = rng.uniform(size=(5, 6, 7)) > 0.4
    ours = float(tv.total_variation(jnp.asarray(v), jnp.asarray(mask)))

    tvs = []
    for ax in range(3):
        d = np.abs(np.diff(v[..., 0], axis=ax))
        m = np.logical_and(
            np.take(mask, range(0, mask.shape[ax] - 1), axis=ax),
            np.take(mask, range(1, mask.shape[ax]), axis=ax),
        )
        tvs.append(d[m].mean())
    assert abs(ours - float(np.mean(tvs))) < 1e-6


def oracle_tv_grad(param, wx, wy, wz, sparse_grad=None, mask=None):
    """Per-voxel sum of clamped diffs to each neighbor (CUDA semantics with
    corrected per-axis weights), on [X,Y,Z,C]."""
    X, Y, Z, C = param.shape
    g = np.zeros_like(param)
    w = [wx / 6, wy / 6, wz / 6]
    for ax in range(3):
        for x in range(X):
            for y in range(Y):
                for z in range(Z):
                    idx = [x, y, z]
                    for d in (-1, 1):
                        nb = idx.copy()
                        nb[ax] += d
                        if not (0 <= nb[ax] < param.shape[ax]):
                            continue
                        diff = np.clip(
                            param[x, y, z] - param[nb[0], nb[1], nb[2]], -1, 1
                        )
                        if mask is not None:
                            diff = diff * mask[x, y, z] * mask[nb[0], nb[1], nb[2]]
                        g[x, y, z] += w[ax] * diff
    if sparse_grad is not None:
        g[sparse_grad == 0] = 0
    return g


def test_tv_grad_dense():
    rng = np.random.default_rng(2)
    p = rng.normal(size=(4, 3, 5, 1)).astype(np.float32) * 2
    ours = np.asarray(tv.tv_grad(jnp.asarray(p), 0.3, 0.5, 0.7))
    ref = oracle_tv_grad(p, 0.3, 0.5, 0.7)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_tv_grad_sparse_and_masked():
    rng = np.random.default_rng(3)
    p = rng.normal(size=(4, 4, 4, 1)).astype(np.float32)
    sparse = rng.integers(0, 2, size=p.shape).astype(np.float32)
    mask = rng.uniform(size=(4, 4, 4)).astype(np.float32)
    ours = np.asarray(
        tv.tv_grad(jnp.asarray(p), 1.0, 1.0, 1.0,
                   sparse_grad=jnp.asarray(sparse),
                   nonempty_mask=jnp.asarray(mask))
    )
    ref = oracle_tv_grad(p, 1.0, 1.0, 1.0, sparse_grad=sparse,
                         mask=mask[..., None] if mask.ndim == 3 else mask)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
