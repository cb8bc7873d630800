"""Grid sampling / resizing parity vs torch (the reference's backend).

Oracle: ``F.grid_sample(..., align_corners=True)`` with the reference's
coordinate convention (``module.py:24-35``: normalize to [-1,1], flip xyz ->
zyx against a [1,C,X,Y,Z] grid).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from esrnerf_tpu.ops import grid as gridops

pytestmark = pytest.mark.quick


def torch_grid_sample(grid_xyzc, pts, xyz_min, xyz_max, padding="zeros"):
    """Reference-convention grid_sample: grid [X,Y,Z,C] -> [1,C,X,Y,Z]."""
    g = torch.from_numpy(np.moveaxis(grid_xyzc, -1, 0)[None])  # [1,C,X,Y,Z]
    xyz = torch.from_numpy(pts).reshape(1, 1, 1, -1, 3)
    mn = torch.from_numpy(xyz_min)
    mx = torch.from_numpy(xyz_max)
    ind = ((xyz - mn) / (mx - mn)).flip((-1,)) * 2 - 1
    out = F.grid_sample(g, ind, mode="bilinear", align_corners=True,
                        padding_mode=padding)
    C = g.shape[1]
    return out.reshape(C, -1).T.reshape(*pts.shape[:-1], C).numpy()


@pytest.mark.parametrize("mode,padding", [("zeros", "zeros"), ("border", "border")])
def test_grid_sample_matches_torch(mode, padding):
    rng = np.random.default_rng(0)
    grid = rng.normal(size=(9, 7, 11, 4)).astype(np.float32)
    xyz_min = np.array([-1.0, -2.0, 0.5], np.float32)
    xyz_max = np.array([1.5, 0.5, 3.0], np.float32)
    # include points outside the bbox to exercise padding
    pts = rng.uniform(-2.5, 4.0, size=(257, 3)).astype(np.float32)

    ours = gridops.grid_sample_3d(
        jnp.asarray(grid), jnp.asarray(pts), jnp.asarray(xyz_min),
        jnp.asarray(xyz_max), mode=mode,
    )
    ref = torch_grid_sample(grid, pts, xyz_min, xyz_max, padding)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_grad_wrt_coords():
    """Coordinate gradients must flow (replaces the reference's hand-written
    differentiable_grid_sample, functions.py:142-309). The production
    grid_sample_3d deliberately has a zero coord-cotangent; coordinate
    gradients come from grid_sample_3d_impl / grid_sample_3d_coordgrad."""
    grid = jnp.asarray(np.random.default_rng(1).normal(size=(5, 5, 5, 1)),
                       dtype=jnp.float32)
    mn = jnp.zeros(3)
    mx = jnp.ones(3) * 4.0

    def f(p):
        return gridops.grid_sample_3d_impl(grid, p, mn, mx).sum()

    p0 = jnp.array([[1.3, 2.7, 0.9]], dtype=jnp.float32)
    g = jax.grad(f)(p0)
    # finite differences
    eps = 1e-3
    for d in range(3):
        dp = jnp.zeros_like(p0).at[0, d].set(eps)
        fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        assert abs(float(g[0, d]) - float(fd)) < 1e-2


def test_resize_trilinear_matches_torch():
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(6, 5, 7, 3)).astype(np.float32)
    new_size = (13, 9, 4)
    ours = gridops.resize_trilinear(jnp.asarray(grid), new_size)
    ref = F.interpolate(
        torch.from_numpy(np.moveaxis(grid, -1, 0)[None]),
        size=new_size, mode="trilinear", align_corners=True,
    )[0].numpy()
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(ref, 0, -1), rtol=1e-5, atol=1e-5
    )


def test_maxpool_matches_torch():
    rng = np.random.default_rng(3)
    g = rng.normal(size=(8, 9, 10, 1)).astype(np.float32)
    ours = gridops.max_pool_3d_same(jnp.asarray(g), 3)
    ref = F.max_pool3d(
        torch.from_numpy(np.moveaxis(g, -1, 0)[None]), kernel_size=3,
        padding=1, stride=1,
    )[0].numpy()
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(ref, 0, -1),
                               rtol=1e-6, atol=1e-6)


def test_conv3d_replicate_matches_torch():
    rng = np.random.default_rng(4)
    g = rng.normal(size=(7, 8, 9, 2)).astype(np.float32)
    k = gridops.make_gaussian_kernel_3d(5, 0.8)
    ours = gridops.conv3d_replicate(jnp.asarray(g), jnp.asarray(k))

    conv = torch.nn.Conv3d(2, 2, 5, stride=1, padding=2,
                           padding_mode="replicate", groups=2, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.tile(k[None, None], (2, 1, 1, 1, 1))))
    ref = conv(torch.from_numpy(np.moveaxis(g, -1, 0)[None]))[0].detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(ref, 0, -1),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_replicate_nonseparable_kernel():
    """Random (rank>1) kernels take the k^3 shifted-add stencil path."""
    rng = np.random.default_rng(5)
    g = rng.normal(size=(6, 7, 5, 2)).astype(np.float32)
    k = rng.normal(size=(3, 3, 3)).astype(np.float32)
    ours = gridops.conv3d_replicate(jnp.asarray(g), k)

    conv = torch.nn.Conv3d(2, 2, 3, stride=1, padding=1,
                           padding_mode="replicate", groups=2, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.tile(k[None, None], (2, 1, 1, 1, 1))))
    ref = conv(torch.from_numpy(np.moveaxis(g, -1, 0)[None]))[0].detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(ref, 0, -1),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_replicate_binomial_separable():
    """The gradient-smooth binomial kernel must hit the separable path and
    stay exact."""
    rng = np.random.default_rng(6)
    g = rng.normal(size=(9, 6, 8, 3)).astype(np.float32)
    k = gridops.make_gradient_smooth_kernel_3d()
    assert gridops._separate_kernel_3d(np.asarray(k)) is not None
    ours = gridops.conv3d_replicate(jnp.asarray(g), k)

    conv = torch.nn.Conv3d(3, 3, 3, stride=1, padding=1,
                           padding_mode="replicate", groups=3, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.tile(k[None, None], (3, 1, 1, 1, 1))))
    ref = conv(torch.from_numpy(np.moveaxis(g, -1, 0)[None]))[0].detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), np.moveaxis(ref, 0, -1),
                               rtol=1e-4, atol=1e-5)
