"""Parity of the window-packed / flat-segmented fast paths against the dense
oracles they replace (the march restructure must be a pure re-layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrnerf_tpu.ops import grid as gridops
from esrnerf_tpu.ops import render as renderops

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_displaced_taps_matches_dense_trilinear(rng):
    X, Y, Z = 17, 13, 21
    grid = jnp.asarray(rng.normal(size=(X, Y, Z, 1)).astype(np.float32))
    lo = jnp.asarray([-1.0, -0.5, -2.0])
    hi = jnp.asarray([1.0, 1.5, 0.5])
    M = 400
    pts = jnp.asarray(
        rng.uniform(-1.2, 1.2, (M, 3)).astype(np.float32)
        * np.asarray([1.0, 1.0, 1.2], np.float32)
    )
    displace = (0.5, 1.0, 1.5, 2.0)

    vals = gridops.displaced_taps(grid, pts, lo, hi, displace)  # [M,6,D]

    # dense oracle: explicit displaced positions + border trilinear
    size = jnp.asarray([X, Y, Z], jnp.float32)
    ind = gridops.normalized_index(pts, lo, hi, (X, Y, Z))
    base = jnp.asarray(
        [[0, 0, -1], [0, 0, 1], [0, -1, 0], [0, 1, 0], [-1, 0, 0], [1, 0, 0]],
        jnp.float32,
    )
    dd = jnp.asarray(displace, jnp.float32)
    all_ind = jnp.clip(
        ind[:, None, None, :] + base[None, :, None, :] * dd[None, None, :, None],
        0.0, size - 1.0,
    )
    ref = gridops.grid_sample_3d(
        grid, all_ind, jnp.zeros(3), size - 1.0, mode="border"
    )[..., 0]

    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_displaced_taps_grid_gradient(rng):
    """custom-vjp grid gradient == autodiff through the dense oracle."""
    X = Y = Z = 9
    grid = jnp.asarray(rng.normal(size=(X, Y, Z, 1)).astype(np.float32))
    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray(rng.uniform(-1.1, 1.1, (64, 3)).astype(np.float32))
    displace = (0.5, 1.0)
    ct = jnp.asarray(rng.normal(size=(64, 6, 2)).astype(np.float32))

    def fast(g):
        return (gridops.displaced_taps(g, pts, lo, hi, displace) * ct).sum()

    def dense(g):
        size = jnp.asarray([X, Y, Z], jnp.float32)
        ind = gridops.normalized_index(pts, lo, hi, (X, Y, Z))
        base = jnp.asarray(
            [[0, 0, -1], [0, 0, 1], [0, -1, 0], [0, 1, 0], [-1, 0, 0],
             [1, 0, 0]], jnp.float32)
        dd = jnp.asarray(displace, jnp.float32)
        all_ind = jnp.clip(
            ind[:, None, None, :]
            + base[None, :, None, :] * dd[None, None, :, None],
            0.0, size - 1.0)
        vals = gridops.grid_sample_3d_impl(
            g, all_ind, jnp.zeros(3), size - 1.0, mode="border")[..., 0]
        return (vals * ct).sum()

    g_fast = jax.grad(fast)(grid)
    g_dense = jax.grad(dense)(grid)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_dense), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("mode", ["zeros", "border"])
@pytest.mark.parametrize("C", [1, 6])
def test_grid_sample_custom_vjp_matches_impl(rng, mode, C):
    """The production sampler's scalar-scatter backward must equal native
    autodiff of the reference implementation."""
    X, Y, Z = 13, 11, 9
    grid = jnp.asarray(rng.normal(size=(X, Y, Z, C)).astype(np.float32))
    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray(rng.uniform(-1.15, 1.15, (257, 3)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(257, C)).astype(np.float32))

    out = gridops.grid_sample_3d(grid, pts, lo, hi, mode)
    ref = gridops.grid_sample_3d_impl(grid, pts, lo, hi, mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    g_fast = jax.grad(
        lambda g: (gridops.grid_sample_3d(g, pts, lo, hi, mode) * ct).sum()
    )(grid)
    g_ref = jax.grad(
        lambda g: (gridops.grid_sample_3d_impl(g, pts, lo, hi, mode) * ct).sum()
    )(grid)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_coordgrad_matches_autograd(rng):
    X, Y, Z = 11, 9, 13
    grid = jnp.asarray(rng.normal(size=(X, Y, Z, 1)).astype(np.float32))
    lo = jnp.asarray([-1.0, -1.0, -1.0])
    hi = jnp.asarray([1.0, 1.0, 1.0])
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (128, 3)).astype(np.float32))

    val, dxyz = gridops.grid_sample_3d_coordgrad(grid, pts, lo, hi)

    ref_val = gridops.grid_sample_3d(grid, pts, lo, hi)[..., 0]

    def one(p):
        return gridops.grid_sample_3d_impl(grid, p[None], lo, hi)[0, 0]

    ref_dxyz = jax.vmap(jax.grad(one))(pts)

    np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dxyz), np.asarray(ref_dxyz),
                               rtol=1e-4, atol=1e-5)

    # grid-gradient of the spatial gradient (normal-smoothness loss path)
    ct = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))

    def fast(g):
        _, d = gridops.grid_sample_3d_coordgrad(g, pts, lo, hi)
        return (d * ct).sum()

    def dense(g):
        def one(p):
            return gridops.grid_sample_3d_impl(g, p[None], lo, hi)[0, 0]
        return (jax.vmap(jax.grad(one))(pts) * ct).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(fast)(grid)), np.asarray(jax.grad(dense)(grid)),
        rtol=1e-4, atol=1e-4,
    )


def test_flat_scans_match_dense(rng):
    """Segmented alpha/transmittance over a flat compacted list must equal
    the dense [N, S] versions."""
    N, S = 7, 40
    sdf = jnp.asarray(rng.normal(scale=0.4, size=(N, S)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(N, S)) > 0.35)
    # one fully-empty ray
    mask = mask.at[3].set(False)
    s_val = 20.0

    alpha_dense = renderops.neus_alpha_interp(sdf, mask, s_val)
    w_dense, last_dense = renderops.alpha2weights(alpha_dense, mask)

    # flat list: every (ray, sample) slot (superset of mask => holes kept)
    ray_id = jnp.repeat(jnp.arange(N), S)
    step_id = jnp.tile(jnp.arange(S), N)
    sdf_f = sdf.reshape(-1)
    valid_f = mask.reshape(-1)
    alpha_flat = renderops.neus_alpha_interp_flat(sdf_f, ray_id, valid_f, s_val)
    np.testing.assert_allclose(
        np.asarray(alpha_flat.reshape(N, S)), np.asarray(alpha_dense),
        rtol=1e-5, atol=1e-6,
    )
    w_flat, last_flat = renderops.alpha2weights_flat(
        jnp.where(valid_f, alpha_flat, 0.0), ray_id, step_id, N, S
    )
    np.testing.assert_allclose(
        np.asarray(w_flat.reshape(N, S)), np.asarray(w_dense),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(last_flat), np.asarray(last_dense), rtol=1e-5, atol=1e-6
    )

    # gradients must agree too (transmittance backward = CUDA reverse scan)
    ct = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))

    def loss_dense(s):
        a = renderops.neus_alpha_interp(s, mask, s_val)
        w, last = renderops.alpha2weights(a, mask)
        return (w * ct).sum() + last.sum()

    def loss_flat(s):
        a = renderops.neus_alpha_interp_flat(
            s.reshape(-1), ray_id, valid_f, s_val)
        w, last = renderops.alpha2weights_flat(
            jnp.where(valid_f, a, 0.0), ray_id, step_id, N, S)
        return (w * ct.reshape(-1)).sum() + last.sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_dense)(sdf)),
        np.asarray(jax.grad(loss_flat)(sdf)),
        rtol=1e-4, atol=1e-5,
    )
