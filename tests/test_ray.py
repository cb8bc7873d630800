"""Ray engine parity vs a numpy port of the CUDA sampler
(``render_utils_kernel.cu:11-242``) and the DVGO python sampler
(``dvgo.py:140-172``)."""

import pytest
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.ops import ray as rayops

pytestmark = pytest.mark.quick


def oracle_sample_pts(rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist):
    vec = np.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = np.clip(np.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = np.clip(np.maximum(rate_a, rate_b).min(-1), near, far)
    rnorm = np.linalg.norm(rays_d, axis=-1)
    n_steps = np.maximum(np.ceil((t_max - t_min) * rnorm / stepdist), 1).astype(int)

    pts, valid = [], []
    for i in range(len(rays_o)):
        start = rays_o[i] + rays_d[i] * t_min[i]
        dirn = rays_d[i] / rnorm[i]
        p = start[None] + dirn[None] * (stepdist * np.arange(n_steps[i]))[:, None]
        outb = ((p < xyz_min) | (p > xyz_max)).any(-1)
        pts.append(p)
        valid.append(~outb)
    return pts, valid, t_min, t_max, n_steps


def test_dense_sampling_matches_cuda_oracle():
    rng = np.random.default_rng(0)
    N = 33
    rays_o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    xyz_min = np.array([-1, -1, -1], np.float32)
    xyz_max = np.array([1, 1, 1], np.float32)
    near, far, stepdist = 0.1, 10.0, 0.11

    S = 64
    rs = rayops.sample_rays_dense(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(xyz_min),
        jnp.asarray(xyz_max), near, far, stepdist, S,
    )
    pts_ref, valid_ref, tmin_ref, tmax_ref, nsteps_ref = oracle_sample_pts(
        rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist
    )
    np.testing.assert_allclose(np.asarray(rs.t_min), tmin_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rs.t_max), tmax_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(rs.n_valid).astype(int), nsteps_ref
    )
    for i in range(N):
        n = nsteps_ref[i]
        assert n <= S
        np.testing.assert_allclose(
            np.asarray(rs.pts[i, :n]), pts_ref[i], rtol=1e-4, atol=1e-4
        )
        np.testing.assert_array_equal(np.asarray(rs.valid[i, :n]), valid_ref[i])
        assert not np.asarray(rs.valid[i, n:]).any()


def test_dvgo_sampling_matches_reference_formula():
    rng = np.random.default_rng(1)
    N, S = 17, 48
    rays_o = rng.uniform(-3, 3, (N, 3)).astype(np.float32)
    rays_d = rng.normal(size=(N, 3)).astype(np.float32)
    xyz_min = np.array([-1, -1, -1], np.float32)
    xyz_max = np.array([1, 1, 1], np.float32)
    near, far = 0.2, 8.0
    stepsize, voxel_size = 0.5, 0.03

    pts, outb = rayops.sample_rays_dvgo(
        jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(xyz_min),
        jnp.asarray(xyz_max), near, far, stepsize, voxel_size, S,
    )

    vec = np.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = np.clip(np.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = np.clip(np.maximum(rate_a, rate_b).min(-1), near, far)
    rngS = np.arange(S, dtype=np.float32)[None]
    step = stepsize * voxel_size * rngS
    interpx = t_min[:, None] + step / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts_ref = rays_o[:, None] + rays_d[:, None] * interpx[..., None]
    out_ref = (t_max <= t_min)[:, None] | (
        (pts_ref < xyz_min) | (pts_ref > xyz_max)
    ).any(-1)

    np.testing.assert_allclose(np.asarray(pts), pts_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outb), out_ref)
