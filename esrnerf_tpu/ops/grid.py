"""Dense voxel-grid sampling and resizing.

TPU-native replacement for the reference's ``F.grid_sample`` 5-D trilinear
path (reference: ``app/utils/base/module.py:24-35``, ``dvgo.py:265-277``) and
the hand-written gather-based differentiable sampler
(``app/utils/base/functions.py:142-309``) — in JAX a single implementation
serves both, since autodiff w.r.t. sample *coordinates* is free.

Grids are stored channel-last ``[X, Y, Z, C]`` (the reference uses
``[1, C, X, Y, Z]``): channel-last keeps the per-voxel features contiguous
for the vectorized corner gathers and matches XLA's preferred layouts.

All sampling uses ``align_corners=True`` semantics: a point at ``xyz_min``
maps to index 0 and ``xyz_max`` to index ``dim-1``. ``mode='zeros'``
reproduces torch's default zero padding (out-of-range corner taps contribute
0); ``mode='border'`` clamps.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalized_index(
    xyz: jnp.ndarray, xyz_min: jnp.ndarray, xyz_max: jnp.ndarray, size: Sequence[int]
) -> jnp.ndarray:
    """Map world coordinates to (fractional) voxel indices, align_corners=True."""
    sz = jnp.asarray(size, dtype=xyz.dtype)
    t = (xyz - xyz_min) / (xyz_max - xyz_min)
    return t * (sz - 1.0)


def grid_sample_3d(
    grid: jnp.ndarray,
    xyz: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample of a ``[X, Y, Z, C]`` grid at world points ``[..., 3]``.

    Returns ``[..., C]`` (no channel squeeze — callers squeeze for C==1).
    Differentiable w.r.t. both ``grid`` and ``xyz``.
    """
    assert grid.ndim == 4, f"grid must be [X,Y,Z,C], got {grid.shape}"
    X, Y, Z, C = grid.shape
    lead_shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)

    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))  # [M, 3]
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1

    size = jnp.array([X, Y, Z], dtype=jnp.int32)
    if mode == "zeros":
        v0 = (i0 >= 0) & (i0 < size)
        v1 = (i1 >= 0) & (i1 < size)
    elif mode == "border":
        ones = jnp.ones_like(i0, dtype=bool)
        v0 = v1 = ones
    else:
        raise ValueError(f"unknown padding mode '{mode}'")

    c0 = jnp.clip(i0, 0, size - 1)
    c1 = jnp.clip(i1, 0, size - 1)

    flat = grid.reshape(-1, C)
    yz = Y * Z

    def tap(ix, iy, iz, vx, vy, vz, w):
        lin = ix * yz + iy * Z + iz
        vals = jnp.take(flat, lin, axis=0)  # [M, C]
        wgt = w * (vx & vy & vz).astype(grid.dtype)
        return vals * wgt[:, None]

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    gx0, gx1 = (1 - fx), fx
    gy0, gy1 = (1 - fy), fy
    gz0, gz1 = (1 - fz), fz

    out = (
        tap(c0[:, 0], c0[:, 1], c0[:, 2], v0[:, 0], v0[:, 1], v0[:, 2], gx0 * gy0 * gz0)
        + tap(c0[:, 0], c0[:, 1], c1[:, 2], v0[:, 0], v0[:, 1], v1[:, 2], gx0 * gy0 * gz1)
        + tap(c0[:, 0], c1[:, 1], c0[:, 2], v0[:, 0], v1[:, 1], v0[:, 2], gx0 * gy1 * gz0)
        + tap(c0[:, 0], c1[:, 1], c1[:, 2], v0[:, 0], v1[:, 1], v1[:, 2], gx0 * gy1 * gz1)
        + tap(c1[:, 0], c0[:, 1], c0[:, 2], v1[:, 0], v0[:, 1], v0[:, 2], gx1 * gy0 * gz0)
        + tap(c1[:, 0], c0[:, 1], c1[:, 2], v1[:, 0], v0[:, 1], v1[:, 2], gx1 * gy0 * gz1)
        + tap(c1[:, 0], c1[:, 1], c0[:, 2], v1[:, 0], v1[:, 1], v0[:, 2], gx1 * gy1 * gz0)
        + tap(c1[:, 0], c1[:, 1], c1[:, 2], v1[:, 0], v1[:, 1], v1[:, 2], gx1 * gy1 * gz1)
    )
    return out.reshape(*lead_shape, C)


def resize_trilinear(grid: jnp.ndarray, new_size: Tuple[int, int, int]) -> jnp.ndarray:
    """Trilinear-resize a ``[X, Y, Z, C]`` grid (align_corners=True).

    Replacement for the reference's progressive ``scale_volume_grid``
    (``app/utils/base/module.py:37-49``, ``F.interpolate`` trilinear).
    """
    X, Y, Z, C = grid.shape
    nx, ny, nz = new_size

    def axis_coords(n_old: int, n_new: int) -> jnp.ndarray:
        if n_new == 1:
            return jnp.zeros((1,), dtype=grid.dtype)
        return jnp.linspace(0.0, float(n_old - 1), n_new, dtype=grid.dtype)

    gx = axis_coords(X, nx)
    gy = axis_coords(Y, ny)
    gz = axis_coords(Z, nz)
    xx, yy, zz = jnp.meshgrid(gx, gy, gz, indexing="ij")
    pts = jnp.stack([xx, yy, zz], axis=-1)  # index-space coords

    zero = jnp.zeros((3,), dtype=grid.dtype)
    top = jnp.array([X - 1, Y - 1, Z - 1], dtype=grid.dtype)
    out = grid_sample_3d(grid, pts, zero, top, mode="border")
    return out.reshape(nx, ny, nz, C)


def make_gaussian_kernel_3d(ksize: int = 3, sigma: float = 1.0) -> np.ndarray:
    """Normalized 3-D Gaussian kernel (reference: ``module.py:146-177``)."""
    r = np.arange(-(ksize // 2), ksize // 2 + 1, 1)
    xx, yy, zz = np.meshgrid(r, r, r)
    k = np.exp(-(xx**2 + yy**2 + zz**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def make_gradient_smooth_kernel_3d(sigma: float = 0.0) -> np.ndarray:
    """3x3x3 binomial smoothing kernel used for smooth-gradient TV
    (reference: ``module.py:180-208``)."""
    kernel = np.asarray(
        [
            [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
            [[2, 4, 2], [4, 8, 4], [2, 4, 2]],
            [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
        ],
        dtype=np.float64,
    )
    dist = np.zeros((3, 3, 3))
    for i in range(3):
        for j in range(3):
            for k in range(3):
                dist[i, j, k] = (i - 1) ** 2 + (j - 1) ** 2 + (k - 1) ** 2 - 1
    k0 = kernel * np.exp(-dist * sigma)
    return (k0 / k0.sum()).astype(np.float32)


def conv3d_replicate(grid: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 3-D convolution with replicate padding on a ``[X,Y,Z,C]``
    grid; each channel convolved with the same ``[k,k,k]`` kernel."""
    k = kernel.shape[0]
    p = k // 2
    x = jnp.pad(grid, ((p, p), (p, p), (p, p), (0, 0)), mode="edge")
    C = grid.shape[-1]
    # lhs [N=1, X, Y, Z, C]; rhs [k,k,k, in=1, out=C] with feature_group_count=C
    lhs = x[None]
    rhs = jnp.broadcast_to(kernel[..., None, None], (k, k, k, 1, C)).astype(grid.dtype)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NXYZC", "XYZIO", "NXYZC"),
        feature_group_count=C,
        # full fp32: these convs smooth the SDF geometry, where bf16 default
        # precision visibly shifts the zero level set
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


@functools.partial(jax.jit, static_argnames=("ks",))
def max_pool_3d_same(grid: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Stride-1 3-D max-pool with padding ks//2 over ``[X,Y,Z,C]``
    (reference MaskCache construction, ``module.py:95-100``)."""
    p = ks // 2
    return jax.lax.reduce_window(
        grid,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(ks, ks, ks, 1),
        window_strides=(1, 1, 1, 1),
        padding=((p, p), (p, p), (p, p), (0, 0)),
    )
