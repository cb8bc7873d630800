"""Total-variation regularizers on dense grids.

The reference has two TV mechanisms:
- a Python loss (``app/utils/base/functions.py:34-42``) — masked mean |diff|
  over the three axes — used for the coarse stage losses;
- an *in-place gradient* CUDA op (``total_variation_kernel.cu:13-133``)
  applied after backward in the fine/LTS/PDRA loops (``fine.py:395-401``),
  with clamped diffs /6 and a sparse mode that skips voxels whose grad is 0.

On TPU the in-place-grad op becomes a pure gradient term added to the
parameter gradient inside the jitted train step (:func:`tv_grad`), keeping
the exact clamped-diff /6 semantics including the sparse mask.

Grids here are channel-last ``[X, Y, Z, C]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def total_variation(v: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked mean |first difference| along x, y, z, averaged over axes
    (reference ``functions.py:34-42``). v: [X,Y,Z,C]; mask: [X,Y,Z] bool."""
    tvx = jnp.abs(jnp.diff(v, axis=0))
    tvy = jnp.abs(jnp.diff(v, axis=1))
    tvz = jnp.abs(jnp.diff(v, axis=2))
    if mask is None:
        return (tvx.mean() + tvy.mean() + tvz.mean()) / 3.0
    m = mask
    mx = (m[:-1] & m[1:])[..., None]
    my = (m[:, :-1] & m[:, 1:])[..., None]
    mz = (m[:, :, :-1] & m[:, :, 1:])[..., None]

    def masked_mean(t, mm):
        mm = jnp.broadcast_to(mm, t.shape)
        denom = jnp.maximum(mm.sum(), 1)
        return jnp.where(mm, t, 0.0).sum() / denom

    return (masked_mean(tvx, mx) + masked_mean(tvy, my) + masked_mean(tvz, mz)) / 3.0


def tv_grad(
    grid: jnp.ndarray,
    wx: float,
    wy: float,
    wz: float,
    sparse_grad: jnp.ndarray | None = None,
    nonempty_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Gradient contribution matching ``total_variation_add_grad``
    (``total_variation_kernel.cu:13-133``).

    For each voxel the CUDA kernel accumulates
    ``w/6 * sum_axes(clamp(v - neighbor, -1, 1))`` over the up-to-6
    neighbors, with per-axis weights ``wx, wy, wz`` (already divided by the
    dense voxel count by the caller — see ``fine.py:397-401``).

    - ``sparse_grad``: when given, reproduces ``dense_mode=False`` — voxels
      whose existing gradient is exactly 0 receive no TV gradient.
    - ``nonempty_mask``: reproduces the ``_new`` variant — the diff between
      a voxel pair only contributes if both voxels are nonempty (the kernel
      multiplies each clamped diff by ``mask[me]*mask[neighbor]``).

    Returns the TV gradient (add it to the parameter gradient).
    """

    def clamped_diff(a, b):
        return jnp.clip(a - b, -1.0, 1.0)

    g = jnp.zeros_like(grid)
    if nonempty_mask is not None:
        m = nonempty_mask.astype(grid.dtype)
        if m.ndim == 3:
            m = m[..., None]
    else:
        m = None

    def axis_terms(axis, w):
        d = clamped_diff(
            jax.lax.slice_in_dim(grid, 1, grid.shape[axis], axis=axis),
            jax.lax.slice_in_dim(grid, 0, grid.shape[axis] - 1, axis=axis),
        )
        if m is not None:
            pair = jax.lax.slice_in_dim(m, 1, m.shape[axis], axis=axis) * (
                jax.lax.slice_in_dim(m, 0, m.shape[axis] - 1, axis=axis)
            )
            d = d * pair
        pad_lo = [(0, 0)] * grid.ndim
        pad_hi = [(0, 0)] * grid.ndim
        pad_lo[axis] = (1, 0)
        pad_hi[axis] = (0, 1)
        # voxel i gets +clamp(v_i - v_{i-1}) from its lower neighbor side
        # and -clamp(v_{i+1} - v_i) from its upper neighbor side
        plus = jnp.pad(d, pad_lo)
        minus = jnp.pad(d, pad_hi)
        return (w / 6.0) * (plus - minus)

    g = axis_terms(0, wx) + axis_terms(1, wy) + axis_terms(2, wz)
    if sparse_grad is not None:
        g = jnp.where(sparse_grad == 0, 0.0, g)
    return g
