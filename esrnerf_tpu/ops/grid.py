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


def grid_sample_3d_impl(
    grid: jnp.ndarray,
    xyz: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample of a ``[X, Y, Z, C]`` grid at world points ``[..., 3]``.

    Pure-jnp reference implementation (native autodiff); used as the test
    oracle and by :func:`grid_sample_3d`'s forward. Production code calls
    :func:`grid_sample_3d`, whose custom backward avoids XLA-TPU's slow
    multi-channel scatter lowering.
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


def _corner_lins_weights(grid_shape, xyz, xyz_min, xyz_max, mode):
    """Shared corner index/weight math: ([M,8] linear idx, [M,8] weights)."""
    X, Y, Z, C = grid_shape
    pts = xyz.reshape(-1, 3)
    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    size = jnp.array([X, Y, Z], dtype=jnp.int32)
    if mode == "zeros":
        v0 = (i0 >= 0) & (i0 < size)
        v1 = (i1 >= 0) & (i1 < size)
    else:
        v0 = v1 = jnp.ones_like(i0, dtype=bool)
    c0 = jnp.clip(i0, 0, size - 1)
    c1 = jnp.clip(i1, 0, size - 1)
    yz = Y * Z
    lins, wts = [], []
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    for d in range(8):
        dx, dy, dz = (d >> 2) & 1, (d >> 1) & 1, d & 1
        ix = c1[:, 0] if dx else c0[:, 0]
        iy = c1[:, 1] if dy else c0[:, 1]
        iz = c1[:, 2] if dz else c0[:, 2]
        ok = ((v1 if dx else v0)[:, 0] & (v1 if dy else v0)[:, 1]
              & (v1 if dz else v0)[:, 2])
        w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
             * (fz if dz else 1 - fz)) * ok
        lins.append(ix * yz + iy * Z + iz)
        wts.append(w)
    return jnp.stack(lins, -1), jnp.stack(wts, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def grid_sample_3d(grid, xyz, xyz_min, xyz_max, mode="zeros"):
    """Production trilinear sampler — same semantics as
    :func:`grid_sample_3d_impl`, but restructured for TPU gather/scatter
    characteristics (row-count-bound gathers, table-sweep-bound scatters):

    - narrow grids (C<=2) sample through a **corner-packed table** — all 8
      corner values of a cell packed into one row by cheap shifted slices,
      so the forward is ONE [M, 8C]-row gather instead of 4-8;
    - wide grids use z-pair-packed rows (4 gathers of width 2C);
    - the grid-gradient is the sorted-stream Pallas splat (ops.splat).

    NOT differentiable w.r.t. ``xyz`` (zero cotangent) — all call sites
    sample at ray-geometry points that carry no parameter gradient; use
    :func:`grid_sample_3d_coordgrad` where the spatial gradient is needed.
    """
    C = grid.shape[-1]
    if mode == "zeros" and C <= 2:
        # corner packing pays when gathered rows >> table rows (the table
        # rebuild is 8C columns wide); wide color grids stay on the z-pair
        # path
        return _grid_sample_3d_packed(grid, xyz, xyz_min, xyz_max, 8)
    return _grid_sample_3d_pairs(grid, xyz, xyz_min, xyz_max, mode)


def corner_offsets_dmajor(Y: int, Z: int):
    """Corner linear offsets in d = dx*4+dy*2+dz order."""
    return [(d >> 2 & 1) * Y * Z + (d >> 1 & 1) * Z + (d & 1)
            for d in range(8)]


def corner_pack(grid: jnp.ndarray, pad: int, fold: int = 8) -> jnp.ndarray:
    """[X,Y,Z,C] -> [X*Y*Z + 2*pad, fold*C] table: row ``base + pad`` holds
    the first ``fold`` corner values (d-major) of the cell at linear index
    ``base``, built from shifted slices of the flat grid (differentiable;
    the adjoint is a few shifted adds). With fold=4 the table covers the
    (dy,dz) corners; the dx=1 corners are the same table read at
    ``base + Y*Z``. ``pad`` zero rows on both sides let callers clip
    slightly out-of-range bases safely."""
    X, Y, Z, C = grid.shape
    n = X * Y * Z
    flat = grid.reshape(n, C)
    offs = corner_offsets_dmajor(Y, Z)[:fold]
    top = max(corner_offsets_dmajor(Y, Z))
    padded = jnp.pad(flat, ((pad, pad + top), (0, 0)))
    # row r (= base + pad) corner-d value = flat[r - pad + offs[d]]
    cols = [padded[o:o + n + 2 * pad] for o in offs]
    return jnp.concatenate(cols, axis=1)  # [n + 2*pad, fold*C]


def _packed_base_weights(grid_shape, xyz, xyz_min, xyz_max):
    X, Y, Z, C = grid_shape
    pts = xyz.reshape(-1, 3)
    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx).astype(jnp.int32)
    base = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]
    size = jnp.array([X, Y, Z], jnp.int32)
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i0 + 1 >= 0) & (i0 + 1 < size)
    frac = idx - i0
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    w = []
    for d in range(8):
        dx, dy, dz = d >> 2 & 1, d >> 1 & 1, d & 1
        ok = ((v1 if dx else v0)[:, 0] & (v1 if dy else v0)[:, 1]
              & (v1 if dz else v0)[:, 2])
        w.append(
            (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            * (fz if dz else 1 - fz) * ok
        )
    return base, jnp.stack(w, 1)  # [M], [M, 8]


def _grid_sample_3d_packed(grid, xyz, xyz_min, xyz_max, fold=8):
    """Zeros-mode trilinear sample via the corner-packed table: ``8/fold``
    wide row gathers per point. The table build is shifted slices (XLA CSE
    shares it across every sample of the same grid in a step)."""
    X, Y, Z, C = grid.shape
    n = X * Y * Z
    pad = Y * Z + Z + 2
    table = corner_pack(grid, pad, fold)
    base, wts = _packed_base_weights(grid.shape, xyz, xyz_min, xyz_max)
    out = 0.0
    for s in range(8 // fold):
        b = base + (s * fold >> 2 & 1) * Y * Z + pad
        rows = jnp.take(table, jnp.clip(b, 0, n + 2 * pad - 1), axis=0)
        out = out + jnp.einsum(
            "md,mdc->mc", wts[:, s * fold:(s + 1) * fold],
            rows.reshape(-1, fold, C),
        )
    return out.reshape(*xyz.shape[:-1], C)


def _grid_sample_3d_pairs(grid, xyz, xyz_min, xyz_max, mode):
    """Forward via a z-pair-packed row table: 4 row-gathers of width 2C per
    point instead of 8 of width C (TPU gathers are row-count-bound)."""
    X, Y, Z, C = grid.shape
    lead_shape = xyz.shape[:-1]
    pts = xyz.reshape(-1, 3)
    M = pts.shape[0]

    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    size = jnp.array([X, Y, Z], dtype=jnp.int32)
    if mode == "zeros":
        v0 = (i0 >= 0) & (i0 < size)
        v1 = (i1 >= 0) & (i1 < size)
    else:
        v0 = v1 = jnp.ones_like(i0, dtype=bool)
    c0 = jnp.clip(i0, 0, size - 1)
    c1 = jnp.clip(i1, 0, size - 1)

    # pair table P[x,y,z] = (g[...,z], g[...,z+1 clamped]) -> [XYZ, 2C]
    gz1 = jnp.concatenate([grid[:, :, 1:], grid[:, :, -1:]], axis=2)
    pair = jnp.concatenate([grid, gz1], axis=-1).reshape(-1, 2 * C)

    # z-pair row start + within-row slots for the two z corners
    r = jnp.clip(i0[:, 2], 0, Z - 2)
    o0 = jnp.clip(c0[:, 2] - r, 0, 1)  # slot of corner z0
    o1 = jnp.clip(c1[:, 2] - r, 0, 1)  # slot of corner z1

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    wz0 = (1 - fz) * (v0[:, 2]).astype(grid.dtype)
    wz1 = fz * (v1[:, 2]).astype(grid.dtype)

    out = jnp.zeros((M, C), grid.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            ix = c1[:, 0] if dx else c0[:, 0]
            iy = c1[:, 1] if dy else c0[:, 1]
            okxy = ((v1 if dx else v0)[:, 0]
                    & (v1 if dy else v0)[:, 1]).astype(grid.dtype)
            wxy = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)) * okxy
            row = jnp.take(pair, (ix * Y + iy) * Z + r, axis=0)  # [M, 2C]
            lo, hi = row[:, :C], row[:, C:]
            vz0 = jnp.where((o0 == 0)[:, None], lo, hi)
            vz1 = jnp.where((o1 == 0)[:, None], lo, hi)
            out = out + wxy[:, None] * (wz0[:, None] * vz0 + wz1[:, None] * vz1)
    return out.reshape(*lead_shape, C)


def _grid_sample_3d_fwd(grid, xyz, xyz_min, xyz_max, mode):
    C = grid.shape[-1]
    if mode == "zeros" and C <= 2:
        out = _grid_sample_3d_packed(grid, xyz, xyz_min, xyz_max, 8)
    else:
        out = _grid_sample_3d_pairs(grid, xyz, xyz_min, xyz_max, mode)
    return out, (grid.shape, xyz, xyz_min, xyz_max)


def _grid_sample_3d_bwd(mode, res, ct):
    grid_shape, xyz, xyz_min, xyz_max = res
    X, Y, Z, C = grid_shape
    if mode == "zeros":
        # sorted-stream Pallas splat (ops.splat): sorts the points by base
        # cell once (XLA CSE dedupes the sort across every grid sampled at
        # the same points in a step) and applies the corner streams with
        # one-hot MXU matmuls — ~5-10x faster than XLA's table-sweep
        # scatter lowering on v5e
        from esrnerf_tpu.ops import splat as splatops

        dgrid = splatops.trilinear_splat(
            grid_shape, xyz.reshape(-1, 3), ct.reshape(-1, C),
            xyz_min, xyz_max,
        )
        return (dgrid, jnp.zeros_like(xyz), jnp.zeros_like(xyz_min),
                jnp.zeros_like(xyz_max))
    lins, wts = _corner_lins_weights(grid_shape, xyz, xyz_min, xyz_max, mode)
    ctf = ct.reshape(-1, C)
    # [M, 8, C] contributions -> flat scalar scatter into [X*Y*Z*C]
    contrib = wts[:, :, None] * ctf[:, None, :]
    flat_idx = lins[:, :, None] * C + jnp.arange(C, dtype=jnp.int32)
    dflat = jnp.zeros(X * Y * Z * C, ct.dtype).at[flat_idx.reshape(-1)].add(
        contrib.reshape(-1)
    )
    return (dflat.reshape(X, Y, Z, C), jnp.zeros_like(xyz),
            jnp.zeros_like(xyz_min), jnp.zeros_like(xyz_max))


grid_sample_3d.defvjp(_grid_sample_3d_fwd, _grid_sample_3d_bwd)


def grid_sample_3d_coordgrad(
    grid: jnp.ndarray,
    xyz: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear sample of a ``[X,Y,Z,1]`` grid plus the closed-form spatial
    gradient of the interpolant at each point.

    Replaces autograd-through-sample-coordinates (the reference needs a
    hand-written differentiable grid sample for this,
    ``app/utils/base/functions.py:142-309`` / ``esrnerf.py:1572-1596``).
    Both outputs stay differentiable w.r.t. ``grid`` (through the corner
    gathers) and w.r.t. ``xyz``. Returns ``(val [M], dval_dxyz [M,3])``.
    """
    X, Y, Z, C = grid.shape
    assert C == 1
    pts = xyz.reshape(-1, 3)
    size = jnp.array([X, Y, Z], jnp.int32)
    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = idx - i0
    i1 = i0 + 1
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i1 >= 0) & (i1 < size)
    c0 = jnp.clip(i0, 0, size - 1)
    c1 = jnp.clip(i1, 0, size - 1)
    flat = grid.reshape(-1)
    yz = Y * Z

    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    val = jnp.zeros(pts.shape[0], grid.dtype)
    grad = jnp.zeros((pts.shape[0], 3), grid.dtype)
    for d in range(8):
        dx, dy, dz = (d >> 2) & 1, (d >> 1) & 1, d & 1
        ix = c1[:, 0] if dx else c0[:, 0]
        iy = c1[:, 1] if dy else c0[:, 1]
        iz = c1[:, 2] if dz else c0[:, 2]
        ok = ((v1 if dx else v0)[:, 0] & (v1 if dy else v0)[:, 1]
              & (v1 if dz else v0)[:, 2]).astype(grid.dtype)
        v = jnp.take(flat, ix * yz + iy * Z + iz) * ok
        wx = fx if dx else 1 - fx
        wy = fy if dy else 1 - fy
        wz = fz if dz else 1 - fz
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        val = val + v * wx * wy * wz
        grad = grad + v[:, None] * jnp.stack(
            [sx * wy * wz, wx * sy * wz, wx * wy * sz], -1
        )
    scale = (size.astype(grid.dtype) - 1.0) / (xyz_max - xyz_min)
    grad = grad * scale[None, :]
    lead = xyz.shape[:-1]
    return val.reshape(lead), grad.reshape(*lead, 3)


# ---------------------------------------------------------------------------
# Displaced multi-tap SDF sampler (window-packed).
#
# The fine/LTS feature path samples the SDF at 6 axis offsets x D
# displacements per point (reference ``voxurff.py:678-721``) — 24 trilinear
# taps = 192 scalar gathers per point. TPU gathers are row-count-bound
# (~125M rows/s regardless of row width up to ~8 floats, measured on v5e),
# so the taps are restructured: per axis, all displaced samples of a point
# live in one W-wide contiguous window of that axis; packing the grid into
# stride-1 window rows turns the 192 scalar gathers into 12 W-wide row
# gathers. The backward accumulates per-window-slot cotangents in registers
# first, then does width-1 scatter-adds (the only fast scatter shape).
# ---------------------------------------------------------------------------


def _axis_perm(axis: int) -> Tuple[int, int, int]:
    """(b, c, a): grid-axis order with the windowed axis minor."""
    others = [ax for ax in (0, 1, 2) if ax != axis]
    return others[0], others[1], axis


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def displaced_taps(grid, pts, xyz_min, xyz_max, displace, n_valid=None):
    """Border-mode trilinear taps at ``pts +- d * voxel`` along each axis.

    grid: [X,Y,Z,1]; pts: [M,3] world coords; displace: static tuple of D
    voxel displacements. Returns [M, 6, D] in the reference offset order
    (-z, +z, -y, +y, -x, +x) (``voxurf_base.sample_sdfeat_grad_normal``).
    Rows >= ``n_valid`` (march pad tail) may return zeros (chunk skip).

    NOTE: not differentiable w.r.t. ``pts`` (cotangent is zero) — every call
    site passes ray-geometry points that carry no parameter gradient.
    """
    vals, _ = _displaced_taps_fwd_impl(grid, pts, xyz_min, xyz_max, displace,
                                       n_valid)
    return vals


def _window_geometry(grid_shape, pts, xyz_min, xyz_max, displace):
    """Shared index math for fwd and bwd (no gathers)."""
    X, Y, Z = grid_shape
    size_i = np.array([X, Y, Z], np.int32)
    dd = np.asarray(displace, np.float32)
    maxd = int(np.ceil(float(dd.max())))

    sizef = jnp.asarray([X, Y, Z], jnp.float32)
    ind = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))  # [M,3]
    ind_c = jnp.clip(ind, 0.0, sizef - 1.0)

    per_axis = []
    for axis in range(3):
        b, c, a = _axis_perm(axis)
        Sa, Sb, Sc = int(size_i[a]), int(size_i[b]), int(size_i[c])
        W = min(2 * maxd + 2, Sa)
        ub, uc = ind_c[:, b], ind_c[:, c]
        i0b = jnp.clip(jnp.floor(ub).astype(jnp.int32), 0, Sb - 2)
        i0c = jnp.clip(jnp.floor(uc).astype(jnp.int32), 0, Sc - 2)
        fb = ub - i0b
        fc = uc - i0c

        f0 = jnp.floor(ind_c[:, a]).astype(jnp.int32)
        w0 = jnp.clip(f0 - maxd, 0, Sa - W)

        # displaced coords along the axis: [-d, +d] per displacement
        qm = jnp.clip(ind[:, a, None] - dd[None, :], 0.0, Sa - 1.0)  # [M,D]
        qp = jnp.clip(ind[:, a, None] + dd[None, :], 0.0, Sa - 1.0)
        q = jnp.stack([qm, qp], axis=1)  # [M, 2, D] (-,+)
        i0q = jnp.clip(jnp.floor(q).astype(jnp.int32), 0, Sa - 2)
        fq = q - i0q
        rel = i0q - w0[:, None, None]  # in [0, W-2]

        per_axis.append(
            dict(axis=axis, a=a, b=b, c=c, Sa=Sa, Sb=Sb, Sc=Sc,
                 i0b=i0b, i0c=i0c, fb=fb, fc=fc, w0=w0, rel=rel, fq=fq,
                 q=q, W=W)
        )
    return per_axis


def _pack_axis_table(grid3, axis: int, W: int) -> Tuple[jnp.ndarray, int]:
    """[X,Y,Z] -> stride-1 window-row table [(B*C*(Sa-W+1)), W]."""
    b, c, a = _axis_perm(axis)
    gt = jnp.transpose(grid3, (b, c, a))
    Sa = gt.shape[-1]
    n_starts = Sa - W + 1
    tbl = jnp.stack([gt[..., j:j + n_starts] for j in range(W)], axis=-1)
    return tbl.reshape(-1, W), n_starts


def _displaced_taps_fwd_impl(grid, pts, xyz_min, xyz_max, displace,
                             n_valid=None):
    X, Y, Z, C = grid.shape
    assert C == 1
    grid3 = grid[..., 0]
    per_axis = _window_geometry((X, Y, Z), pts, xyz_min, xyz_max, displace)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        from esrnerf_tpu.ops import splat as splatops

        flat = grid.reshape(-1, 1)
        strides = (Y * Z, Z, 1)

    # offset order: (-z, +z, -y, +y, -x, +x) => axis order z, y, x
    out = []
    for g in (per_axis[2], per_axis[1], per_axis[0]):
        W = g["W"]
        # window-slot selection weights for all 2*D taps: [M, 2, D, W]
        j = jnp.arange(W)
        wj = ((j == g["rel"][..., None]) * (1.0 - g["fq"][..., None])
              + (j == (g["rel"][..., None] + 1)) * g["fq"][..., None])
        wcol4 = jnp.stack(
            [jnp.where(db, g["fb"], 1 - g["fb"])
             * jnp.where(dc, g["fc"], 1 - g["fc"])
             for db in (0, 1) for dc in (0, 1)], -1,
        )  # [M, 4]
        if on_tpu:
            # raw multi-offset gather on the untransposed grid: the march's
            # cell-local point order bounds each chunk's read window, so no
            # per-axis table rebuild or re-sort is needed
            sa, sb, sc = (strides[g["a"]], strides[g["b"]],
                          strides[g["c"]])
            base = g["i0b"] * sb + g["i0c"] * sc + g["w0"] * sa
            offs = tuple(db * sb + dc * sc + jj * sa
                         for db in (0, 1) for dc in (0, 1)
                         for jj in range(W))
            raw = splatops.sorted_corner_gather(
                flat, base, None, offs, raw=True, n_valid=n_valid,
                family=(sa, W),
            ).reshape(-1, 4, W)
            win = jnp.einsum("mkw,mk->mw", raw, wcol4)  # [M, W]
        else:
            tbl, n_starts = _pack_axis_table(grid3, g["axis"], W)
            win4 = []
            for k, (db, dc) in enumerate(
                ((0, 0), (0, 1), (1, 0), (1, 1))
            ):
                row = ((g["i0b"] + db) * g["Sc"]
                       + (g["i0c"] + dc)) * n_starts + g["w0"]
                win4.append(jnp.take(tbl, row, axis=0))  # [M, W]
            win = jnp.einsum(
                "kmw,mk->mw", jnp.stack(win4, 0), wcol4
            )
        acc = jnp.einsum("mw,msdw->msd", win, wj)
        out.append(acc)  # [M, 2, D]
    vals = jnp.concatenate(out, axis=1)  # [M, 6, D] z-,z+,y-,y+,x-,x+
    return vals, None


def _displaced_taps_fwd(grid, pts, xyz_min, xyz_max, displace, n_valid=None):
    vals, _ = _displaced_taps_fwd_impl(grid, pts, xyz_min, xyz_max, displace,
                                       n_valid)
    return vals, (grid.shape, pts, xyz_min, xyz_max, n_valid)


def _displaced_taps_bwd(displace, res, ct):
    """ct: [M, 6, D] -> sorted-stream Pallas splat (ops.splat): per axis the
    window taps become 2 sorted corner streams x (corner x slot) channels,
    un-folded by a dense shear pass."""
    grid_shape, pts, xyz_min, xyz_max, n_valid = res
    from esrnerf_tpu.ops import splat as splatops

    dgrid = splatops.displaced_taps_splat(
        grid_shape, pts, ct, xyz_min, xyz_max, displace, n_valid=n_valid
    )
    return (dgrid, jnp.zeros_like(pts), jnp.zeros_like(xyz_min),
            jnp.zeros_like(xyz_max),
            None if n_valid is None else jnp.zeros_like(n_valid))


displaced_taps.defvjp(_displaced_taps_fwd, _displaced_taps_bwd)


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


def _separate_kernel_3d(kernel: np.ndarray):
    """Best rank-1 factorization k3 ~= kx (x) ky (x) kz via two SVDs;
    returns (kx, ky, kz) or None when the kernel isn't separable."""
    k = kernel.shape[0]
    u, s, vt = np.linalg.svd(kernel.reshape(k, k * k), full_matrices=False)
    kx = u[:, 0] * s[0]
    u2, s2, vt2 = np.linalg.svd(vt[0].reshape(k, k), full_matrices=False)
    ky = u2[:, 0] * s2[0]
    kz = vt2[0]
    approx = kx[:, None, None] * ky[None, :, None] * kz[None, None, :]
    if not np.allclose(approx, kernel, rtol=1e-5, atol=1e-7 * np.abs(kernel).max()):
        return None
    # fold signs so the dominant weights are positive (cosmetic)
    if kx.sum() < 0:
        kx, ky = -kx, -ky
    if kz.sum() < 0:
        kz, ky = -kz, -ky
    return kx, ky, kz


def _conv_axis_replicate(grid: jnp.ndarray, k1d: np.ndarray,
                         axis: int) -> jnp.ndarray:
    """1-D correlation along ``axis`` with replicate padding via shifted
    adds: k scaled slices of the padded grid — pure VPU adds at HBM
    bandwidth, no conv op."""
    k = len(k1d)
    p = k // 2
    pads = [(0, 0)] * grid.ndim
    pads[axis] = (p, p)
    xp = jnp.pad(grid, pads, mode="edge")
    n = grid.shape[axis]
    out = None
    for d in range(k):
        term = jnp.float32(k1d[d]) * jax.lax.slice_in_dim(xp, d, d + n,
                                                          axis=axis)
        out = term if out is None else out + term
    return out


def conv3d_replicate(grid: jnp.ndarray, kernel) -> jnp.ndarray:
    """Depthwise 3-D convolution with replicate padding on a ``[X,Y,Z,C]``
    grid; each channel convolved with the same ``[k,k,k]`` kernel.

    Never lowers to ``conv_general_dilated``: XLA pads the NXYZC conv's
    operands to MXU tiles, a 21x memory expansion at 256^3 (two ~4.2 GB
    temps — the allocation that OOM'd the LTS step at 16.7M voxels). The
    smoothing kernels here (Gaussian, binomial) are separable, so the conv
    becomes 3 axis passes of k shifted adds each; non-separable kernels
    fall back to a k^3 shifted-add stencil. Both are bandwidth-bound VPU
    work in full fp32 (bf16 would visibly shift the SDF zero level set).

    ``kernel`` must be a compile-time constant (numpy or concrete array).
    """
    kern = np.asarray(kernel, np.float32)
    k = kern.shape[0]
    sep = _separate_kernel_3d(kern)
    if sep is not None:
        out = grid
        for axis, k1 in enumerate(sep):
            out = _conv_axis_replicate(out, k1, axis)
        return out
    p = k // 2
    xp = jnp.pad(grid, ((p, p), (p, p), (p, p), (0, 0)), mode="edge")
    X, Y, Z = grid.shape[:3]
    out = None
    for i in range(k):
        for j in range(k):
            for l in range(k):
                w = float(kern[i, j, l])
                if w == 0.0:
                    continue
                term = jnp.float32(w) * xp[i:i + X, j:j + Y, l:l + Z]
                out = term if out is None else out + term
    return out


@functools.partial(jax.jit, static_argnames=("ks",))
def max_pool_3d_same(grid: jnp.ndarray, ks: int) -> jnp.ndarray:
    """Stride-1 3-D max-pool with padding ks//2 over ``[X,Y,Z,C]``
    (reference MaskCache construction, ``module.py:95-100``).

    Separable: max over a cubic window == three sequential 1-D max pools
    (max is associative/commutative), turning the O(ks^3)-per-voxel cubic
    ``reduce_window`` into 3 O(ks) passes — the cubic form at the
    block-dilation radii of coarse grids (ks up to ~17) measured ~3.5 s
    per march on XLA:CPU and dominates dryrun/test wall-time; the
    separable form is also strictly less work for the TPU vector unit.
    """
    p = ks // 2
    out = grid
    for axis in range(3):
        win = [1, 1, 1, 1]
        pad = [(0, 0)] * 4
        win[axis] = ks
        pad[axis] = (p, p)
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max,
            window_dimensions=tuple(win),
            window_strides=(1, 1, 1, 1),
            padding=tuple(pad),
        )
    return out
