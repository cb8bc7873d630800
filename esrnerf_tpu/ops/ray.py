"""Dense ray engine.

TPU-native replacement for the reference's ragged CUDA ray sampler
(``app/utils/base/cuda/render_utils_kernel.cu:11-242``). Instead of a
variable-length ``[M, 3]`` point list with ``ray_id`` indirection, rays are
sampled into a dense, statically-shaped ``[N_rays, S, 3]`` grid with a
boolean validity mask — the layout XLA can tile onto the MXU/VPU, and the
same formulation the reference itself uses for its Python DVGO path
(``app/coarse/model/dvgo.py:140-172``).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class RaySamples(NamedTuple):
    """Dense per-ray sample points.

    pts:     [N, S, 3] world-space sample points
    valid:   [N, S]    bool — inside bbox AND within the ray's sample count
    t_min:   [N]       entry distance (clamped to [near, far])
    t_max:   [N]       exit distance
    n_valid: [N]       per-ray number of marched steps (>= 1, CUDA parity)
    """

    pts: jnp.ndarray
    valid: jnp.ndarray
    t_min: jnp.ndarray
    t_max: jnp.ndarray
    n_valid: jnp.ndarray


def ray_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    far: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray bbox entry/exit distances, clamped to [near, far].

    Matches ``infer_t_minmax_cuda_kernel``
    (``render_utils_kernel.cu:11-35``): zero direction components are
    replaced by 1e-6 (not symmetric-signed), and both t's clamp to
    [near, far].
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = jnp.clip(jnp.maximum(rate_a, rate_b).min(-1), near, far)
    return t_min, t_max


def max_samples_along_diag(
    xyz_min, xyz_max, voxel_size: float, stepsize: float
) -> int:
    """Static sample-count cap: enough steps to cross the bbox diagonal.

    Mirrors the reference's ``N_samples`` bound computed from the grid
    diagonal (``dvgo.py:47-50``, ``voxurfc sample_ray`` stepdist), evaluated
    host-side so the resulting shape is static under jit.
    """
    diag = float(np.linalg.norm(np.asarray(xyz_max) - np.asarray(xyz_min)))
    return int(math.ceil(diag / (stepsize * voxel_size))) + 1


def sample_rays_dense(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    far: float,
    stepdist: float,
    n_samples: int,
    t_offset: jnp.ndarray | float = 0.0,
) -> RaySamples:
    """Dense equivalent of ``sample_pts_on_rays_cuda``
    (``render_utils_kernel.cu:196-242``).

    Points march from the bbox entry along the *normalized* direction in
    fixed world-space steps ``stepdist``:
    ``p(s) = (o + d * t_min) + (d/|d|) * stepdist * (s + t_offset)``.
    Per-ray marched count is ``max(ceil((t_max-t_min)*|d|/stepdist), 1)``.
    ``t_offset`` adds stratified jitter (in steps) during training.

    Validity combines step-count and in-bbox tests, matching the CUDA
    ``mask_outbbox`` plus ragged length.
    """
    t_min, t_max = ray_aabb(rays_o, rays_d, xyz_min, xyz_max, near, far)
    rnorm = jnp.linalg.norm(rays_d, axis=-1)
    n_valid = jnp.maximum(jnp.ceil((t_max - t_min) * rnorm / stepdist), 1.0)

    start = rays_o + rays_d * t_min[..., None]  # [N, 3]
    dirn = rays_d / rnorm[..., None]

    steps = jnp.arange(n_samples, dtype=rays_o.dtype)  # [S]
    steps = steps[None, :] + jnp.asarray(t_offset, dtype=rays_o.dtype)
    dist = stepdist * steps  # [N or 1, S]
    pts = start[:, None, :] + dirn[:, None, :] * dist[..., None]  # [N, S, 3]

    in_count = jnp.arange(n_samples)[None, :] < n_valid[:, None]
    in_bbox = jnp.all((pts >= xyz_min) & (pts <= xyz_max), axis=-1)
    return RaySamples(pts, in_count & in_bbox, t_min, t_max, n_valid)


def sample_rays_dvgo(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    near: float,
    far: float,
    stepsize: float,
    voxel_size: jnp.ndarray | float,
    n_samples: int,
    rand_shift: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DVGO-style dense sampling (reference ``dvgo.py:140-172``).

    Unlike :func:`sample_rays_dense` this marches in *un-normalized*
    parameter space: ``interpx = t_min + stepsize*voxel_size*rng / |d|``;
    rays that miss the bbox are entirely masked (``t_max <= t_min``).

    Returns ``(pts [N,S,3], mask_outbbox [N,S])`` with the reference's
    polarity (True = outside / invalid).
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = jnp.clip(jnp.minimum(rate_a, rate_b).max(-1), near, far)
    t_max = jnp.clip(jnp.maximum(rate_a, rate_b).min(-1), near, far)
    mask_miss = t_max <= t_min  # [N]

    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]  # [1, S]
    if rand_shift is not None:
        rng = rng + rand_shift  # [N, S] via broadcast of [N, 1]
    step = stepsize * voxel_size * rng
    rnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    interpx = t_min[..., None] + step / rnorm  # [N, S]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * interpx[..., None]

    out = mask_miss[:, None] | jnp.any((pts < xyz_min) | (pts > xyz_max), axis=-1)
    return pts, out
