"""DVGO coarse density-grid renderer (alphamask stage).

Functional JAX re-design of the reference model
(``app/coarse/model/dvgo.py:10-288``): the class holds only *static*
geometry (bbox, resolutions, sample counts); parameters are a plain dict
``{"density": [X,Y,Z,1], "off_color": [X,Y,Z,3], "emo_color": [X,Y,Z,3]}``
and every forward is a pure function, so a single jitted train step covers
sampling -> trilinear gathers -> post-activated alpha -> cumprod
transmittance -> ray marching.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.ops import grid as gridops
from esrnerf_tpu.ops import ray as rayops
from esrnerf_tpu.ops import render as renderops

Params = Dict[str, jnp.ndarray]


class DVGO:
    def __init__(self, cfg, near: float, far: float, xyz_min, xyz_max):
        self.cfg = cfg
        self.near = float(near)
        self.far = float(far)
        self.xyz_min = np.asarray(xyz_min, np.float32)
        self.xyz_max = np.asarray(xyz_max, np.float32)

        mcfg = cfg.app.model
        self.num_voxels = int(mcfg["num_voxels"])
        self.alpha_init = float(mcfg["alpha_init"])
        self.stepsize = float(mcfg["stepsize"])

        self._set_grid_resolution(self.num_voxels)

        # density bias shift s.t. zero-init density gives alpha_init
        # (reference dvgo.py:37)
        self.act_shift = float(np.log(1 / (1 - self.alpha_init) - 1))

        # static max samples per ray (reference dvgo.py:47-50)
        self.n_samples = (
            int(np.linalg.norm(np.asarray(self.world_size) + 1) / self.stepsize) + 1
        )

    def _set_grid_resolution(self, num_voxels: int) -> None:
        extent = self.xyz_max - self.xyz_min
        self.voxel_size = float((extent.prod() / num_voxels) ** (1 / 3))
        self.world_size = tuple(
            int(x) for x in (extent / self.voxel_size).astype(np.int64)
        )

    # ------------------------------------------------------------------ init

    def init_params(self) -> Params:
        X, Y, Z = self.world_size
        return {
            "density": jnp.zeros((X, Y, Z, 1), jnp.float32),
            "off_color": jnp.zeros((X, Y, Z, 3), jnp.float32),
            "emo_color": jnp.zeros((X, Y, Z, 3), jnp.float32),
        }

    def grid_xyz(self) -> jnp.ndarray:
        """World coordinates of every voxel center, [X,Y,Z,3]."""
        X, Y, Z = self.world_size
        xs = jnp.linspace(self.xyz_min[0], self.xyz_max[0], X)
        ys = jnp.linspace(self.xyz_min[1], self.xyz_max[1], Y)
        zs = jnp.linspace(self.xyz_min[2], self.xyz_max[2], Z)
        return jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)

    def maskout_near_cam_vox(self, params: Params, cam_o: jnp.ndarray) -> Params:
        """Set density to -100 for voxels within ``near`` of any camera
        (reference dvgo.py:103-135)."""
        xyz = self.grid_xyz()  # [X,Y,Z,3]
        d2 = ((xyz[..., None, :] - cam_o) ** 2).sum(-1)  # [X,Y,Z,Ncam]
        nearest = jnp.sqrt(d2.min(-1))[..., None]
        density = jnp.where(nearest <= self.near, -100.0, params["density"])
        return {**params, "density": density}

    def voxel_count_views(
        self, rays_o_imgs: np.ndarray, rays_d_imgs: np.ndarray, chunk: int
    ) -> jnp.ndarray:
        """Per-voxel count of observing views (reference dvgo.py:59-93):
        a voxel counts for a view if the summed trilinear splat weight of
        that view's samples exceeds 1 — obtained here, as in the reference,
        as the gradient of sum(grid_sample(ones_grid)) w.r.t. the grid."""
        X, Y, Z = self.world_size
        ones = jnp.ones((X, Y, Z, 1), jnp.float32)
        count = jnp.zeros((X, Y, Z, 1), jnp.float32)
        mn = jnp.asarray(self.xyz_min)
        mx = jnp.asarray(self.xyz_max)
        rng = jnp.arange(self.n_samples, dtype=jnp.float32)[None]

        @jax.jit
        def accum_weight(ro, rd):
            def total(g):
                vec = jnp.where(rd == 0, 1e-6, rd)
                rate_a = (mx - ro) / vec
                rate_b = (mn - ro) / vec
                t_min = jnp.clip(
                    jnp.minimum(rate_a, rate_b).max(-1), self.near, self.far
                )
                step = self.stepsize * self.voxel_size * rng
                interpx = t_min[:, None] + step / jnp.linalg.norm(
                    rd, axis=-1, keepdims=True
                )
                pts = ro[:, None, :] + rd[:, None, :] * interpx[..., None]
                return gridops.grid_sample_3d(g, pts, mn, mx).sum()

            return jax.grad(total)(ones)

        n_img = rays_o_imgs.shape[0]
        for i in range(n_img):
            w = jnp.zeros_like(ones)
            ro_img = rays_o_imgs[i]
            rd_img = rays_d_imgs[i]
            for st in range(0, ro_img.shape[0], chunk):
                ro = jnp.asarray(ro_img[st : st + chunk])
                rd = jnp.asarray(rd_img[st : st + chunk])
                w = w + accum_weight(ro, rd)
            count = count + (w > 1).astype(jnp.float32)
        return count

    # -------------------------------------------------------------- forwards

    def activate_density(self, density: jnp.ndarray, interval: float) -> jnp.ndarray:
        return 1.0 - jnp.exp(-jax.nn.softplus(density + self.act_shift) * interval)

    def _march(self, params: Params, rays_o, rays_d, rand_shift=None):
        pts, mask_out = rayops.sample_rays_dvgo(
            rays_o, rays_d, jnp.asarray(self.xyz_min), jnp.asarray(self.xyz_max),
            self.near, self.far, self.stepsize, self.voxel_size, self.n_samples,
            rand_shift=rand_shift,
        )
        density = gridops.grid_sample_3d(
            params["density"], pts, jnp.asarray(self.xyz_min),
            jnp.asarray(self.xyz_max),
        )[..., 0]
        alpha = jnp.where(~mask_out, self.activate_density(density, self.stepsize), 0.0)
        weights, alphainv_cum = renderops.ray_marching_weights_dvgo(alpha)
        return pts, mask_out, alpha, weights, alphainv_cum

    def forward_training(
        self, params: Params, rays_o, rays_d, em_modes, rng_key,
        rand_shift=None,
    ) -> Dict[str, jnp.ndarray]:
        """Reference dvgo.py:174-214. em_modes: [N] int (1 = emissive on).
        ``rand_shift`` overrides the per-ray stratified jitter (exact replay
        under different batch shardings)."""
        shift = (rand_shift if rand_shift is not None else
                 jax.random.uniform(rng_key, (rays_o.shape[0], 1),
                                    rays_o.dtype))
        pts, mask_out, alpha, weights, alphainv_cum = self._march(
            params, rays_o, rays_d, rand_shift=shift
        )
        mn = jnp.asarray(self.xyz_min)
        mx = jnp.asarray(self.xyz_max)

        on_mask = (em_modes == 1)[:, None, None]
        emo = jax.nn.sigmoid(gridops.grid_sample_3d(params["emo_color"], pts, mn, mx))
        off = jax.nn.sigmoid(gridops.grid_sample_3d(params["off_color"], pts, mn, mx))
        rgb = jnp.where(on_mask, emo, 0.0) + off

        rgb_marched = (weights[..., None] * rgb).sum(-2)
        return {
            "etc/alphainv_cum": alphainv_cum,
            "etc/weights": weights,
            "etc/white_bg": alphainv_cum[..., -1:],
            "srgb/raw_rgb": rgb,
            "srgb/rgb": rgb_marched,
        }

    def forward_evaluate(
        self, params: Params, rays_o, rays_d, em_modes
    ) -> Dict[str, jnp.ndarray]:
        """Reference dvgo.py:216-263. em_modes: scalar light mode."""
        pts, mask_out, alpha, weights, alphainv_cum = self._march(
            params, rays_o, rays_d
        )
        mn = jnp.asarray(self.xyz_min)
        mx = jnp.asarray(self.xyz_max)
        off = jax.nn.sigmoid(gridops.grid_sample_3d(params["off_color"], pts, mn, mx))
        emo = jax.nn.sigmoid(gridops.grid_sample_3d(params["emo_color"], pts, mn, mx))
        on = off + emo

        w = weights[..., None]
        off_m = (w * off).sum(-2)
        emo_m = (w * emo).sum(-2)
        on_m = (w * on).sum(-2)
        depth = jnp.linalg.norm(rays_o[:, None, :] - pts, axis=-1)
        depth = (weights * depth).sum(-1)
        disp = 1.0 / (depth + alphainv_cum[..., -1] * self.far)
        rgb_m = jnp.where(jnp.asarray(em_modes) == 0, off_m, on_m)
        return {
            "etc/depth": depth,
            "etc/disp": disp,
            "etc/white_bg": alphainv_cum[..., -1:],
            "srgb/off_rgb": off_m,
            "srgb/on_rgb": on_m,
            "srgb/emo_rgb": emo_m,
            "srgb/rgb": rgb_m,
        }

    # ------------------------------------------------------------ checkpoint

    def export_meta(self) -> dict:
        return {
            "near": self.near,
            "far": self.far,
            "xyz_min": self.xyz_min,
            "xyz_max": self.xyz_max,
        }
