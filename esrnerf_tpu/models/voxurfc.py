"""VoxurfC — coarse SDF renderer (coarse stage).

Functional JAX re-design of ``app/coarse/model/voxurfc.py:28-655``: dense
SDF grid with frozen Gaussian smoothing, NeuS alpha from a previous-stage
mask cache, two color grids + two small MLP heads (off / emissive-on), TV
regularizers on the masked grids. All forwards are pure functions of the
parameter dict ``{"sdf","off_color","emo_color","off_rgbnet","emo_rgbnet"}``
whose top-level keys match the reference's optimizer param groups.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.models import mlp as mlpops
from esrnerf_tpu.models.voxurf_base import MaskCache, VoxurfGeometry
from esrnerf_tpu.ops import grid as gridops
from esrnerf_tpu.ops import tv as tvops

Params = Dict[str, jnp.ndarray]

NORMAL_FLIPPER = jnp.asarray([1.0, -1.0, -1.0])


class VoxurfC:
    def __init__(
        self, cfg, near, far, xyz_min, xyz_max, mask_cache: MaskCache,
        s_val: float, mask_meta: dict | None = None,
    ):
        self.cfg = cfg
        # raw (pre-maxpool) mask grid + metadata, checkpointed so reloads
        # rebuild the cache identically (reference stores mask_density raw,
        # coarse.py:426-436)
        self.mask_meta = mask_meta or {}
        m = cfg.app.model
        self.mlp_dtype = mlpops.mlp_dtype_from_cfg(cfg)
        self.geo = VoxurfGeometry(cfg, near, far, xyz_min, xyz_max, mask_cache)
        self.s_val = float(s_val)

        self.fastcolor_thres = float(m["fastcolor_thres"])
        self.color_dim = int(m["color_dim"])
        self.rgbnet_width = int(m["rgbnet_width"])
        self.rgbnet_depth = int(m["rgbnet_depth"])
        self.posbase_pe = int(m["posbase_pe"])
        self.viewbase_pe = int(m["viewbase_pe"])
        self.smooth_ksize = int(m["smooth_ksize"])
        self.smooth_sigma = float(m["smooth_sigma"])
        self.neus_alpha = str(m["neus_alpha"])

        self.smooth_kernel = jnp.asarray(
            gridops.make_gaussian_kernel_3d(self.smooth_ksize, self.smooth_sigma)
        )
        self.tv_smooth_kernel = jnp.asarray(
            gridops.make_gradient_smooth_kernel_3d()
        )
        self._nonempty = self.geo.nonempty_mask()

        # feature dim (reference voxurfc.py:134-136)
        self.dim0 = (
            (3 + 3 * self.posbase_pe * 2)
            + (3 * self.viewbase_pe * 3)
            + self.color_dim
            + 3
        )

    # ------------------------------------------------------------------ init

    def init_params(self, key: jax.Array) -> Params:
        X, Y, Z = self.geo.world_size
        k1, k2 = jax.random.split(key)
        dims = [self.dim0] + [self.rgbnet_width] * (self.rgbnet_depth - 1) + [3]
        return {
            "sdf": self.geo.sphere_sdf_init(),
            "off_color": jnp.zeros((X, Y, Z, self.color_dim), jnp.float32),
            "emo_color": jnp.zeros((X, Y, Z, self.color_dim), jnp.float32),
            "off_rgbnet": mlpops.init_mlp(k1, dims, zero_final_bias=True),
            "emo_rgbnet": mlpops.init_mlp(k2, dims, zero_final_bias=True),
        }

    # -------------------------------------------------------------- features

    def _features(self, pts, viewdirs_per_pt, normal):
        geo = self.geo
        xyz_n = (pts - geo.xyz_min) / (geo.xyz_max - geo.xyz_min)
        posfreq = jnp.asarray([2.0**i for i in range(self.posbase_pe)])
        viewfreq = jnp.asarray([2.0**i for i in range(self.viewbase_pe)])
        xyz_emb = (xyz_n[..., None] * posfreq).reshape(*xyz_n.shape[:-1], -1)
        view_emb = (viewdirs_per_pt[..., None] * viewfreq).reshape(
            *viewdirs_per_pt.shape[:-1], -1
        )
        return jnp.concatenate(
            [
                xyz_n, jnp.sin(xyz_emb), jnp.cos(xyz_emb),
                view_emb, jnp.sin(view_emb), jnp.cos(view_emb),
                normal,
            ],
            axis=-1,
        )

    def _heads(self, params, pts, feat, on_mask, sorted_pts=False):
        """off + (on-rays-only) emissive sigmoid heads
        (reference voxurfc.py:241-249)."""
        samp = (self.geo.sample_grid_sorted if sorted_pts
                else self.geo.sample_grid)
        off_in = jnp.concatenate(
            [samp(params["off_color"], pts), feat], -1
        )
        off = jax.nn.sigmoid(mlpops.apply_mlp(
            params["off_rgbnet"], off_in, compute_dtype=self.mlp_dtype))
        emo_in = jnp.concatenate(
            [samp(params["emo_color"], pts), feat], -1
        )
        emo = jax.nn.sigmoid(mlpops.apply_mlp(
            params["emo_rgbnet"], emo_in, compute_dtype=self.mlp_dtype))
        return jnp.where(on_mask[:, None], emo, 0.0) + off, off, emo

    # -------------------------------------------------------------- forwards

    def smoothed_sdf(self, params: Params) -> jnp.ndarray:
        return gridops.conv3d_replicate(params["sdf"], self.smooth_kernel)

    def forward_training(
        self, params: Params, rays_o, rays_d, viewdirs, em_modes, s_val
    ) -> Dict[str, jnp.ndarray]:
        geo = self.geo
        sdf_smooth = self.smoothed_sdf(params)
        grad_grid = geo.sdf_gradient(params["sdf"])
        m = geo.march(
            sdf_smooth, rays_o, rays_d, viewdirs, s_val, self.fastcolor_thres,
            self.neus_alpha, grad_grid,
        )

        grad_pts = geo.sample_grid_sorted(grad_grid, m.pts)
        normal = grad_pts / (
            jnp.linalg.norm(grad_pts, axis=-1, keepdims=True) + 1e-5
        )
        view_pt = viewdirs[jnp.minimum(m.ray_id, m.n_rays - 1)]
        feat = self._features(m.pts, view_pt, normal)
        on_mask = (em_modes[jnp.minimum(m.ray_id, m.n_rays - 1)] == 1) & ~m.pad
        rgb, _, _ = self._heads(params, m.pts, feat, on_mask, sorted_pts=True)

        rgb_marched = geo.segment_to_rays(m, rgb)
        return {
            "etc/alphainv_cum": m.alphainv_last,
            "etc/white_bg": (1.0 - m.cum_weights)[:, None],
            "srgb/rgb": rgb_marched,
            "etc/overflow": m.overflow,
            "etc/k1_frac": m.k1_frac,
            "etc/k2_frac": m.k2_frac,
        }

    def forward_evaluate(
        self, params: Params, rays_o, rays_d, viewdirs, em_modes, pos_rt, s_val
    ) -> Dict[str, jnp.ndarray]:
        geo = self.geo
        sdf_smooth = self.smoothed_sdf(params)
        grad_grid = geo.sdf_gradient(params["sdf"])
        m = geo.march(
            sdf_smooth, rays_o, rays_d, viewdirs, s_val, self.fastcolor_thres,
            self.neus_alpha, grad_grid,
        )

        grad_pts = geo.sample_grid_sorted(grad_grid, m.pts)
        normal = grad_pts / (
            jnp.linalg.norm(grad_pts, axis=-1, keepdims=True) + 1e-5
        )
        view_pt = viewdirs[jnp.minimum(m.ray_id, m.n_rays - 1)]
        feat = self._features(m.pts, view_pt, normal)
        ones = jnp.ones(m.pts.shape[0], bool)
        _, off, emo = self._heads(params, m.pts, feat, ones, sorted_pts=True)
        on = off + emo

        off_m = geo.segment_to_rays(m, off)
        emo_m = geo.segment_to_rays(m, emo)
        on_m = geo.segment_to_rays(m, on)

        nrm = (normal @ pos_rt) * NORMAL_FLIPPER
        nrm = (nrm + 1.0) / 2.0
        normal_m = geo.segment_to_rays(m, nrm)
        depth = geo.segment_to_rays(
            m, m.step_id.astype(jnp.float32) * geo.stepdist
        )
        bg = (1.0 - m.cum_weights)[:, None]
        disp = 1.0 / (depth + bg[..., -1] * geo.far)
        rgb_m = jnp.where(jnp.asarray(em_modes) == 0, off_m, on_m)
        return {
            "etc/depth": depth,
            "etc/disp": disp,
            "etc/normal": normal_m,
            "etc/white_bg": bg,
            "srgb/off_rgb": off_m,
            "srgb/emo_rgb": emo_m,
            "srgb/on_rgb": on_m,
            "srgb/rgb": rgb_m,
            # scalar: eval loops pop + track it (budget alarms at eval too)
            "etc/overflow": m.overflow,
        }

    # -------------------------------------------------------------- TV losses

    def density_total_variation(
        self, params: Params, sdf_tv, smooth_grad_tv
    ) -> jnp.ndarray:
        """Reference voxurfc.py:523-540."""
        geo = self.geo
        out = 0.0
        out = out + tvops.total_variation(
            params["sdf"], self._nonempty
        ) / 2.0 / geo.voxel_size * sdf_tv
        grad = geo.sdf_gradient(params["sdf"])  # [X,Y,Z,3]
        smoothed = jax.lax.stop_gradient(
            gridops.conv3d_replicate(grad, self.tv_smooth_kernel)
        )
        err = (smoothed - grad) ** 2
        mask = jnp.broadcast_to(self._nonempty[..., None], err.shape)
        denom = jnp.maximum(mask.sum(), 1)
        out = out + (jnp.where(mask, err, 0.0).sum() / denom) * smooth_grad_tv
        return out

    def color_total_variation(self, params: Params) -> jnp.ndarray:
        return tvops.total_variation(
            params["off_color"], self._nonempty
        ) + tvops.total_variation(params["emo_color"], self._nonempty)

    # ------------------------------------------------------------------ mesh

    def extract_geometry(self, params: Params, **kw):
        return self.geo.extract_geometry(params["sdf"], **kw)

    def export_meta(self) -> dict:
        return {
            "near": self.geo.near,
            "far": self.geo.far,
            "xyz_min": self.geo.xyz_min,
            "xyz_max": self.geo.xyz_max,
            "s_val": self.s_val,
            **self.mask_meta,  # mask_xyz_min/max, mask_alpha_init, mask_density
        }
