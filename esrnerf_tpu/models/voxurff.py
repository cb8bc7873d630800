"""VoxurfF — fine HDR renderer with learnable tone-mapping (fine stage).

Functional JAX re-design of ``app/fine/model/voxurff.py:29-788``: radiance
heads output softplus *linear HDR* RGB; a learnable TonemapNet maps
PE-encoded linear RGB to sigmoid sRGB; features add the per-point SDF value,
multi-scale 6-neighbor SDF taps and per-displacement normals
(``grad_feat=[0.5,1,1.5,2]``); emissive-on rays add the detached off head;
progressive grid scaling via trilinear upsampling.

Param groups (= reference optimizer names): ``sdf``, ``off_color``,
``emo_color``, ``off_rgbnet``, ``emo_rgbnet``, ``tonemapper``.
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


class VoxurfF:
    def __init__(
        self, cfg, near, far, xyz_min, xyz_max, mask_cache: MaskCache,
        s_val: float, num_voxels: int, mask_meta: dict | None = None,
    ):
        self.cfg = cfg
        self.mask_meta = mask_meta or {}
        m = cfg.app.model
        self.mlp_dtype = mlpops.mlp_dtype_from_cfg(cfg)
        self.geo = VoxurfGeometry(cfg, near, far, xyz_min, xyz_max, mask_cache)
        self.geo.set_grid_resolution(int(num_voxels))
        self.s_val = float(s_val)

        self.fastcolor_thres = float(m["fastcolor_thres"])
        self.color_dim = int(m["color_dim"])
        self.rgbnet_width = int(m["rgbnet_width"])
        self.rgbnet_depth = int(m["rgbnet_depth"])
        self.tonemap_width = int(m["tonemap_width"])
        self.tonemap_depth = int(m["tonemap_depth"])
        self.posbase_pe = int(m["posbase_pe"])
        self.viewbase_pe = int(m["viewbase_pe"])
        self.colorbase_pe = int(m["colorbase_pe"])
        self.grad_feat = np.asarray(m["grad_feat"], np.float32)
        self.neus_alpha = str(m["neus_alpha"])

        self.tv_smooth_kernel = jnp.asarray(
            gridops.make_gradient_smooth_kernel_3d()
        )
        self._nonempty = self.geo.nonempty_mask()

        D = len(self.grad_feat)
        # reference voxurff.py:132-137
        self.dim0 = (
            (3 + 3 * self.posbase_pe * 2)
            + (3 * self.viewbase_pe * 3)
            + self.color_dim
            + D * 3      # multi-scale normals
            + D * 6      # multi-scale neighbor taps
            + 1          # sdf value
        )
        self.tonemap_dim0 = 3 + 3 * self.colorbase_pe * 2

    @property
    def num_voxels(self) -> int:
        return self.geo.num_voxels

    # ------------------------------------------------------------------ init

    def init_params(self, key: jax.Array) -> Params:
        X, Y, Z = self.geo.world_size
        k1, k2, k3 = jax.random.split(key, 3)
        dims = [self.dim0] + [self.rgbnet_width] * (self.rgbnet_depth - 1) + [3]
        tm_dims = (
            [self.tonemap_dim0] + [self.tonemap_width] * (self.tonemap_depth - 1)
            + [3]
        )
        return {
            "sdf": self.geo.sphere_sdf_init(),
            "off_color": jnp.zeros((X, Y, Z, self.color_dim), jnp.float32),
            "emo_color": jnp.zeros((X, Y, Z, self.color_dim), jnp.float32),
            "off_rgbnet": mlpops.init_mlp(k1, dims),
            "emo_rgbnet": mlpops.init_mlp(k2, dims),
            "tonemapper": mlpops.init_mlp(k3, tm_dims),
        }

    def load_coarse_sdf(self, coarse_sdf: np.ndarray, sdf_reduce: float) -> jnp.ndarray:
        """Warm-start the SDF from the coarse stage: rescale by sdf_reduce,
        resize to this grid, Gaussian-smooth (ksize=5, sigma=1), re-mask
        (reference fine.py:163-198)."""
        sdf = jnp.asarray(coarse_sdf) / sdf_reduce
        if sdf.shape[:3] != self.geo.world_size:
            sdf = gridops.resize_trilinear(sdf, self.geo.world_size)
        kern = jnp.asarray(gridops.make_gaussian_kernel_3d(5, 1.0))
        sdf = gridops.conv3d_replicate(sdf, kern)
        ne = self._nonempty[..., None]
        return jnp.where(ne, sdf, 1.0)

    # ------------------------------------------------------- progressive pg

    def scale_volume_grid(self, params: Params, num_voxels: int) -> Params:
        """Trilinear upsample of sdf/colors to the new resolution
        (reference voxurff.py:547-566). Mutates geometry; caller must
        recreate the optimizer state and re-jit."""
        self.geo.set_grid_resolution(int(num_voxels))
        new_size = self.geo.world_size
        out = dict(params)
        for k in ("sdf", "off_color", "emo_color"):
            out[k] = gridops.resize_trilinear(params[k], new_size)
        self._nonempty = self.geo.nonempty_mask()
        out["sdf"] = jnp.where(self._nonempty[..., None], out["sdf"], 1.0)
        return out

    # -------------------------------------------------------------- features

    def _features(self, params, pts, viewdirs_per_pt, sdf, n_valid=None):
        geo = self.geo
        feat6, _, normals = geo.sample_sdfeat_grad_normal(
            params["sdf"], pts, self.grad_feat, n_valid
        )
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
                sdf[:, None], feat6, normals,
            ],
            axis=-1,
        )

    def apply_tonemapper(self, params: Params, lin_rgb: jnp.ndarray) -> jnp.ndarray:
        """PE-encode linear RGB -> sigmoid sRGB (reference voxurff.py:783-788)."""
        colorfreq = jnp.asarray([2.0**i for i in range(self.colorbase_pe)])
        emb = (lin_rgb[..., None] * colorfreq).reshape(*lin_rgb.shape[:-1], -1)
        feat = jnp.concatenate([lin_rgb, jnp.sin(emb), jnp.cos(emb)], -1)
        return jax.nn.sigmoid(mlpops.apply_mlp(
            params["tonemapper"], feat, compute_dtype=self.mlp_dtype))

    def _radiance(self, params, head: str, pts, feat, sorted_pts=False,
                  n_valid=None, grid_val=None):
        # grid_val: the head's color-grid samples when the caller already
        # fetched them through a fused multi-grid gather (one kernel sweep
        # for off/emo/brdf instead of three — see sample_grids_sorted)
        if grid_val is None:
            grid = params[f"{head}_color"]
            if sorted_pts:
                samp = lambda g, p: self.geo.sample_grid_sorted(g, p, n_valid)
            else:
                samp = self.geo.sample_grid
            grid_val = samp(grid, pts)
        x = jnp.concatenate([grid_val, feat], -1)
        return jax.nn.softplus(mlpops.apply_mlp(
            params[f"{head}_rgbnet"], x, compute_dtype=self.mlp_dtype))

    # -------------------------------------------------------------- forwards

    def forward_training(
        self, params: Params, rays_o, rays_d, viewdirs, em_modes, s_val
    ) -> Dict[str, jnp.ndarray]:
        geo = self.geo
        m = geo.march(
            params["sdf"], rays_o, rays_d, viewdirs, s_val,
            self.fastcolor_thres, self.neus_alpha,
            gradient_grid=geo.sdf_gradient(params["sdf"])
            if self.neus_alpha == "grad" else None,
            style="fine",
        )
        rid = jnp.minimum(m.ray_id, m.n_rays - 1)
        feat = self._features(params, m.pts, viewdirs[rid], m.sdf,
                              n_valid=m.n_valid)
        on_mask = ((em_modes[rid] == 1) & ~m.pad)[:, None]

        off_gv, emo_gv = self.geo.sample_grids_sorted(
            (params["off_color"], params["emo_color"]), m.pts, m.n_valid
        )
        off = self._radiance(params, "off", m.pts, feat, sorted_pts=True,
                             n_valid=m.n_valid, grid_val=off_gv)
        emo = self._radiance(params, "emo", m.pts, feat, sorted_pts=True,
                             n_valid=m.n_valid, grid_val=emo_gv)
        lin_rgb = jnp.where(
            on_mask, emo + jax.lax.stop_gradient(off), off
        )
        rgb = self.apply_tonemapper(params, lin_rgb)

        rgb_m = geo.segment_to_rays(m, rgb)
        lin_m = geo.segment_to_rays(m, lin_rgb)
        return {
            "etc/alphainv_cum": m.alphainv_last,
            "etc/white_bg": m.alphainv_last[..., None],
            "srgb/rgb": rgb_m,
            "lin/rgb": lin_m,
            "etc/overflow": m.overflow,
            "etc/k1_frac": m.k1_frac,
            "etc/k2_frac": m.k2_frac,
        }

    def forward_evaluate(
        self, params: Params, rays_o, rays_d, viewdirs, em_modes, pos_rt, s_val
    ) -> Dict[str, jnp.ndarray]:
        geo = self.geo
        m = geo.march(
            params["sdf"], rays_o, rays_d, viewdirs, s_val,
            self.fastcolor_thres, self.neus_alpha,
            gradient_grid=geo.sdf_gradient(params["sdf"])
            if self.neus_alpha == "grad" else None,
            style="fine",
        )
        rid = jnp.minimum(m.ray_id, m.n_rays - 1)
        feat = self._features(params, m.pts, viewdirs[rid], m.sdf,
                              n_valid=m.n_valid)

        off_gv, emo_gv = geo.sample_grids_sorted(
            (params["off_color"], params["emo_color"]), m.pts, m.n_valid
        )
        lin_off = self._radiance(params, "off", m.pts, feat, sorted_pts=True,
                                 n_valid=m.n_valid, grid_val=off_gv)
        lin_emo = self._radiance(params, "emo", m.pts, feat, sorted_pts=True,
                                 n_valid=m.n_valid, grid_val=emo_gv)
        lin_on = lin_off + lin_emo
        off = self.apply_tonemapper(params, lin_off)
        emo = self.apply_tonemapper(params, lin_emo)
        on = self.apply_tonemapper(params, lin_on)

        _, grad_xyz = geo.sample_sdf_grad(params["sdf"], m.pts)
        normal = grad_xyz / jnp.maximum(
            jnp.linalg.norm(grad_xyz, axis=-1, keepdims=True), 1e-12
        )
        nrm = ((normal @ pos_rt) * NORMAL_FLIPPER + 1.0) / 2.0

        out = {}
        for key, v in [
            ("srgb/off_rgb", off), ("lin/off_rgb", lin_off),
            ("srgb/on_rgb", on), ("lin/on_rgb", lin_on),
            ("srgb/emo_rgb", emo), ("lin/emo_rgb", lin_emo),
            ("etc/normal", nrm),
        ]:
            out[key] = geo.segment_to_rays(m, v)

        depth = geo.segment_to_rays(
            m, m.step_id.astype(jnp.float32) * geo.stepdist
        )
        disp = 1.0 / (depth + m.alphainv_last * geo.far)
        is_off = jnp.asarray(em_modes) == 0
        out.update(
            {
                "etc/depth": depth,
                "etc/disp": disp,
                "etc/white_bg": m.alphainv_last[..., None],
                "srgb/rgb": jnp.where(is_off, out["srgb/off_rgb"], out["srgb/on_rgb"]),
                "lin/rgb": jnp.where(is_off, out["lin/off_rgb"], out["lin/on_rgb"]),
            }
        )
        out["etc/overflow"] = m.overflow  # scalar: eval loops pop + track it
        return out

    # ---------------------------------------------------------------- losses

    def density_total_variation(self, params: Params, smooth_grad_tv) -> jnp.ndarray:
        """Only the smooth-grad term is used in the fine loop
        (fine.py:390-393 passes sdf_tv=0); the sdf TV goes through
        :func:`sdf_tv_grad` instead."""
        geo = self.geo
        grad = geo.sdf_gradient(params["sdf"])
        smoothed = jax.lax.stop_gradient(
            gridops.conv3d_replicate(grad, self.tv_smooth_kernel)
        )
        err = (smoothed - grad) ** 2
        mask = jnp.broadcast_to(self._nonempty[..., None], err.shape)
        denom = jnp.maximum(mask.sum(), 1)
        return (jnp.where(mask, err, 0.0).sum() / denom) * smooth_grad_tv

    def sdf_tv_grad(
        self, sdf: jnp.ndarray, weight, sparse_grad=None
    ) -> jnp.ndarray:
        """Gradient contribution of ``sdf_total_variation_add_grad``
        (voxurff.py:619-621): per-axis weight scaled by max(world)/128."""
        w = weight * max(self.geo.world_size) / 128.0
        return tvops.tv_grad(sdf, w, w, w, sparse_grad=sparse_grad)

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
            "num_voxels": self.geo.num_voxels,
            **self.mask_meta,
        }
