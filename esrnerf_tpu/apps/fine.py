"""Stage 3 trainer: Fine (VoxurfF HDR radiance + tone-mapper).

Behavioral port of ``app/fine/fine.py:29-714``: warm-start from the coarse
SDF (rescale/resize/smooth), progressive grid scaling at ``pg_scale`` steps,
dual sRGB-MSE + tone-clamped linear loss, CosineLR, smooth-grad TV loss plus
the sparse in-place SDF TV applied as a gradient term, eval with linear /
gamma variants and HDR-EXR MSE.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.apps.base import AppClass, import_class
from esrnerf_tpu.config import save_cfg
from esrnerf_tpu.data.base import LightDict
from esrnerf_tpu.data.sampler import BatchSampler
from esrnerf_tpu.models.voxurf_base import make_mask_cache
from esrnerf_tpu.models.voxurff import VoxurfF
from esrnerf_tpu.optim import Adam, CosineLR
from esrnerf_tpu.ops.image import apply_gamma_curve
from esrnerf_tpu.utils import checkpoint as ckpt_io
from esrnerf_tpu.utils import mesh as meshutil
from esrnerf_tpu.utils.metrics import DTU_CD, loss2psnr, rgb_lpips, rgb_ssim


class Fine(AppClass):
    STAGE_CLS = "fine.Fine"
    PREV_CLS = "coarse.Coarse"
    MODEL_CLS = VoxurfF

    def __init__(self, cfg):
        super().__init__(cfg)
        tr = cfg.app["trainer"]
        self.sdf_reduce = tr["sdf_reduce"]
        self.num_voxels = tr["num_voxels"]
        self.pg_scale = list(tr["pg_scale"])
        self.scale_ratio = tr["scale_ratio"]
        self.s_start = tr["s_start"]
        self.s_inv_ratio = tr["s_inv_ratio"]
        self.step_start = tr["step_start"]
        self.step_end = tr["step_end"]
        self.train_bs = tr["batch_size"]
        self.n_iters = tr["n_iters"]
        self.lrs = dict(tr["lrs"])
        self.decay_steps = {int(k): dict(v) for k, v in tr["decay_steps"].items()}
        self.weight_entropy_last = tr["weight_entropy_last"]
        self.weight_tv_density = tr["weight_tv_density"]
        self.weight_linear = tr["weight_linear"]
        self.tvs = dict(tr["tvs"])
        self.tv_from = tr["tv_from"]
        self.tv_end = tr["tv_end"]
        self.tv_every = tr["tv_every"]
        self.tv_dense_before = tr["tv_dense_before"]
        self.vis_every = tr["vis_every"]
        self.N_vis = tr["N_vis"]
        self.save_every = tr["save_every"]
        self.save_all = tr["save_all"]
        if self.step_end < 0:
            self.step_end = self.n_iters * 10
        self.data_keys = ["rgbs", "rays_o", "rays_d", "viewdirs", "em_modes"]
        self.eval_bs = cfg.app["eval"]["batch_size"]

    def s_val_at(self, step: int) -> float:
        return (
            min(step, self.step_end) - self.step_start
        ) / self.s_inv_ratio + self.s_start

    # ----------------------------------------------------------------- data

    def load_dataset(self) -> None:
        data_cls = import_class("esrnerf_tpu.data." + self.cfg.data["cls"])
        if self.phase == "train":
            self.train_dataset = data_cls(self.cfg, "train")
            self.test_dataset = data_cls(self.cfg, "test_nv")
        else:
            self.test_dataset = data_cls(self.cfg, self.phase)

    # ---------------------------------------------------------------- model

    def _mask_meta_from(self, r: dict) -> dict:
        return {
            "mask_xyz_min": np.asarray(r["mask_xyz_min"]),
            "mask_xyz_max": np.asarray(r["mask_xyz_max"]),
            "mask_alpha_init": r["mask_alpha_init"],
            "mask_density": np.asarray(r["mask_density"]),
        }

    def _build_renderer(self, r: dict, s_val, num_voxels):
        meta = self._mask_meta_from(r)
        mask_cache = make_mask_cache(
            meta["mask_density"], meta["mask_xyz_min"], meta["mask_xyz_max"],
            meta["mask_alpha_init"], self.cfg.app.model["maskcache_thres"],
            self.cfg.app.model["mask_ks"],
        )
        return self.MODEL_CLS(
            self.cfg, r["near"], r["far"], np.asarray(r["xyz_min"]),
            np.asarray(r["xyz_max"]), mask_cache, s_val, num_voxels, meta,
        )

    def _init_params(self, prev: dict) -> dict:
        """Model init + coarse-SDF warm start (fine.py:163-199)."""
        params = self.renderer.init_params(
            jax.random.PRNGKey(self.cfg.system["seed"])
        )
        coarse_sdf = np.asarray(prev["renderer"]["params"]["sdf"])
        params["sdf"] = self.renderer.load_coarse_sdf(coarse_sdf, self.sdf_reduce)
        return params

    def load_model(self) -> None:
        if self.phase == "train":
            self.load_train_model()
        else:
            self.load_eval_model()

    def _initial_num_voxels(self) -> int:
        if len(self.pg_scale):
            return int(self.num_voxels / (self.scale_ratio ** len(self.pg_scale)))
        return self.num_voxels

    def load_train_model(self) -> None:
        ckpt, is_resume = self.resolve_train_ckpt()
        if ckpt is None:
            cand = os.path.join(
                self.cfg.log["dir"], "checkpoints", "last.ckpt"
            ).replace(self.STAGE_CLS, self.PREV_CLS)
            if os.path.exists(cand):
                ckpt = cand
            else:
                raise FileNotFoundError(
                    f"{self.STAGE_CLS} needs the previous-stage ckpt "
                    f"(looked at {cand}); pass app.trainer.ckpt explicitly"
                )
        data = self.train_dataset.all_data

        if not is_resume:
            self.global_step = 0
            prev = ckpt_io.load_checkpoint(ckpt)
            r = prev["renderer"]
            self.renderer = self._build_renderer(
                r, r["s_val"], self._initial_num_voxels()
            )
            self.params = self._init_params(prev)
            self.opt = Adam(self.lrs)
            self.opt_state = self.opt.init(self.params)
            self.lr_scales = {k: 1.0 for k in self.lrs}
            self.lr_scheduler = CosineLR.from_cfg(self.cfg, 0)

            keep = self.renderer.geo.filter_rays_in_maskcache(
                data["rays_o"], data["rays_d"], self.eval_bs, style="voxurf"
            )
            self.sampler = BatchSampler(
                self.cfg, data, self.data_keys, self.train_bs,
                seed=self.cfg.system["seed"],
            )
            self.sampler.filter(keep)
            self.sampler.shuffle()
        else:
            payload = ckpt_io.load_checkpoint(ckpt)
            r, t = payload["renderer"], payload["trainer"]
            self.global_step = t["global_step"] + 1
            self.renderer = self._build_renderer(r, r["s_val"], r["num_voxels"])
            self.params = jax.tree.map(jnp.asarray, r["params"])
            self.opt = Adam(self.lrs)
            self.opt_state = jax.tree.map(jnp.asarray, t["optimizer"])
            self.lr_scales = dict(t["lr_scales"])
            self.lr_scheduler = CosineLR.from_cfg(self.cfg, self.global_step)
            self.sampler = BatchSampler(
                self.cfg, data, self.data_keys, self.train_bs,
                batch_st=t["batch_st"], data_idxs=t["data_idxs"],
                seed=self.cfg.system["seed"],
            )
            print(f"resume training from step {self.global_step}")

    def load_eval_model(self) -> None:
        ckpt = self.resolve_eval_ckpt()
        payload = ckpt_io.load_checkpoint(ckpt)
        r = payload["renderer"]
        self.global_step = payload["trainer"]["global_step"]
        self.renderer = self._build_renderer(r, r["s_val"], r["num_voxels"])
        self.params = self.place_replicated(
            jax.tree.map(jnp.asarray, r["params"])
        )
        print(f"loaded ckpt {ckpt} @ step {self.global_step}")

    # ---------------------------------------------------------------- train

    def _build_train_step(self):
        model = self.renderer
        opt = self.opt
        w_ent = self.weight_entropy_last
        w_lin = self.weight_linear
        white_bg = self.white_bg

        sh = self.shard_helpers()
        self.check_shardable(self.train_bs)

        def train_step(params, opt_state, batch, s_val, lr_scales, tv_flag,
                       smooth_grad_tv, sdf_tv_w, tv_dense):
            def loss_fn(p):
                res = model.forward_training(
                    p, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
                    batch["em_modes"], s_val,
                )
                wbg = res["etc/white_bg"] * white_bg
                srgb = jnp.clip(res["srgb/rgb"] + wbg, 0.0, 1.0)
                lin = jnp.clip(res["lin/rgb"] + wbg, 0.0, None)
                rgbs = batch["rgbs"]
                mse = sh.gmean((srgb - rgbs) ** 2)

                lin_tone = jnp.where(rgbs >= 1, jnp.clip(lin, None, 1.0), lin)
                lin_mse = sh.gmean((apply_gamma_curve(lin_tone) - rgbs) ** 2)
                loss = mse + w_lin * lin_mse

                # last-ray entropy quirk preserved (fine.py:378-382); glast
                # keeps it the *global* last ray when sharded
                pout = jnp.clip(res["etc/alphainv_cum"][..., -1], 1e-6, 1 - 1e-6)
                ent = sh.glast(
                    -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)).mean()
                )
                loss = loss + w_ent * ent

                loss = loss + tv_flag * model.density_total_variation(
                    p, smooth_grad_tv
                ) / sh.n
                return loss, (mse, lin_mse, res["etc/overflow"],
              res["etc/k1_frac"], res["etc/k2_frac"])

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = sh.gsum(grads)
            mse, lin_mse, ovf, k1f, k2f = aux

            # in-place SDF TV -> gradient term (fine.py:397-401), added once
            # to the global (psum'd) gradient so sparse mode sees the same
            # nonzero pattern as a single-device run
            tv_dense_g = model.sdf_tv_grad(params["sdf"], sdf_tv_w)
            tv_sparse_g = model.sdf_tv_grad(
                params["sdf"], sdf_tv_w, sparse_grad=grads["sdf"]
            )
            grads["sdf"] = grads["sdf"] + tv_flag * jnp.where(
                tv_dense, tv_dense_g, tv_sparse_g
            )

            params, opt_state = opt.step(
                params, grads, opt_state, lr_scales=lr_scales
            )
            return params, opt_state, (mse, lin_mse, sh.gmax(ovf),
                                       sh.gmax(k1f), sh.gmax(k2f))

        return self.wrap_train_step(train_step)

    def process(self) -> None:
        if self.phase == "train":
            self.learn()
        else:
            self.evaluate()

    def learn(self) -> None:
        self.params = self.place_replicated(self.params)
        self.opt_state = self.place_replicated(self.opt_state)
        train_step = self._build_train_step()
        ckpt_dir = self.ckpt_dir()
        ckpt_path = os.path.join(ckpt_dir, "last.ckpt")
        logger = self.get_logger()
        logs: Dict[str, List[float]] = {
            "srgb/MSE": [], "srgb/PSNR": [], "lin/MSE": [], "lin/PSNR": [],
        }

        tune_step = self.global_step
        pbar = self.tqdm(range(self.global_step, self.n_iters), colour="green")
        for self.global_step in pbar:
            if self.global_step in self.pg_scale:
                self.params = self.renderer.scale_volume_grid(
                    self.params, self.renderer.num_voxels * self.scale_ratio
                )
                self.opt_state = self.opt.init(self.params)
                train_step = self._build_train_step()

            batch = self.place_batch(self.sampler.sample())
            s_val = self.s_val_at(self.global_step)
            self.renderer.s_val = s_val
            tv_on = (
                self.tv_from < self.global_step < self.tv_end
                and self.global_step % self.tv_every == 0
            )
            self.params, self.opt_state, (mse, lin_mse, ovf, k1f, k2f) = train_step(
                self.params, self.opt_state, batch, jnp.float32(s_val),
                {k: jnp.float32(v) for k, v in self.lr_scales.items()},
                jnp.float32(1.0 if tv_on else 0.0),
                jnp.float32(self.tvs["smooth_grad"]),
                jnp.float32(
                    self.weight_tv_density * self.tvs["sdf"] / self.train_bs
                ),
                jnp.bool_(self.global_step < self.tv_dense_before),
            )

            if self.global_step == tune_step and self.maybe_autotune_budgets(
                {"k1": float(k1f), "k2": float(k2f)}
            ):
                train_step = self._build_train_step()

            decay = self.lr_scheduler.decay_factor
            for k in self.lr_scales:
                self.lr_scales[k] *= decay
            if self.global_step in self.decay_steps:
                for k, v in self.decay_steps[self.global_step].items():
                    self.lr_scales[k] *= v

            if self.global_step % self.cfg.system["tqdm_iters"] == 0:
                logs["srgb/MSE"].append(float(mse))
                logs["srgb/PSNR"].append(loss2psnr(float(mse)))
                logs["lin/MSE"].append(float(lin_mse))
                logs["lin/PSNR"].append(loss2psnr(float(lin_mse)))
                means = {k: float(np.mean(v)) for k, v in logs.items()}
                logs = {k: [] for k in logs}
                if hasattr(pbar, "set_description"):
                    pbar.set_description(
                        f"Iter {self.global_step:05d} (s) psnr = "
                        f"{means['srgb/PSNR']:.2f} (l) psnr = {means['lin/PSNR']:.2f}"
                    )
                means["etc/overflow"] = self.track_overflow(ovf)
                means["etc/k1_frac"] = float(k1f)
                means["etc/k2_frac"] = float(k2f)
                logger.log(
                    {f"train/metric/{k}": v for k, v in means.items()},
                    step=self.global_step,
                )

            last_it = self.global_step == self.n_iters - 1
            if self.global_step % self.vis_every == self.vis_every - 1 or last_it:
                self.evaluate(self.N_vis)
            if self.global_step % self.save_every == self.save_every - 1 or last_it:
                self.save(ckpt_path)
                if self.save_all:
                    import shutil

                    shutil.copy2(
                        ckpt_path,
                        os.path.join(ckpt_dir, f"{self.pretty_global_step}.ckpt"),
                    )

        self.cfg.app["eval"]["ckpt"] = ckpt_path
        save_cfg(self.cfg)

    def save(self, path: str) -> None:
        ckpt_io.save_checkpoint(
            path,
            {
                "renderer": {
                    "cfg": self.cfg.to_dict(),
                    **self.renderer.export_meta(),
                    "s_val": self.s_val_at(self.global_step),
                    "params": self.params,
                },
                "trainer": {
                    "global_step": self.global_step,
                    **self.sampler.state(),
                    "lr_scales": dict(self.lr_scales),
                    "optimizer": self.opt_state,
                },
            },
        )

    # ----------------------------------------------------------------- eval

    def _eval_fwd(self, budget_scale: int = 1):
        def build():
            renderer = self.renderer
            # fresh closure per build: jit's trace cache keys on the callable
            # and equal bound methods collide, which would silently reuse the
            # scale-1 trace for the escalated-budget variants
            fwd = jax.jit(lambda *a: renderer.forward_evaluate(*a))
            if budget_scale == 1:
                return fwd

            def scaled(*args):
                # budgets are read at trace time; the scaled attrs only
                # matter on this wrapper's first call per shape
                with self.scaled_budgets(budget_scale):
                    return fwd(*args)

            return scaled

        return self.cached_jit("eval_fwd", build, key_extra=(budget_scale,))

    def _decompose_pbr(self, pbr_pts, n_rays: int, s_val):
        """Hook: chunked LTS decomposition (LTS/PDRA stages only)."""
        raise NotImplementedError

    def _scene_extra_images(self, dirs) -> None:
        """Hook: extra scene-level artifacts (e.g. envmap renders)."""

    def _pre_composite_hook(self, imgs, data, metrics):
        """Hook: per-image post-processing before background compositing
        (PDRA masks lin/emit by k_val and accumulates emission IoU)."""
        return imgs

    def evaluate(self, N_vis: int = -1) -> None:
        dirs = self.eval_dirs()
        img_idxes = self.eval_img_idxes(len(self.test_dataset), N_vis)
        width, height = self.test_dataset.image_size

        metrics: Dict[str, List] = {
            **{f"lin/MSE_EXR_{mode}": [] for mode in ["off", "on"]},
            "srgb/MSE": [], "lin/MSE": [], "srgb/PSNR": [], "lin/PSNR": [],
            "srgb/SSIM": [], "lin/SSIM": [],
            "srgb/LPIPS_ALEX": [], "lin/LPIPS_ALEX": [],
        }
        renders: Dict[str, List[np.ndarray]] = {}
        s_val = getattr(self.renderer, "s_val", self.s_start)
        self._eval_fwd()  # build the scale-1 jit up front

        for i in self.tqdm(img_idxes, desc="eval", leave=False):
            data = self.test_dataset[int(i)]
            n = len(data["rgbs"])
            em = int(np.asarray(data["em_modes"]).reshape(-1)[0])
            pos_rt = jnp.asarray(data["poses"][:3, :3])
            results: Dict[str, List[np.ndarray]] = {}
            for st in range(0, n, self.eval_bs):
                en = min(st + self.eval_bs, n)
                ro, rd, vd = self.place_ray_chunk(
                    data["rays_o"][st:en], data["rays_d"][st:en],
                    data["viewdirs"][st:en],
                )
                out = self.eval_chunk_retry(
                    self._eval_fwd, self.params, ro, rd, vd,
                    jnp.int32(em), pos_rt, jnp.float32(s_val),
                )
                ovf = out.pop("etc/overflow", None)
                if ovf is not None:
                    self.track_overflow(ovf)
                pbr_pts = out.pop("pbr_points", None)
                if pbr_pts is not None:
                    out.update(
                        self._decompose_pbr(pbr_pts, en - st, jnp.float32(s_val))
                    )
                for k, v in out.items():
                    results.setdefault(k, []).append(np.asarray(v))

            def to_img(chunks):
                a = np.concatenate(chunks, 0).reshape(height, width, -1)
                return a[..., 0] if a.shape[-1] == 1 else a

            imgs = {k: to_img(v) for k, v in results.items()}
            imgs = self._pre_composite_hook(imgs, data, metrics)
            wbg = imgs["etc/white_bg"] * self.white_bg
            final = {}
            for k, v in imgs.items():
                if k == "etc/white_bg":
                    final[k] = np.clip(v, 0.0, 1.0)
                    continue
                add = wbg[..., None] if v.ndim == 3 else wbg
                if k.startswith("lin/"):
                    final[f"{k}_gamma"] = np.asarray(
                        apply_gamma_curve(jnp.clip(v + add, 0.0, 1.0))
                    )
                    final[k] = np.clip(v + add, 0.0, None)
                else:
                    final[k] = np.clip(v + add, 0.0, 1.0)
            imgs = final

            hdrs = data["hdrs"].reshape(height, width, 3)
            rgbs = data["rgbs"].reshape(height, width, 3)
            pred = imgs["srgb/rgb"]
            lin_org = imgs["lin/rgb"]
            lin_gamma = imgs["lin/rgb_gamma"]

            for mode in ["off", "on"]:
                if LightDict[mode] == em:
                    metrics[f"lin/MSE_EXR_{mode}"].append(
                        float(((lin_org - hdrs) ** 2).mean())
                    )
                else:
                    metrics[f"lin/MSE_EXR_{mode}"].append(None)

            mse = float(((pred - rgbs) ** 2).mean())
            lin_mse = float(((lin_gamma - rgbs) ** 2).mean())
            metrics["srgb/MSE"].append(mse)
            metrics["lin/MSE"].append(lin_mse)
            metrics["srgb/PSNR"].append(loss2psnr(mse))
            metrics["lin/PSNR"].append(loss2psnr(lin_mse))
            metrics["srgb/SSIM"].append(rgb_ssim(pred, rgbs, 1))
            metrics["lin/SSIM"].append(rgb_ssim(lin_gamma, rgbs, 1))
            metrics["srgb/LPIPS_ALEX"].append(rgb_lpips(rgbs, pred, "alex"))
            metrics["lin/LPIPS_ALEX"].append(rgb_lpips(rgbs, lin_gamma, "alex"))

            trunc = self.pop_eval_truncation()
            metrics.setdefault("etc/truncated_frac", []).append(
                trunc if trunc > 0 else None
            )
            if trunc > 0:
                print(f"[eval] image {int(i)}: render TRUNCATED "
                      f"(overflow {trunc:.4f} at max budget scale)")

            for k, v in imgs.items():
                renders.setdefault(k, []).append(
                    (np.clip(v, 0, 1) * 255).astype(np.uint8)
                )

        self._scene_extra_images(dirs)

        verts, tris = self.renderer.extract_geometry(
            self.params, batch_size=self.eval_bs,
            resolution=min(512, 4 * max(self.renderer.geo.world_size)),
        )
        scale_mat = np.asarray(self.test_dataset.scale_mat)
        verts = verts * scale_mat[0, 0] + scale_mat[:3, 3][None]
        meshutil.export_ply(os.path.join(dirs["mesh"], "mesh.ply"), verts, tris)
        scn_metrics = {}
        if hasattr(self.test_dataset, "pcd") and self.test_dataset.pcd is not None:
            _, _, mean_cd = DTU_CD(verts, tris, *self.test_dataset.pcd)
            scn_metrics["mesh/CD"] = mean_cd

        compact = {
            k: [x for x in v if x is not None] for k, v in metrics.items()
        }
        compact = {k: v for k, v in compact.items() if v}
        self.save_renders(
            dirs, renders,
            {k: v for k, v in compact.items() if len(v) == len(img_idxes)},
        )
        self.log_eval(self.test_dataset.phase + "/", {**compact, **{
            k: [v] for k, v in scn_metrics.items()
        }})
