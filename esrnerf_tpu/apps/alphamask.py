"""Stage 1 trainer: AlphaMask (low-res DVGO occupancy pretraining).

Behavioral port of ``app/coarse/alphamask.py:25-465``: camera-frustum bbox,
near-camera voxel masking, view-count per-voxel LR, MSE + last-alpha entropy
+ per-point-rgb losses, exponential LR decay — all fused into a single
jitted train step with the batch sharded over the data mesh.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.apps.base import AppClass, import_class
from esrnerf_tpu.config import save_cfg
from esrnerf_tpu.data.sampler import BatchSampler
from esrnerf_tpu.models.dvgo import DVGO
from esrnerf_tpu.optim import Adam, exp_decay_factor
from esrnerf_tpu.optim.adam import make_pervoxel_lr
from esrnerf_tpu.utils import checkpoint as ckpt_io
from esrnerf_tpu.utils.metrics import loss2psnr, rgb_lpips, rgb_ssim


class AlphaMask(AppClass):
    def __init__(self, cfg):
        super().__init__(cfg)
        tr = cfg.app["trainer"]
        self.train_bs = tr["batch_size"]
        self.n_iters = tr["n_iters"]
        self.lr_decay = tr["lr_decay"]
        self.lrs = dict(tr["lrs"])
        self.world_bound_scale = tr["world_bound_scale"]
        self.weight_entropy_last = tr["weight_entropy_last"]
        self.weight_rgbper = tr["weight_rgbper"]
        self.vis_every = tr["vis_every"]
        self.N_vis = tr["N_vis"]
        self.save_every = tr["save_every"]
        self.save_all = tr["save_all"]
        self.data_keys = ["rgbs", "rays_o", "rays_d", "em_modes"]
        self.eval_bs = cfg.app["eval"]["batch_size"]

    # ---------------------------------------------------------------- data

    def load_dataset(self) -> None:
        assert self.phase in ("train", "test_nv"), (
            "AlphaMask supports train/test_nv only"
        )
        data_cls = import_class("esrnerf_tpu.data." + self.cfg.data["cls"])
        if self.phase == "train":
            self.train_dataset = data_cls(self.cfg, "train")
            self.test_dataset = data_cls(self.cfg, "test_nv")
        else:
            self.test_dataset = data_cls(self.cfg, self.phase)

    # --------------------------------------------------------------- model

    def load_model(self) -> None:
        if self.phase == "train":
            self.load_train_model()
        else:
            self.load_eval_model()

    def _compute_bbox(self, data) -> tuple:
        """Camera-frustum bbox (reference alphamask.py:108-127)."""
        near, far = self.train_dataset.near_far
        ro = data["rays_o"].reshape(-1, 3)
        vd = data["viewdirs"].reshape(-1, 3)
        pts = np.concatenate([ro + vd * near, ro + vd * far], 0)
        xyz_min = pts.min(0)
        xyz_max = pts.max(0)
        if abs(self.world_bound_scale - 1) > 1e-9:
            shift = (xyz_max - xyz_min) * (self.world_bound_scale - 1) / 2
            xyz_min -= shift
            xyz_max += shift
        return xyz_min, xyz_max

    def load_train_model(self) -> None:
        ckpt, is_resume = self.resolve_train_ckpt()
        data = self.train_dataset.all_data
        near, far = self.train_dataset.near_far

        if ckpt is None:
            self.global_step = 0
            xyz_min, xyz_max = self._compute_bbox(data)
            self.renderer = DVGO(self.cfg, near, far, xyz_min, xyz_max)
            params = self.renderer.init_params()

            w, h = self.train_dataset.image_size
            wh = w * h
            rays_o = data["rays_o"].reshape(-1, wh, 3)
            rays_d = data["rays_d"].reshape(-1, wh, 3)
            params = self.renderer.maskout_near_cam_vox(
                params, jnp.asarray(rays_o[:, 0])
            )
            cnt = self.renderer.voxel_count_views(rays_o, rays_d, self.eval_bs)
            density = jnp.where(cnt <= 2, -100.0, params["density"])
            params = {**params, "density": density}
            self.params = params

            self.opt = Adam(self.lrs)
            self.opt_state = self.opt.init(params)
            self.per_lr = {"density": make_pervoxel_lr(cnt)}
            self.lr_scale = 1.0

            self.sampler = BatchSampler(
                self.cfg, data, self.data_keys, self.train_bs,
                seed=self.cfg.system["seed"],
            )
            self.sampler.shuffle()
        elif not is_resume:
            raise NotImplementedError("alphamask has no pretrain handoff")
        else:
            params_ckpt = ckpt_io.load_checkpoint(ckpt)
            r = params_ckpt["renderer"]
            t = params_ckpt["trainer"]
            self.global_step = t["global_step"] + 1
            self.renderer = DVGO(self.cfg, r["near"], r["far"], r["xyz_min"],
                                 r["xyz_max"])
            self.params = jax.tree.map(jnp.asarray, r["params"])
            self.opt = Adam(self.lrs)
            self.opt_state = jax.tree.map(jnp.asarray, t["optimizer"])
            self.per_lr = jax.tree.map(jnp.asarray, t["per_lr"])
            self.lr_scale = t["lr_scale"]
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
        self.renderer = DVGO(self.cfg, r["near"], r["far"], r["xyz_min"],
                             r["xyz_max"])
        self.params = jax.tree.map(jnp.asarray, r["params"])
        print(f"loaded ckpt {ckpt} @ step {self.global_step}")

    # ---------------------------------------------------------------- train

    def _build_train_step(self):
        model = self.renderer
        w_ent = self.weight_entropy_last
        w_rgbper = self.weight_rgbper
        white_bg = self.white_bg
        opt = self.opt
        sh = self.shard_helpers()
        self.check_shardable(self.train_bs)

        def train_step(params, opt_state, batch, lr_scale, per_lr, key):
            key = sh.fold_key(key)

            def loss_fn(p):
                res = model.forward_training(
                    p, batch["rays_o"], batch["rays_d"], batch["em_modes"], key
                )
                pred = jnp.clip(
                    res["srgb/rgb"] + res["etc/white_bg"] * white_bg, 0.0, 1.0
                )
                mse = sh.gmean((pred - batch["rgbs"]) ** 2)
                loss = mse

                # DVGO alphainv_cum is [N, S+1]: per-ray last transmittance
                pout = jnp.clip(res["etc/alphainv_cum"][..., -1], 1e-6, 1 - 1e-6)
                ent = sh.gmean(
                    -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout))
                )
                loss = loss + w_ent * ent

                rgbper = ((res["srgb/raw_rgb"] - batch["rgbs"][:, None, :]) ** 2).sum(-1)
                rgbper_loss = sh.gmean(
                    (rgbper * jax.lax.stop_gradient(res["etc/weights"])).sum(-1)
                )
                loss = loss + w_rgbper * rgbper_loss
                return loss, mse

            (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = sh.gsum(grads)
            scales = {g: lr_scale for g in params}
            params, opt_state = opt.step(
                params, grads, opt_state, lr_scales=scales, per_lr=per_lr
            )
            return params, opt_state, mse

        return self.wrap_train_step(train_step)

    def process(self) -> None:
        if self.phase == "train":
            self.learn()
        else:
            self.evaluate()

    def learn(self) -> None:
        decay = exp_decay_factor(self.lr_decay)
        self.params = self.place_replicated(self.params)
        self.opt_state = self.place_replicated(self.opt_state)
        train_step = self._build_train_step()
        ckpt_dir = self.ckpt_dir()
        ckpt_path = os.path.join(ckpt_dir, "last.ckpt")
        logger = self.get_logger()

        key = jax.random.PRNGKey(self.cfg.system["seed"])
        key = jax.random.fold_in(key, self.global_step)
        logs: Dict[str, List[float]] = {"srgb/MSE": [], "srgb/PSNR": []}

        pbar = self.tqdm(range(self.global_step, self.n_iters), colour="green")
        for self.global_step in pbar:
            batch = self.place_batch(self.sampler.sample())
            key, sub = jax.random.split(key)
            self.params, self.opt_state, mse = train_step(
                self.params, self.opt_state, batch,
                jnp.float32(self.lr_scale), self.per_lr, sub,
            )
            self.lr_scale *= decay

            tqdm_iters = self.cfg.system["tqdm_iters"]
            if self.global_step % tqdm_iters == 0:
                mse_f = float(mse)
                logs["srgb/MSE"].append(mse_f)
                logs["srgb/PSNR"].append(loss2psnr(mse_f))
                m = float(np.mean(logs["srgb/MSE"]))
                p = float(np.mean(logs["srgb/PSNR"]))
                logs = {"srgb/MSE": [], "srgb/PSNR": []}
                if hasattr(pbar, "set_description"):
                    pbar.set_description(
                        f"Iter {self.global_step:05d} (s) psnr = {p:.2f} mse = {m:.6f}"
                    )
                logger.log(
                    # DVGO's dense march has no compaction budget, so its
                    # overflow is identically 0 — logged for a uniform
                    # metric schema across the five stages
                    {"train/metric/srgb/MSE": m, "train/metric/srgb/PSNR": p,
                     "train/metric/etc/overflow": 0.0},
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
                    "params": self.params,
                },
                "trainer": {
                    "global_step": self.global_step,
                    **self.sampler.state(),
                    "optimizer": self.opt_state,
                    "per_lr": self.per_lr,
                    "lr_scale": self.lr_scale,
                },
            },
        )

    # ----------------------------------------------------------------- eval

    def evaluate(self, N_vis: int = -1) -> None:
        dirs = self.eval_dirs()
        img_idxes = self.eval_img_idxes(len(self.test_dataset), N_vis)
        width, height = self.test_dataset.image_size

        metrics: Dict[str, List[float]] = {
            "srgb/MSE": [], "srgb/PSNR": [], "srgb/SSIM": [],
            "srgb/LPIPS_ALEX": [],
        }
        renders: Dict[str, List[np.ndarray]] = {}

        fwd = self.cached_jit(
            "eval_fwd", lambda: jax.jit(self.renderer.forward_evaluate)
        )

        for i in self.tqdm(img_idxes, desc="eval", leave=False):
            data = self.test_dataset[int(i)]
            n = len(data["rgbs"])
            results: Dict[str, List[np.ndarray]] = {}
            em = int(np.asarray(data["em_modes"]).reshape(-1)[0])
            for st in range(0, n, self.eval_bs):
                en = min(st + self.eval_bs, n)
                ro, rd = self.place_ray_chunk(
                    data["rays_o"][st:en], data["rays_d"][st:en]
                )
                out = fwd(self.params, ro, rd, jnp.int32(em))
                for k, v in out.items():
                    results.setdefault(k, []).append(np.asarray(v))

            def to_img(chunks):
                a = np.concatenate(chunks, 0).reshape(height, width, -1)
                return a[..., 0] if a.shape[-1] == 1 else a

            imgs = {k: to_img(v) for k, v in results.items()}
            wbg = imgs["etc/white_bg"] * self.white_bg
            for k in imgs:
                if k != "etc/white_bg":
                    add = wbg[..., None] if imgs[k].ndim == 3 else wbg
                    imgs[k] = np.clip(imgs[k] + add, 0.0, 1.0)
                else:
                    imgs[k] = np.clip(imgs[k], 0.0, 1.0)

            rgbs = data["rgbs"].reshape(height, width, 3)
            pred = imgs["srgb/rgb"]
            mse = float(((pred - rgbs) ** 2).mean())
            metrics["srgb/MSE"].append(mse)
            metrics["srgb/PSNR"].append(loss2psnr(mse))
            metrics["srgb/SSIM"].append(rgb_ssim(pred, rgbs, 1))
            metrics["srgb/LPIPS_ALEX"].append(rgb_lpips(rgbs, pred, "alex"))

            for k, v in imgs.items():
                renders.setdefault(k, []).append(
                    (np.clip(v, 0, 1) * 255).astype(np.uint8)
                )

        self.save_renders(dirs, renders, metrics)
        self.log_eval(self.test_dataset.phase + "/", metrics)
