"""Stage 2 trainer: Coarse (VoxurfC SDF pretraining).

Behavioral port of ``app/coarse/coarse.py:28-638``: bbox shrunk from the
alphamask density, ray filtering against the mask cache, NeuS sharpness
schedule, MSE + entropy + TV(sdf/smooth-grad) + TV(color) losses, per-group
scheduled LR decays and TV-weight updates, mesh extraction at eval.
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
from esrnerf_tpu.models.voxurf_base import make_mask_cache
from esrnerf_tpu.models.voxurfc import VoxurfC
from esrnerf_tpu.optim import Adam, exp_decay_factor
from esrnerf_tpu.utils import checkpoint as ckpt_io
from esrnerf_tpu.utils import mesh as meshutil
from esrnerf_tpu.utils.metrics import DTU_CD, loss2psnr, rgb_lpips, rgb_ssim


def compute_bbox_by_coarse_geo(
    mask_xyz_min, mask_xyz_max, density, act_shift, bbox_thres
):
    """Shrink the scene bbox to voxels whose alpha exceeds bbox_thres
    (reference coarse.py:152-187). density: [X,Y,Z,1] numpy."""
    X, Y, Z, _ = density.shape
    interp = np.stack(
        np.meshgrid(
            np.linspace(0, 1, X), np.linspace(0, 1, Y), np.linspace(0, 1, Z),
            indexing="ij",
        ),
        -1,
    )
    dense_xyz = mask_xyz_min * (1 - interp) + mask_xyz_max * interp
    alpha = 1 - np.exp(
        -np.logaddexp(0, density[..., 0] + act_shift)
    )  # softplus-based activation, interval=1 (dvgo.py:137-138)
    mask = alpha > bbox_thres
    active = dense_xyz[mask]
    return active.min(0), active.max(0)


class Coarse(AppClass):
    STAGE_CLS = "coarse.Coarse"
    PREV_CLS = "coarse.AlphaMask"

    def __init__(self, cfg):
        super().__init__(cfg)
        tr = cfg.app["trainer"]
        self.world_bound_scale = tr["world_bound_scale"]
        self.bbox_thres = tr["bbox_thres"]
        self.s_start = tr["s_start"]
        self.s_inv_ratio = tr["s_inv_ratio"]
        self.step_start = tr["step_start"]
        self.step_end = tr["step_end"]
        self.train_bs = tr["batch_size"]
        self.n_iters = tr["n_iters"]
        self.lrs = dict(tr["lrs"])
        self.lr_decay = tr["lr_decay"]
        self.decay_steps = {int(k): dict(v) for k, v in tr["decay_steps"].items()}
        self.weight_entropy_last = tr["weight_entropy_last"]
        self.weight_tv_density = tr["weight_tv_density"]
        self.weight_tv_color = tr["weight_tv_color"]
        self.tvs = dict(tr["tvs"])
        self.tv_updates = {int(k): dict(v) for k, v in tr["tv_updates"].items()}
        self.tv_from = tr["tv_from"]
        self.tv_end = tr["tv_end"]
        self.tv_every = tr["tv_every"]
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
        assert self.phase in ("train", "test_nv")
        data_cls = import_class("esrnerf_tpu.data." + self.cfg.data["cls"])
        if self.phase == "train":
            self.train_dataset = data_cls(self.cfg, "train")
            self.test_dataset = data_cls(self.cfg, "test_nv")
        else:
            self.test_dataset = data_cls(self.cfg, self.phase)

    # ---------------------------------------------------------------- model

    def _build_renderer(self, meta: dict, s_val: float) -> VoxurfC:
        mask_meta = {
            "mask_xyz_min": meta["mask_xyz_min"],
            "mask_xyz_max": meta["mask_xyz_max"],
            "mask_alpha_init": meta["mask_alpha_init"],
            "mask_density": meta["mask_density"],
        }
        mask_cache = make_mask_cache(
            meta["mask_density"], meta["mask_xyz_min"], meta["mask_xyz_max"],
            meta["mask_alpha_init"], self.cfg.app.model["maskcache_thres"],
            self.cfg.app.model["mask_ks"],
        )
        return VoxurfC(
            self.cfg, meta["near"], meta["far"], meta["xyz_min"],
            meta["xyz_max"], mask_cache, s_val, mask_meta,
        )

    def load_model(self) -> None:
        if self.phase == "train":
            self.load_train_model()
        else:
            self.load_eval_model()

    def load_train_model(self) -> None:
        ckpt, is_resume = self.resolve_train_ckpt()
        if ckpt is None:
            # previous-stage handoff by class-name path substitution
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
            mask_alpha_init = r["cfg"]["app"]["model"]["alpha_init"]
            mask_density = np.asarray(r["params"]["density"])
            act_shift = float(np.log(1 / (1 - mask_alpha_init) - 1))

            xyz_min, xyz_max = compute_bbox_by_coarse_geo(
                np.asarray(r["xyz_min"]), np.asarray(r["xyz_max"]),
                mask_density, act_shift, self.bbox_thres,
            )
            if abs(self.world_bound_scale - 1) > 1e-9:
                shift = (xyz_max - xyz_min) * (self.world_bound_scale - 1) / 2
                xyz_min = xyz_min - shift
                xyz_max = xyz_max + shift

            meta = {
                "near": r["near"], "far": r["far"],
                "xyz_min": xyz_min, "xyz_max": xyz_max,
                "mask_xyz_min": np.asarray(r["xyz_min"]),
                "mask_xyz_max": np.asarray(r["xyz_max"]),
                "mask_alpha_init": mask_alpha_init,
                "mask_density": mask_density,
            }
            self.renderer = self._build_renderer(meta, self.s_start)
            self.params = self.renderer.init_params(
                jax.random.PRNGKey(self.cfg.system["seed"])
            )
            self.opt = Adam(self.lrs)
            self.opt_state = self.opt.init(self.params)
            self.lr_scales = {k: 1.0 for k in self.lrs}

            keep = self.renderer.geo.filter_rays_in_maskcache(
                data["rays_o"], data["rays_d"], self.eval_bs
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
            self.renderer = self._build_renderer(r, r["s_val"])
            self.params = jax.tree.map(jnp.asarray, r["params"])
            self.opt = Adam(self.lrs)
            self.opt_state = jax.tree.map(jnp.asarray, t["optimizer"])
            self.lr_scales = dict(t["lr_scales"])
            self.tvs = dict(t["tvs"])
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
        self.renderer = self._build_renderer(r, r["s_val"])
        self.params = jax.tree.map(jnp.asarray, r["params"])
        print(f"loaded ckpt {ckpt} @ step {self.global_step}")

    # ---------------------------------------------------------------- train

    def _build_train_step(self):
        model = self.renderer
        opt = self.opt
        w_ent = self.weight_entropy_last
        w_tvd = self.weight_tv_density
        w_tvc = self.weight_tv_color
        white_bg = self.white_bg

        sh = self.shard_helpers()
        self.check_shardable(self.train_bs)

        def train_step(params, opt_state, batch, s_val, lr_scales, tv_flag,
                       sdf_tv, smooth_grad_tv):
            def loss_fn(p):
                res = model.forward_training(
                    p, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
                    batch["em_modes"], s_val,
                )
                pred = jnp.clip(
                    res["srgb/rgb"] + res["etc/white_bg"] * white_bg, 0.0, 1.0
                )
                mse = sh.gmean((pred - batch["rgbs"]) ** 2)
                loss = mse

                # NB: the reference indexes [..., -1] into the [N]-shaped
                # alphainv_last, reducing the entropy term to the last ray
                # only (coarse.py:348-352) — replicated for parity (the
                # glast keeps it the *global* last ray when sharded).
                pout = jnp.clip(res["etc/alphainv_cum"][..., -1], 1e-6, 1 - 1e-6)
                ent = sh.glast(
                    -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)).mean()
                )
                loss = loss + w_ent * ent

                tv = model.density_total_variation(p, sdf_tv, smooth_grad_tv)
                tv_loss = w_tvd * tv + w_tvc * model.color_total_variation(p)
                loss = loss + tv_flag * tv_loss / sh.n
                return loss, (mse, res["etc/overflow"],
                              res["etc/k1_frac"], res["etc/k2_frac"])

            (loss, (mse, ovf, k1f, k2f)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            grads = sh.gsum(grads)
            params, opt_state = opt.step(
                params, grads, opt_state, lr_scales=lr_scales
            )
            return params, opt_state, (mse, sh.gmax(ovf),
                                       sh.gmax(k1f), sh.gmax(k2f))

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
        logs: Dict[str, List[float]] = {"srgb/MSE": [], "srgb/PSNR": []}

        tune_step = self.global_step
        pbar = self.tqdm(range(self.global_step, self.n_iters), colour="green")
        for self.global_step in pbar:
            batch = self.place_batch(self.sampler.sample())
            s_val = self.s_val_at(self.global_step)
            self.renderer.s_val = s_val
            tv_on = (
                self.tv_from < self.global_step < self.tv_end
                and self.global_step % self.tv_every == 0
            )
            self.params, self.opt_state, (mse, ovf, k1f, k2f) = train_step(
                self.params, self.opt_state, batch, jnp.float32(s_val),
                {k: jnp.float32(v) for k, v in self.lr_scales.items()},
                jnp.float32(1.0 if tv_on else 0.0),
                jnp.float32(self.tvs["sdf"]), jnp.float32(self.tvs["smooth_grad"]),
            )

            if self.global_step == tune_step and self.maybe_autotune_budgets(
                {"k1": float(k1f), "k2": float(k2f)}
            ):
                train_step = self._build_train_step()

            for k in self.lr_scales:
                self.lr_scales[k] *= decay
            if self.global_step in self.decay_steps:
                for k, v in self.decay_steps[self.global_step].items():
                    self.lr_scales[k] *= v
            if self.global_step in self.tv_updates:
                self.tvs.update(self.tv_updates[self.global_step])

            if self.global_step % self.cfg.system["tqdm_iters"] == 0:
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
                    {"train/metric/srgb/MSE": m, "train/metric/srgb/PSNR": p,
                     "train/metric/etc/overflow": self.track_overflow(ovf),
                     "train/metric/etc/k1_frac": float(k1f),
                     "train/metric/etc/k2_frac": float(k2f)},
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
                    "tvs": dict(self.tvs),
                    "lr_scales": dict(self.lr_scales),
                    "optimizer": self.opt_state,
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
        s_val = getattr(self.renderer, "s_val", self.s_start)

        def fwd_for_scale(budget_scale: int = 1):
            def build():
                renderer = self.renderer
                # fresh closure: equal bound methods share jit's trace cache
                fn = jax.jit(lambda *a: renderer.forward_evaluate(*a))
                if budget_scale == 1:
                    return fn

                def scaled(*args):
                    with self.scaled_budgets(budget_scale):
                        return fn(*args)

                return scaled

            return self.cached_jit("eval_fwd", build,
                                   key_extra=(budget_scale,))

        fwd_for_scale(1)

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
                    fwd_for_scale, self.params, ro, rd, vd,
                    jnp.int32(em), pos_rt, jnp.float32(s_val),
                )
                ovf = out.pop("etc/overflow", None)
                if ovf is not None:
                    self.track_overflow(ovf)
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

        # mesh extraction + optional DTU Chamfer (reference coarse.py:549-563)
        verts, tris = self.renderer.extract_geometry(
            self.params, batch_size=self.eval_bs,
            resolution=min(512, 4 * max(self.renderer.geo.world_size)),
        )
        scale_mat = np.asarray(self.test_dataset.scale_mat)
        verts = verts * scale_mat[0, 0] + scale_mat[:3, 3][None]
        meshutil.export_ply(os.path.join(dirs["mesh"], "mesh.ply"), verts, tris)
        if hasattr(self.test_dataset, "pcd") and self.test_dataset.pcd is not None:
            _, _, mean_cd = DTU_CD(verts, tris, *self.test_dataset.pcd)
            metrics["mesh/CD"] = [mean_cd]

        self.save_renders(
            dirs, renders,
            {k: v for k, v in metrics.items() if len(v) == len(img_idxes)},
        )
        self.log_eval(self.test_dataset.phase + "/", metrics)
