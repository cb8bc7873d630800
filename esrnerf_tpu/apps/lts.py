"""Stage 4 trainer: LTS — light-transport-segment inverse rendering.

Behavioral port of ``app/fine/lts.py:28-753``: warm-start the ESRNeRF model
from the fine checkpoint (overlapping params only, like strict=False),
optional ``brdf_color_init``, fixed NeuS sharpness (step_end=0), losses
sRGB MSE + linear + weight_lts * (MSE(off, off_hat) + MSE(emo, emo_hat)) +
entropy + normal-smooth L1 + TV; RayGroupManager sampler with certain
batch 0; eval adds the SG envmap render and (optionally) the chunked PBR
decomposition.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.apps.fine import Fine
from esrnerf_tpu.data.sampler import RayGroupManager
from esrnerf_tpu.models.esrnerf import ESRNeRF
from esrnerf_tpu.optim import Adam, CosineLR
from esrnerf_tpu.ops.image import apply_gamma_curve
from esrnerf_tpu.utils import checkpoint as ckpt_io
from esrnerf_tpu.utils.metrics import loss2psnr


def masked_mse(a, b, valid, gsum=lambda x: x):
    """Count-normalized masked MSE; pass ``gsum`` (cross-shard psum) so the
    numerator AND denominator are global under shard_map — mean-of-shard-
    means would drift when valid counts are unbalanced."""
    v = valid[:, None].astype(a.dtype)
    n = jnp.maximum(gsum(v.sum()) * a.shape[-1], 1.0)
    return gsum((((a - b) ** 2) * v).sum()) / n


class LTS(Fine):
    STAGE_CLS = "fine.LTS"
    PREV_CLS = "fine.Fine"
    MODEL_CLS = ESRNeRF

    def __init__(self, cfg):
        # Fine reads keys LTS doesn't have (pg_scale etc.) — fill defaults
        tr = cfg.app["trainer"]
        tr.setdefault("sdf_reduce", 1.0)
        tr.setdefault("num_voxels", 0)
        tr.setdefault("pg_scale", [])
        tr.setdefault("scale_ratio", 1.0)
        super().__init__(cfg)
        self.brdf_color_init = tr["brdf_color_init"]
        self.weight_lts = tr["weight_lts"]
        self.weight_normal_smooth = tr["weight_normal_smooth"]
        self.normal_eps = tr["normal_eps"]
        self.emit_eps = tr["emit_eps"]
        self.render_pbr = cfg.app["eval"]["render_pbr"]
        self.chunk_sz = cfg.app["eval"]["chunk_size"]
        self.envmap_height = cfg.app["eval"]["envmap_height"]
        self.envmap_width = cfg.app["eval"]["envmap_width"]

    # ---------------------------------------------------------------- model

    def _init_params(self, prev: dict) -> dict:
        """Fresh ESRNeRF params, overlapping groups warm-started from the
        fine checkpoint (reference lts.py:176-179, strict=False load)."""
        params = self.renderer.init_params(
            jax.random.PRNGKey(self.cfg.system["seed"])
        )
        prev_params = prev["renderer"]["params"]
        for k in params:
            if k in prev_params:
                params[k] = jax.tree.map(jnp.asarray, prev_params[k])
        if self.brdf_color_init:
            params["brdf"] = jnp.asarray(prev_params["off_color"])
        return params

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
            self.renderer = self._build_renderer(r, r["s_val"], r["num_voxels"])
            self.params = self._init_params(prev)
            self.opt = Adam(self.lrs)
            self.opt_state = self.opt.init(self.params)
            self.lr_scales = {k: 1.0 for k in self.lrs}
            self.lr_scheduler = CosineLR.from_cfg(self.cfg, 0)
            self.sampler = self._make_sampler(
                data, uncert_data_idxs=prev["trainer"]["data_idxs"]
            )
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
            self.sampler = self._resume_sampler(data, t)
            print(f"resume training from step {self.global_step}")

    def _make_sampler(self, data, uncert_data_idxs):
        return RayGroupManager(
            self.cfg, data, self.data_keys, self.train_bs, 0,
            uncert_data_idxs=uncert_data_idxs, seed=self.cfg.system["seed"],
        )

    def _resume_sampler(self, data, t):
        return RayGroupManager(
            self.cfg, data, self.data_keys, self.train_bs, 0,
            uncert_batch_st=t["batch_st"],
            uncert_data_idxs=t["data_idxs"], seed=self.cfg.system["seed"],
        )

    # ---------------------------------------------------------------- train

    def _build_train_step(self):
        model = self.renderer
        opt = self.opt
        w_ent = self.weight_entropy_last
        w_lin = self.weight_linear
        w_lts = self.weight_lts
        w_nsm = self.weight_normal_smooth
        white_bg = self.white_bg
        normal_eps = self.normal_eps
        emit_eps = self.emit_eps

        sh = self.shard_helpers()
        self.check_shardable(self.train_bs)
        # shard the LTS fan-out: each shard selects its slice of the
        # num_ltspts surface points from its local march
        model.lts_points_divisor = sh.n

        def train_step(params, opt_state, batch, s_val, lr_scales, tv_flag,
                       smooth_grad_tv, sdf_tv_w, tv_dense, rng):
            rng = sh.fold_key(rng)

            def loss_fn(p):
                res = model.forward_training(
                    p, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
                    batch["em_modes"], batch["uncert_masks"], s_val,
                    normal_eps, emit_eps, rng,
                )
                wbg = res["etc/white_bg"] * white_bg
                srgb = jnp.clip(res["srgb/rgb"] + wbg, 0.0, 1.0)
                lin = jnp.clip(res["lin/rgb"] + wbg, 0.0, None)
                rgbs = batch["rgbs"]
                mse = sh.gmean((srgb - rgbs) ** 2)

                lin_tone = jnp.where(rgbs >= 1, jnp.clip(lin, None, 1.0), lin)
                lin_mse = sh.gmean((apply_gamma_curve(lin_tone) - rgbs) ** 2)
                loss = mse + w_lin * lin_mse

                lv = res["lin/pbr/valid"]
                off_l = masked_mse(
                    res["lin/pbr/off"], res["lin/pbr/off_hat"], lv, sh.gsum
                )
                emo_l = masked_mse(
                    res["lin/pbr/emo"], res["lin/pbr/emo_hat"], lv, sh.gsum
                )
                loss = loss + w_lts * (off_l + emo_l)

                pout = jnp.clip(res["etc/alphainv_cum"][..., -1], 1e-6, 1 - 1e-6)
                ent = sh.glast(
                    -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)).mean()
                )
                loss = loss + w_ent * ent

                # normal smoothness on the per-point expected gradients,
                # masked to real samples (reference lts.py:391-393)
                pv = res["etc/point_valid"][:, None].astype(jnp.float32)
                nsm = sh.gsum(
                    (jnp.abs(res["etc/normal"] - res["etc/normal_eps"]) * pv).sum()
                ) / jnp.maximum(sh.gsum(pv.sum()) * 3, 1.0)
                loss = loss + w_nsm * nsm

                loss = loss + tv_flag * model.density_total_variation(
                    p, smooth_grad_tv
                ) / sh.n
                return loss, (mse, lin_mse, off_l, emo_l, res["etc/overflow"],
              res["etc/k1_frac"], res["etc/k2_frac"],
              res["etc/k1_frac_2nd"], res["etc/k2_frac_2nd"])

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            grads = sh.gsum(grads)
            mse, lin_mse, off_l, emo_l, ovf, k1f, k2f, k1f2, k2f2 = aux
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
            return params, opt_state, (mse, lin_mse, off_l, emo_l,
                                       sh.gmax(ovf), sh.gmax(k1f),
                                       sh.gmax(k2f), sh.gmax(k1f2),
                                       sh.gmax(k2f2))

        return self.wrap_train_step(train_step)

    def learn(self) -> None:
        from esrnerf_tpu.config import save_cfg

        self.params = self.place_replicated(self.params)
        self.opt_state = self.place_replicated(self.opt_state)
        train_step = self._build_train_step()
        ckpt_dir = self.ckpt_dir()
        ckpt_path = os.path.join(ckpt_dir, "last.ckpt")
        logger = self.get_logger()
        logs: Dict[str, List[float]] = {
            "srgb/MSE": [], "srgb/PSNR": [], "lin/MSE": [], "lin/PSNR": [],
            "lin/pbr/off_MSE": [], "lin/pbr/emo_MSE": [],
        }
        key = jax.random.PRNGKey(self.cfg.system["seed"])
        key = jax.random.fold_in(key, self.global_step)

        tune_step = self.global_step
        pbar = self.tqdm(range(self.global_step, self.n_iters), colour="green")
        for self.global_step in pbar:
            self.on_step_begin()
            batch = self.place_batch(self.sampler.sample())
            s_val = self.s_val_at(self.global_step)
            self.renderer.s_val = s_val
            tv_on = (
                self.tv_from < self.global_step < self.tv_end
                and self.global_step % self.tv_every == 0
            )
            key, sub = jax.random.split(key)
            self.params, self.opt_state, aux = train_step(
                self.params, self.opt_state, batch, jnp.float32(s_val),
                {k: jnp.float32(v) for k, v in self.lr_scales.items()},
                jnp.float32(1.0 if tv_on else 0.0),
                jnp.float32(self.tvs["smooth_grad"]),
                jnp.float32(
                    self.weight_tv_density * self.tvs["sdf"] / self.train_bs
                ),
                jnp.bool_(self.global_step < self.tv_dense_before), sub,
            )
            mse, lin_mse, off_l, emo_l, ovf, k1f, k2f, k1f2, k2f2 = aux

            if self.global_step == tune_step and self.maybe_autotune_budgets(
                {"k1": float(k1f), "k2": float(k2f),
                 "k1_2nd": float(k1f2), "k2_2nd": float(k2f2)}
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
                logs["lin/pbr/off_MSE"].append(float(off_l))
                logs["lin/pbr/emo_MSE"].append(float(emo_l))
                means = {k: float(np.mean(v)) for k, v in logs.items()}
                logs = {k: [] for k in logs}
                if hasattr(pbar, "set_description"):
                    pbar.set_description(
                        f"Iter {self.global_step:05d} (s) psnr = "
                        f"{means['srgb/PSNR']:.2f} (p) env = "
                        f"{means['lin/pbr/off_MSE']:.5f} em = "
                        f"{means['lin/pbr/emo_MSE']:.5f}"
                    )
                means["etc/overflow"] = self.track_overflow(ovf)
                means["etc/k1_frac"] = float(k1f)
                means["etc/k2_frac"] = float(k2f)
                means["etc/k1_frac_2nd"] = float(k1f2)
                means["etc/k2_frac_2nd"] = float(k2f2)
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

    def on_step_begin(self) -> None:
        """Hook for PDRA's periodic ray-group updates."""

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
                    "batch_st": self.sampler.uncert_batch_st,
                    "data_idxs": self.sampler.uncert_data_idxs,
                    "lr_scales": dict(self.lr_scales),
                    "optimizer": self.opt_state,
                },
            },
        )

    # ----------------------------------------------------------------- eval

    def _eval_fwd(self, budget_scale: int = 1):
        render_pbr = bool(self.render_pbr)
        emit_grid_key = self._emit_grid_key()

        def build():
            @jax.jit
            def fwd(params, rays_o, rays_d, viewdirs, em, pos_rt, s_val):
                return self.renderer.forward_evaluate(
                    params, rays_o, rays_d, viewdirs, em, pos_rt, s_val,
                    render_pbr=render_pbr, emit_grid_key=emit_grid_key,
                )

            if budget_scale == 1:
                return fwd

            def scaled(*args):
                with self.scaled_budgets(budget_scale):
                    return fwd(*args)

            return scaled

        return self.cached_jit(
            "eval_fwd", build,
            key_extra=(render_pbr, emit_grid_key, budget_scale),
        )

    def _emit_grid_key(self) -> str:
        return "emit_color" if "emit_color" in self.params else "emo_color"

    def _decompose_pbr(self, pbr_pts, n_rays: int, s_val) -> Dict[str, jnp.ndarray]:
        """Chunked per-point LTS decomposition -> per-ray images
        (reference esrnerf.py:1229-1270)."""
        model = self.renderer
        chunk = self.chunk_sz
        K = int(pbr_pts["pts"].shape[0])

        def lts_chunk_for_scale(budget_scale: int):
            def build():
                @jax.jit
                def lts_chunk(params, key, pts, vd, nrm, bc, rough, metal, s):
                    return model.lts_eval_chunk(
                        params, key, pts, vd, nrm, bc, rough, metal, s
                    )

                if budget_scale == 1:
                    return lts_chunk

                def scaled(*args):
                    with self.scaled_budgets(budget_scale):
                        return lts_chunk(*args)

                return scaled

            return self.cached_jit(
                "lts_chunk", build, key_extra=(budget_scale,)
            )

        self._lts_chunk_fn = lts_chunk_for_scale(1)

        key = jax.random.PRNGKey(0)
        parts: Dict[str, List[np.ndarray]] = {}
        for st in range(0, K, chunk):
            en = min(st + chunk, K)
            sl = slice(st, en)
            key, sub = jax.random.split(key)
            args = self.place_ray_chunk(
                pbr_pts["pts"][sl], pbr_pts["viewdirs"][sl],
                pbr_pts["normal"][sl], pbr_pts["basecolor"][sl],
                pbr_pts["roughness"][sl], pbr_pts["metallic"][sl],
            )
            out = self.eval_chunk_retry(
                lts_chunk_for_scale, self.params, sub, *args, s_val,
            )
            ovf = out.pop("etc/overflow", None)
            if ovf is not None:
                self.track_overflow(ovf)
            for k, v in out.items():
                parts.setdefault(k, []).append(np.asarray(v))

        weights = np.asarray(pbr_pts["weights"])
        ray_id = np.asarray(pbr_pts["ray_id"])
        emit = np.asarray(pbr_pts["emit"])
        res = {}
        for k, v in parts.items():
            vals = np.concatenate(v, 0)
            acc = np.zeros((n_rays + 1, 3), np.float32)
            np.add.at(acc, ray_id, weights[:, None] * vals)
            res[k] = jnp.asarray(acc[:n_rays])
        acc = np.zeros((n_rays + 1, 3), np.float32)
        np.add.at(acc, ray_id, weights[:, None] * emit)
        res["lin/emit_effects"] = res["lin/emit_(in)dir"] + jnp.asarray(
            acc[:n_rays]
        )
        return res

    def _scene_extra_images(self, dirs) -> None:
        """SG envmap render (reference lts.py:644-651)."""
        import imageio.v2 as imageio

        env = np.asarray(
            self.renderer.render_envmap(
                self.params, self.envmap_height, self.envmap_width
            )
        )
        env = np.clip(env, 0.0, 1.0)
        gamma = np.asarray(apply_gamma_curve(jnp.asarray(env)))
        edir = os.path.join(dirs["image"], "etc")
        os.makedirs(edir, exist_ok=True)
        imageio.imwrite(
            os.path.join(edir, "envmap.png"), (env * 255).astype(np.uint8)
        )
        imageio.imwrite(
            os.path.join(edir, "envmap_gamma.png"), (gamma * 255).astype(np.uint8)
        )
