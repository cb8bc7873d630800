"""Stage 5 trainer: PDRA — progressive discovery of reflection areas, plus
the relighting evaluation suite.

Behavioral port of ``app/fine/pdra.py:30-1109``: the threshold schedule
``k_val = prog_start + prog_slope * min(step, prog_end)`` drives a periodic
re-grouping — every ``group_interval`` steps the uncertain rays' emission is
re-rendered (``eval_emit``) and rays whose max emission falls below k_val
move to the *certain* pool; certain rays receive an emission-suppression
loss; the LTS emission loss becomes the asymmetric L1 pair; emission
smoothness joins the regularizers. Relighting phases
(test_nvc/nvi/nvic) fine-tune the emissive branch per test image against
edited targets (``filter_edit_rays`` + ``forward_finetune``).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.apps.lts import LTS, masked_mse
from esrnerf_tpu.data.base import LightDict
from esrnerf_tpu.data.sampler import RayGroupManager
from esrnerf_tpu.optim import Adam
from esrnerf_tpu.ops.image import apply_gamma_curve
from esrnerf_tpu.utils import checkpoint as ckpt_io
from esrnerf_tpu.utils.metrics import IoU, loss2psnr


def masked_l1(a, b, valid, gsum=lambda x: x):
    """Count-normalized masked L1; ``gsum`` (cross-shard psum) globalizes
    both numerator and denominator under shard_map."""
    v = valid[:, None].astype(a.dtype)
    n = jnp.maximum(gsum(v.sum()) * a.shape[-1], 1.0)
    return gsum((jnp.abs(a - b) * v).sum()) / n


class PDRA(LTS):
    STAGE_CLS = "fine.PDRA"
    PREV_CLS = "fine.LTS"

    def __init__(self, cfg):
        tr = cfg.app["trainer"]
        # PDRA configures per-pool batch sizes instead of batch_size
        tr.setdefault("batch_size", tr["uncert_batch_size"])
        super().__init__(cfg)
        self.group_interval = tr["group_interval"]
        self.prog_start = tr["prog_start"]
        self.prog_slope = tr["prog_slope"]
        self.prog_end_step = tr["prog_end_step"]
        if self.prog_end_step == -1:
            self.prog_end_step = tr["n_iters"]
        self.train_uncert_bs = tr["uncert_batch_size"]
        self.train_cert_bs = tr["cert_batch_size"]
        self.weight_lts_l = tr["weight_lts_l"]
        self.weight_lts_r = tr["weight_lts_r"]
        self.weight_emit_supp = tr["weight_emit_supp"]
        self.weight_emit_smooth = tr["weight_emit_smooth"]

        ev = cfg.app["eval"]
        self.eval_uncert_bs = ev["uncert_batch_size"]
        self.eval_cert_bs = ev["cert_batch_size"]
        self.eval_niters = ev["n_iters"]
        self.mask_dilation_ks = ev["mask_dilation_ks"]
        self.eval_lrs = dict(ev["lrs"])
        self.eval_weight_lts = ev["weight_lts"]

    @property
    def k_val(self) -> float:
        return (
            min(self.global_step, self.prog_end_step) * self.prog_slope
            + self.prog_start
        )

    # ----------------------------------------------------------------- data

    def load_dataset(self) -> None:
        from esrnerf_tpu.apps.base import import_class

        data_cls = import_class("esrnerf_tpu.data." + self.cfg.data["cls"])
        # relighting phases also need the train rays for fine-tuning
        self.train_dataset = data_cls(self.cfg, "train")
        self.test_dataset = data_cls(
            self.cfg, "test_nv" if self.phase == "train" else self.phase
        )

    # ---------------------------------------------------------------- model

    def _make_sampler(self, data, uncert_data_idxs):
        return RayGroupManager(
            self.cfg, data, self.data_keys, self.train_uncert_bs,
            self.train_cert_bs, uncert_data_idxs=uncert_data_idxs,
            seed=self.cfg.system["seed"],
        )

    def _resume_sampler(self, data, t):
        return RayGroupManager(
            self.cfg, data, self.data_keys, self.train_uncert_bs,
            self.train_cert_bs,
            uncert_batch_st=t["uncert_batch_st"],
            cert_batch_st=t["cert_batch_st"],
            uncert_data_idxs=t["uncert_data_idxs"],
            cert_data_idxs=t["cert_data_idxs"],
            seed=self.cfg.system["seed"],
        )

    def load_train_model(self) -> None:
        super().load_train_model()
        self.renderer.pdra_mode = True
        if self.global_step == 0:
            self.update_ray_groups(self.k_val)
            self.sampler.shuffle()

    def load_eval_model(self) -> None:
        super().load_eval_model()
        self.renderer.pdra_mode = True
        payload = ckpt_io.load_checkpoint(self.resolve_eval_ckpt())
        t = payload["trainer"]
        self._eval_uncert_idxs = t.get("uncert_data_idxs", t.get("data_idxs"))
        self._eval_cert_idxs = t.get("cert_data_idxs", np.arange(0))
        self._eval_payload = payload

    # ------------------------------------------------------------ ray groups

    def _emit_fn_for_scale(self, budget_scale: int = 1):
        def build():
            fn = jax.jit(
                lambda p, ro, rd, vd, s: self.renderer.eval_emit(p, ro, rd, vd, s)
            )
            if budget_scale == 1:
                return fn

            def scaled(*args):
                with self.scaled_budgets(budget_scale):
                    return fn(*args)

            return scaled

        return self.cached_jit("emit_fn", build, key_extra=(budget_scale,))

    def update_ray_groups(self, k_val: float) -> None:
        """Re-render per-ray emission for the uncertain pool and move rays
        with max emission <= k_val to the certain pool
        (reference pdra.py:882-932). Chunks ride the data mesh when one
        exists; budget overflow escalates instead of truncating."""
        self._emit_fn = self._emit_fn_for_scale(1)
        rays_o = self.sampler.uncert_data["rays_o"]
        rays_d = self.sampler.uncert_data["rays_d"]
        viewdirs = self.sampler.uncert_data["viewdirs"]
        n = len(rays_o)
        emission = np.zeros((n, 3), np.float32)
        s_val = self.s_val_at(self.global_step)
        bs = self.eval_uncert_bs
        for st in range(0, n, bs):
            en = min(st + bs, n)
            # cyclically tile the tail chunk so the jitted fn sees one shape
            idx = np.resize(np.arange(st, en), bs)
            ro, rd, vd = self.place_ray_chunk(
                rays_o[idx], rays_d[idx], viewdirs[idx]
            )
            out = self.eval_chunk_retry(
                lambda sc: (lambda *a: dict(zip(
                    ("emit", "etc/overflow"),
                    self._emit_fn_for_scale(sc)(*a),
                ))),
                self.params, ro, rd, vd, jnp.float32(s_val),
            )
            self.track_overflow(out["etc/overflow"])
            emission[st:en] = np.asarray(out["emit"])[: en - st]

        keep_uncertain = emission.max(-1) > k_val
        n_before = self.sampler.uncert_data_num
        self.sampler.filter(keep_uncertain)
        self.get_logger().log(
            {
                "train/metric/etc/k_val": k_val,
                "train/metric/etc/n_uncertain": self.sampler.uncert_data_num,
                "train/metric/etc/n_certain": self.sampler.cert_data_num,
            },
            step=self.global_step,
        )
        print(
            f"[pdra] k_val={k_val:.4f} uncertain {n_before} -> "
            f"{self.sampler.uncert_data_num} (certain {self.sampler.cert_data_num})"
        )

    def on_step_begin(self) -> None:
        if self.global_step % self.group_interval == self.group_interval - 1:
            self.update_ray_groups(self.k_val)

    # ---------------------------------------------------------------- train

    def _build_train_step(self):
        model = self.renderer
        opt = self.opt
        w_ent = self.weight_entropy_last
        w_lin = self.weight_linear
        w_lts = self.weight_lts
        w_lts_l = self.weight_lts_l
        w_lts_r = self.weight_lts_r
        w_nsm = self.weight_normal_smooth
        w_esm = self.weight_emit_smooth
        w_esupp = self.weight_emit_supp
        white_bg = self.white_bg
        normal_eps = self.normal_eps
        emit_eps = self.emit_eps

        sh = self.shard_helpers()
        self.check_shardable(self.train_uncert_bs + self.train_cert_bs)
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
                sg = jax.lax.stop_gradient
                off_l = masked_l1(
                    res["lin/pbr/off"], res["lin/pbr/off_hat"], lv, sh.gsum
                )
                emo_l = masked_l1(
                    sg(res["lin/pbr/emo"]), res["lin/pbr/emo_hat"], lv, sh.gsum
                )
                emo_r = masked_l1(
                    res["lin/pbr/emo"], sg(res["lin/pbr/emo_hat"]), lv, sh.gsum
                )
                loss = loss + w_lts * (off_l + w_lts_l * emo_l + w_lts_r * emo_r)

                # emission suppression on certain rays (pdra.py:421-426)
                cert = (~batch["uncert_masks"])[:, None].astype(jnp.float32)
                emit_m = res["etc/emit_marched"]
                denom = jnp.maximum(sh.gsum(cert.sum()) * 3, 1.0)
                em_supp = sh.gsum(((emit_m**2) * cert).sum()) / denom
                loss = loss + w_esupp * em_supp

                pout = jnp.clip(res["etc/alphainv_cum"][..., -1], 1e-6, 1 - 1e-6)
                ent = sh.glast(
                    -(pout * jnp.log(pout) + (1 - pout) * jnp.log(1 - pout)).mean()
                )
                loss = loss + w_ent * ent

                pv = res["etc/point_valid"][:, None].astype(jnp.float32)

                def pt_l1(a, b):
                    n = jnp.maximum(sh.gsum(pv.sum()) * a.shape[-1], 1.0)
                    return sh.gsum((jnp.abs(a - b) * pv).sum()) / n

                loss = loss + w_nsm * pt_l1(
                    res["etc/normal"], res["etc/normal_eps"]
                )
                loss = loss + w_esm * pt_l1(res["etc/emit"], res["etc/emit_eps"])

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

    # ------------------------------------------------------------ relighting

    def filter_edit_rays(self, sampler: RayGroupManager, test_data) -> RayGroupManager:
        """Assign per-ray edit modes/colors/intensities by projecting each
        train ray's expected surface point into the test camera and sampling
        the dilated per-light edit masks (reference pdra.py:934-1045)."""
        import cv2

        w, h = self.train_dataset.image_size
        f = self.train_dataset.focal_length
        w2c = np.linalg.inv(np.asarray(test_data["poses"], np.float64))
        K = np.array(
            [[-f, 0.0, w / 2.0 - 0.5], [0.0, f, h / 2.0 - 0.5], [0.0, 0.0, 1.0]],
            np.float64,
        )

        em_masks = np.asarray(test_data["em_masks"]).reshape(-1, h, w)
        ks = self.mask_dilation_ks
        em_masks = np.stack(
            [cv2.dilate(m, np.ones((ks, ks)), iterations=1) for m in em_masks]
        )  # [L, h, w]

        def esp_fn_for_scale(budget_scale: int = 1):
            def build():
                fn = jax.jit(
                    lambda p, ro, rd, vd, s: self.renderer.eval_esp(
                        p, ro, rd, vd, s)
                )
                if budget_scale == 1:
                    return fn

                def scaled(*args):
                    with self.scaled_budgets(budget_scale):
                        return fn(*args)

                return scaled

            return self.cached_jit("esp_fn", build, key_extra=(budget_scale,))

        self._esp_fn = esp_fn_for_scale(1)

        rays_o = sampler.uncert_data["rays_o"]
        rays_d = sampler.uncert_data["rays_d"]
        viewdirs = sampler.uncert_data["viewdirs"]
        n = len(rays_o)
        keep = np.zeros(n, bool)
        modes = np.ones(n, np.int64)
        colors = np.zeros((n, 2), np.float32)
        intensities = np.zeros(n, np.float32)
        s_val = self.s_val_at(self.global_step)

        bs = self.eval_bs
        for st in range(0, n, bs):
            en = min(st + bs, n)
            cidx = np.resize(np.arange(st, en), bs)
            ro, rd, vd = self.place_ray_chunk(
                rays_o[cidx], rays_d[cidx], viewdirs[cidx]
            )
            out = self.eval_chunk_retry(
                lambda sc: (lambda *a: dict(zip(
                    ("esp", "etc/overflow"), esp_fn_for_scale(sc)(*a),
                ))),
                self.params, ro, rd, vd, jnp.float32(s_val),
            )
            self.track_overflow(out["etc/overflow"])
            esp = np.asarray(out["esp"])[: en - st]

            hom = np.concatenate([esp, np.ones_like(esp[:, :1])], -1).T
            xyz = w2c @ hom
            cam = xyz[:3] / xyz[-1:]
            xyz = K @ cam
            img = (xyz[:2] / xyz[-1:]).T  # [b, 2] (x, y)

            inb = ~(
                (img[:, 0] < 0) | (img[:, 1] < 0)
                | (img[:, 0] > (w - 1)) | (img[:, 1] > (h - 1))
            )
            ix = np.clip(img[:, 0], 0, w - 1)
            iy = np.clip(img[:, 1], 0, h - 1)
            # bilinear sample of each light's dilated mask
            x0 = np.floor(ix).astype(int); x1 = np.minimum(x0 + 1, w - 1)
            y0 = np.floor(iy).astype(int); y1 = np.minimum(y0 + 1, h - 1)
            fx = ix - x0; fy = iy - y0
            for li in range(len(em_masks)):
                mgrid = em_masks[li]
                mv = (
                    mgrid[y0, x0] * (1 - fx) * (1 - fy)
                    + mgrid[y0, x1] * fx * (1 - fy)
                    + mgrid[y1, x0] * (1 - fx) * fy
                    + mgrid[y1, x1] * fx * fy
                )
                hit = inb & (mv > 0)
                sel = np.arange(st, en)[hit]
                keep[sel] = True
                mode = int(np.asarray(test_data["em_modes"]).reshape(-1)[li])
                modes[sel] = mode
                if mode == LightDict["off"]:
                    intensities[sel] = 0.0
                if mode in (LightDict["i_change"], LightDict["ic_change"]):
                    intensities[sel] = float(
                        np.asarray(test_data["em_intensities"]).reshape(-1)[li]
                    )
                if mode in (LightDict["c_change"], LightDict["ic_change"]):
                    colors[sel] = np.asarray(
                        test_data["em_colors"]
                    ).reshape(-1, 2)[li][:2]

        sampler.uncert_data["em_modes"] = modes
        sampler.uncert_data["em_colors"] = colors
        sampler.uncert_data["em_intensities"] = intensities
        nc = sampler.cert_data_num
        sampler.cert_data["em_modes"] = np.zeros(nc, np.int64)
        sampler.cert_data["em_colors"] = np.zeros((nc, 2), np.float32)
        sampler.cert_data["em_intensities"] = np.zeros(nc, np.float32)
        sampler.keys = list(sampler.keys) + ["em_colors", "em_intensities"]
        sampler.filter(keep)
        return sampler

    def finetune_radiance(self, test_data):
        """Per-test-image emissive-branch fine-tune against edited targets
        (reference pdra.py:1047-1109). Returns the per-step loss list."""
        payload = self._eval_payload
        all_params = jax.tree.map(jnp.asarray, payload["renderer"]["params"])
        # frozen emit snapshot of the pre-finetune emo grid (esrnerf.py:226-232);
        # must be a copy — emo_color is donated by the finetune step
        all_params["emit_color"] = jnp.copy(all_params["emo_color"])
        all_params = self.place_replicated(all_params)
        self.params = all_params

        sampler = RayGroupManager(
            self.cfg, self.train_dataset.all_data, list(self.data_keys),
            self.eval_uncert_bs, self.eval_cert_bs,
            uncert_data_idxs=self._eval_uncert_idxs,
            cert_data_idxs=self._eval_cert_idxs,
            seed=self.cfg.system["seed"],
        )
        sampler = self.filter_edit_rays(sampler, test_data)

        # ft_step donates the trainable leaves; they must NOT alias the
        # reusable eval payload (jnp.asarray / device_put are zero-copy when
        # the sharding already matches), or the NEXT test image's finetune
        # reads deleted buffers
        trainable = jax.tree.map(
            jnp.copy, {k: all_params[k] for k in ("emo_color", "emo_rgbnet")}
        )
        frozen = {k: v for k, v in all_params.items()
                  if k not in ("emo_color", "emo_rgbnet")}
        opt = Adam(self.eval_lrs)
        opt_state = opt.init(trainable)
        if self.mesh is not None:
            # committed replicated placement so every loop iteration hits
            # the one compiled executable (out_shardings below pins the
            # donated outputs to the same sharding)
            from esrnerf_tpu.parallel import replicated

            rep = replicated(self.mesh)
            trainable = jax.device_put(trainable, rep)
            opt_state = jax.device_put(opt_state, rep)
        model = self.renderer
        w = self.eval_weight_lts
        s_val = float(payload["renderer"]["s_val"])

        # the SDF is frozen during the fine-tune, so the per-step primary
        # march is a pure function of the ray: precompute each edit ray's
        # surviving samples ONCE and ride them as extra sampler keys (the
        # reference re-marches every one of its eval_niters steps). Gated
        # by app.eval.cache_march (default on); per-ray slots capped at
        # app.eval.cache_march_ppr samples (excess dropped, logged).
        ft_cached = bool(self.cfg.app["eval"].get("cache_march", True))
        if ft_cached:
            ppr = int(self.cfg.app["eval"].get("cache_march_ppr", 16))
            sdf_frozen = frozen["sdf"]
            slot_fn = self.cached_jit("ft_slots", lambda: jax.jit(
                lambda sdf, ro, rd, vd: model.geo.march_ray_slots(
                    sdf, ro, rd, vd, jnp.float32(s_val),
                    model.fastcolor_thres, model.neus_alpha, ppr,
                )
            ))
            # chunk sized to the pool (device-count-aligned): a fixed 4096
            # against a tiny eval pool padded 16x for nothing
            ndev = (int(np.prod(self.mesh.devices.shape))
                    if self.mesh is not None else 1)
            pool_max = max(sampler.uncert_data_num, sampler.cert_data_num, 1)
            chunk = min(
                int(self.cfg.app["eval"].get("cache_march_chunk", 4096)),
                -(-pool_max // ndev) * ndev,
            )
            dropped = []
            for pool in (sampler.uncert_data, sampler.cert_data):
                n = len(pool["rays_o"])
                pts_l, ok_l = [], []
                for st in range(0, n, chunk):
                    en = min(st + chunk, n)
                    pad = chunk - (en - st)
                    ro, rd, vd = (
                        np.concatenate([pool[k][st:en], pool[k][en - 1:en]
                                        .repeat(pad, 0)], 0)
                        if pad else pool[k][st:en]
                        for k in ("rays_o", "rays_d", "viewdirs")
                    )
                    ro, rd, vd = self.place_ray_chunk(ro, rd, vd)
                    p, ok, (cnt, drop) = slot_fn(sdf_frozen, ro, rd, vd)
                    pts_l.append(np.asarray(p[:en - st]))
                    ok_l.append(np.asarray(ok[:en - st]))
                    # real rays only: the chunk tail is padded with copies
                    # of one ray, which must not dominate the diagnostic
                    c = np.asarray(cnt[:en - st], np.float64)
                    d = np.asarray(drop[:en - st], np.float64)
                    dropped.append(d.sum() / max(c.sum(), 1.0))
                pool["ft_pts"] = (np.concatenate(pts_l, 0) if pts_l
                                  else np.zeros((0, ppr, 3), np.float32))
                pool["ft_valid"] = (np.concatenate(ok_l, 0) if ok_l
                                    else np.zeros((0, ppr), bool))
            if dropped and max(dropped) > 0:
                print(f"[relight finetune] march cache dropped "
                      f"{max(dropped):.3f} of real samples in its worst "
                      "chunk (raise app.eval.cache_march_ppr to keep more)")
            for k in ("ft_pts", "ft_valid"):
                if k not in sampler.keys:
                    sampler.keys = list(sampler.keys) + [k]

        if getattr(self, "_ft_step_cached", None) != ft_cached:
            # pin the donated loop-carried outputs to the replicated mesh
            # sharding: without this the first call's GSPMD-chosen output
            # shardings differ from the host-placed inputs and iteration 2
            # re-lowers + recompiles the whole step (measured ~16 s per
            # finetune call on a 1-core 8-device CPU mesh)
            jit_kw: dict = {"donate_argnums": (0, 1)}
            if self.mesh is not None:
                from esrnerf_tpu.parallel import replicated

                rep = replicated(self.mesh)
                jit_kw["out_shardings"] = (rep, rep, rep, rep)

            @functools.partial(jax.jit, **jit_kw)
            def ft_step(params, opt_state, frozen, batch, rng):
                def loss_fn(p):
                    res = model.forward_finetune(
                        p, frozen, batch["rays_o"], batch["rays_d"],
                        batch["viewdirs"], batch["em_modes"],
                        batch["em_intensities"], batch["em_colors"],
                        jnp.float32(s_val), rng,
                        ft_pts=batch.get("ft_pts"),
                        ft_valid=batch.get("ft_valid"),
                    )
                    loss = w * masked_mse(
                        res["lin/pbr/emo"], res["lin/pbr/emo_hat"],
                        res["lin/pbr/valid"],
                    )
                    return loss, res["etc/overflow"]

                (loss, ovf), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                params, opt_state = opt.step(params, grads, opt_state)
                return params, opt_state, loss, ovf

            self._ft_step = ft_step
            self._ft_step_cached = ft_cached

        key = jax.random.PRNGKey(self.cfg.system["seed"])
        losses = []
        for it in self.tqdm(range(self.eval_niters), desc="finetune", leave=False):
            raw = sampler.sample()
            nb = len(next(iter(raw.values())))
            if (self.mesh is not None
                    and nb % int(np.prod(self.mesh.devices.shape)) == 0):
                batch = self.place_batch(raw)
            else:
                batch = {k: jnp.asarray(v) for k, v in raw.items()}
            key, sub = jax.random.split(key)
            trainable, opt_state, loss, ovf = self._ft_step(
                trainable, opt_state, frozen, batch, sub
            )
            self.track_overflow(ovf)
            losses.append(float(loss))

        self.params = {**frozen, **trainable}
        print(f"[relight finetune] emo_MSE {losses[0]:.5f} -> {losses[-1]:.5f}")
        return losses

    # ----------------------------------------------------------------- eval

    def evaluate(self, N_vis: int = -1) -> None:
        if self.phase in ("test_nvc", "test_nvi", "test_nvic"):
            self._evaluate_relight(N_vis)
        else:
            self._evaluate_nv(N_vis)

    def _evaluate_nv(self, N_vis: int = -1) -> None:
        """test_nv eval = LTS eval + emission-mask IoU (pdra.py:722-728)."""
        self._iou_acc = [0, 0]
        super(PDRA, self).evaluate(N_vis)
        if self._iou_acc[1] > 0:
            iou = self._iou_acc[0] / max(1, self._iou_acc[1])
            self.get_logger().log(
                {f"{self.test_dataset.phase}/metric/etc/IoU": iou},
                step=self.global_step,
            )

    def _pre_composite_hook(self, imgs, data, metrics):
        """Mask the rendered emission by k_val and accumulate emission-area
        IoU against the GT masks (reference pdra.py:683-687,722-728)."""
        if "lin/emit" not in imgs:
            return imgs
        emit = imgs["lin/emit"]
        mask = (emit > self.k_val).any(-1)
        imgs["lin/emit"] = emit * mask[..., None]
        if "areas" in data and hasattr(self, "_iou_acc"):
            areas = np.asarray(data["areas"]).reshape(mask.shape)
            _, inter, union = IoU(mask, areas)
            self._iou_acc[0] += inter
            self._iou_acc[1] += union
        return imgs

    def _evaluate_relight(self, N_vis: int = -1) -> None:
        """Relighting phases: per-image fine-tune then render with
        em_modes forced on (pdra.py:589-677)."""
        dirs = self.eval_dirs()
        img_idxes = self.eval_img_idxes(len(self.test_dataset), N_vis)
        width, height = self.test_dataset.image_size
        metrics: Dict[str, List] = {
            "lin/MSE": [], "lin/PSNR": [], "lin/SSIM": [], "lin/LPIPS_ALEX": [],
        }
        renders: Dict[str, List[np.ndarray]] = {}

        from esrnerf_tpu.utils.metrics import rgb_lpips, rgb_ssim

        for i in self.tqdm(img_idxes, desc="eval", leave=False):
            data = self.test_dataset[int(i)]
            self.finetune_radiance(data)
            fwd = self._make_relight_fwd()

            n = len(data["rgbs"])
            pos_rt = jnp.asarray(data["poses"][:3, :3])
            s_val = float(self._eval_payload["renderer"]["s_val"])
            results: Dict[str, List[np.ndarray]] = {}
            for st in range(0, n, self.eval_bs):
                en = min(st + self.eval_bs, n)
                ro, rd, vd = self.place_ray_chunk(
                    data["rays_o"][st:en], data["rays_d"][st:en],
                    data["viewdirs"][st:en],
                )
                out = self.eval_chunk_retry(
                    fwd, self.params, ro, rd, vd,
                    jnp.int32(1), pos_rt, jnp.float32(s_val),
                )
                out.pop("pbr_points", None)
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
            final = {}
            for k, v in imgs.items():
                if k == "etc/white_bg":
                    final[k] = np.clip(v, 0, 1)
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

            rgbs = data["rgbs"].reshape(height, width, 3)
            lin_gamma = imgs["lin/rgb_gamma"]
            mse = float(((lin_gamma - rgbs) ** 2).mean())
            metrics["lin/MSE"].append(mse)
            metrics["lin/PSNR"].append(loss2psnr(mse))
            metrics["lin/SSIM"].append(rgb_ssim(lin_gamma, rgbs, 1))
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

        self.save_renders(dirs, renders, metrics)
        self.log_eval(self.test_dataset.phase + "/", metrics)

    def _make_relight_fwd(self):
        """Returns ``fwd_for_scale(budget_scale) -> jitted eval fn`` for
        :meth:`eval_chunk_retry`. One jit per (render_pbr, scale), reused
        across ALL test images (each finetune_radiance only swaps params,
        not the renderer) — re-jitting per image cost a full re-trace of
        the eval graph per relit view."""
        model = self.renderer
        render_pbr = bool(self.render_pbr)

        def for_scale(budget_scale: int = 1):
            def build():
                @jax.jit
                def fwd(params, rays_o, rays_d, viewdirs, em, pos_rt, s_val):
                    return model.forward_evaluate(
                        params, rays_o, rays_d, viewdirs, em, pos_rt, s_val,
                        render_pbr=render_pbr, emit_grid_key="emit_color",
                    )

                if budget_scale == 1:
                    return fwd

                def scaled(*args):
                    with self.scaled_budgets(budget_scale):
                        return fwd(*args)

                return scaled

            return self.cached_jit(
                "relight_fwd", build, key_extra=(render_pbr, budget_scale)
            )

        return for_scale
