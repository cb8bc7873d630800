"""Budget autotune (VERDICT r4 stretch #9): a fresh scene with default
(oversized) march budgets converges toward the target utilization from
first-step telemetry, without hand-set points_budget_* values."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.full

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coarse_stage_autotunes_budgets(tmp_path):
    from esrnerf_tpu.apps.alphamask import AlphaMask
    from esrnerf_tpu.apps.coarse import Coarse
    from esrnerf_tpu.config import customize_cfg, load_cfg
    from esrnerf_tpu.data.synthetic import write_scene

    root = str(tmp_path / "scene")
    write_scene(root, wh=32, n_train=4, n_test=1)

    common = [
        "app.phase=train", f"data.root={root}", "data.scene=synth_ball",
        "app.trainer.batch_size=128", "app.trainer.vis_every=1000",
        "app.trainer.save_every=20", "system.debug=true",
    ]
    cfg1 = load_cfg("cfg/exp/esrnerf/giftbox_w/alphamask.yaml", common + [
        "app.model.num_voxels=8000", "app.trainer.n_iters=120",
        f"log.dir={tmp_path}/am", f"log.ckpt_dir={tmp_path}/am_ckpt",
    ], root_dir=REPO)
    a1 = AlphaMask(customize_cfg(cfg1))
    a1.load_dataset(); a1.load_model(); a1.process()
    ckpt1 = os.path.join(cfg1.log["dir"], "checkpoints", "last.ckpt")

    cfg2 = load_cfg("cfg/exp/esrnerf/giftbox_w/coarse.yaml", common + [
        "app.model.num_voxels=27000", "app.trainer.n_iters=4",
        "app.model.budget_autotune=true",
        f"app.trainer.ckpt={ckpt1}",
        f"log.dir={tmp_path}/co", f"log.ckpt_dir={tmp_path}/co_ckpt",
    ], root_dir=REPO)
    app = Coarse(customize_cfg(cfg2))
    app.load_dataset()
    app.load_model()
    geo = app.renderer.geo
    before = (geo.points_per_ray_masked, geo.points_per_ray)
    app.learn()
    after = (geo.points_per_ray_masked, geo.points_per_ray)
    assert after != before, f"autotune did not resize budgets: {before}"
    # resized budgets stay sane: nonzero, no bigger than ~1/target growth
    assert all(a >= 4 for a in after), after
    assert all(a <= b / 0.6 + 8 for a, b in zip(after, before)), (
        before, after)
    # re-measured utilization on the tuned budgets lands near the target
    # band (rounding at tiny budgets is coarse; accept a wide band)
    import jax.numpy as jnp

    batch = app.place_batch(app.sampler.sample())
    res = app.renderer.forward_training(
        app.params, batch["rays_o"], batch["rays_d"], batch["viewdirs"],
        batch["em_modes"], jnp.float32(app.s_val_at(app.global_step)),
    )
    k1 = float(res["etc/k1_frac"])
    k2 = float(res["etc/k2_frac"])
    assert float(res["etc/overflow"]) == 0.0
    assert 0.25 <= k1 <= 1.0, k1
    assert 0.25 <= k2 <= 1.0, k2
