"""Golden-step integration test: alphamask stage end-to-end on the synthetic
scene, through the same code path as ``run.py`` — train, eval artifacts,
checkpoint, resume (SURVEY.md §4 item 3)."""

import os

import numpy as np
import pytest

from esrnerf_tpu.config import customize_cfg, load_cfg
from esrnerf_tpu.data.synthetic import write_scene

pytestmark = pytest.mark.e2e


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_data"))
    write_scene(root, wh=40, n_train=8, n_test=2)
    return root


def make_cfg(scene_root, logdir, n_iters=150, extra=()):
    overrides = [
        "app.phase=train",
        f"data.root={scene_root}",
        "data.scene=synth_ball",
        "app.model.num_voxels=8000",
        f"app.trainer.n_iters={n_iters}",
        "app.trainer.batch_size=256",
        f"app.trainer.vis_every={n_iters}",
        f"app.trainer.save_every={max(n_iters // 2, 1)}",
        "app.trainer.N_vis=2",
        f"log.dir={logdir}/info",
        f"log.ckpt_dir={logdir}/ckpt",
        "system.debug=true",
        *extra,
    ]
    cfg = load_cfg(
        "cfg/exp/esrnerf/giftbox_w/alphamask.yaml", overrides, root_dir=REPO
    )
    return customize_cfg(cfg)


def run_stage(cfg):
    from esrnerf_tpu.apps.alphamask import AlphaMask

    app = AlphaMask(cfg)
    app.load_dataset()
    app.load_model()
    app.process()
    return app


def test_alphamask_train_eval_checkpoint_resume(scene_root, tmp_path):
    logdir = str(tmp_path / "run1")
    cfg = make_cfg(scene_root, logdir, n_iters=150)
    app = run_stage(cfg)

    # training actually learned the scene
    metrics = [
        line for line in open(
            os.path.join(cfg.log["dir"], "metrics.jsonl")
        ).read().splitlines()
    ]
    import json

    recs = [json.loads(m) for m in metrics]
    train_psnr = [r["train/metric/srgb/PSNR"] for r in recs
                  if "train/metric/srgb/PSNR" in r]
    assert train_psnr[-1] > train_psnr[0] + 3, (train_psnr[0], train_psnr[-1])
    assert train_psnr[-1] > 14

    # eval artifacts on disk
    step_dir = f"{app.global_step:010}"
    img_dir = os.path.join(cfg.log["dir"], "image", step_dir, "srgb", "rgb")
    assert os.path.exists(os.path.join(img_dir, "000.png"))
    mean_txt = os.path.join(cfg.log["dir"], "text", step_dir, "mean.txt")
    assert "srgb/PSNR" in open(mean_txt).read()

    # eval PSNR on held-out views is meaningful
    eval_psnr = [r["test_nv/metric/srgb/PSNR"] for r in recs
                 if "test_nv/metric/srgb/PSNR" in r]
    assert eval_psnr and eval_psnr[-1] > 12

    # checkpoint exists and is the reference two-part schema
    ckpt = os.path.join(cfg.log["dir"], "checkpoints", "last.ckpt")
    assert os.path.exists(ckpt)
    from esrnerf_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(ckpt)
    assert set(payload) == {"renderer", "trainer"}
    assert "params" in payload["renderer"]
    assert "global_step" in payload["trainer"]

    # resume: extend to more iters from the same log dir
    cfg2 = make_cfg(scene_root, logdir, n_iters=180)
    app2 = run_stage(cfg2)
    assert app2.global_step == 179
    p2 = np.asarray(app2.params["density"])
    assert np.isfinite(p2).all()


def test_alphamask_eval_phase_loads_saved_ckpt(scene_root, tmp_path):
    logdir = str(tmp_path / "run_eval")
    cfg = make_cfg(scene_root, logdir, n_iters=60)
    app = run_stage(cfg)
    ckpt = os.path.join(cfg.log["dir"], "checkpoints", "last.ckpt")

    cfg_eval = make_cfg(
        scene_root, logdir + "_eval", n_iters=60,
        extra=["app.phase=test_nv", f"app.eval.ckpt={ckpt}", "app.eval.batch_size=800"],
    )
    from esrnerf_tpu.apps.alphamask import AlphaMask

    ev = AlphaMask(cfg_eval)
    ev.load_dataset()
    ev.load_model()
    assert ev.global_step == app.global_step
    ev.process()
    assert os.path.exists(
        os.path.join(cfg_eval.log["dir"], "text", ev.pretty_global_step, "mean.txt")
    )
