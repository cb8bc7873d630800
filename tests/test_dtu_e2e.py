"""DTU pipeline: loader conventions + alphamask -> coarse on a synthetic
DTU-format scene, including the Chamfer-distance eval (SURVEY.md §6: the
DTU-97 chain is a benchmark config; DTU stops at LTS and has no PDRA)."""

import json
import os

import numpy as np
import pytest

from esrnerf_tpu.config import customize_cfg, load_cfg
from esrnerf_tpu.data.dtu import DTU
from esrnerf_tpu.data.synthetic import write_dtu_scene

pytestmark = pytest.mark.e2e


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dtu_data"))
    write_dtu_scene(root, scan=1, n_views=8, wh=40)
    return root


def stage_cfg(stage, root, logdir, n_iters, extra=()):
    overrides = [
        "app.phase=train",
        f"data.root={root}",
        "data.scene=1",
        f"app.trainer.n_iters={n_iters}",
        f"app.trainer.vis_every={n_iters}",
        f"app.trainer.save_every={n_iters}",
        "app.trainer.N_vis=1",
        f"log.dir={logdir}/{stage}",
        f"log.ckpt_dir={logdir}/{stage}_ckpt",
        "system.debug=true",
        *extra,
    ]
    cfg = load_cfg(f"cfg/exp/dtu/97/{stage}.yaml", overrides,
                   root_dir=REPO)
    return customize_cfg(cfg)


def test_dtu_loader_conventions(dtu_root):
    cfg = stage_cfg("alphamask", dtu_root, "/tmp/unused_dtu", 1)
    ds = DTU(cfg, "train")
    data = ds.all_data
    n_px = 40 * 40
    assert data["rays_o"].shape == (8 * n_px, 3)
    # rays through the image center point at the origin (cameras look at 0)
    center = n_px // 2 + 20
    o = data["rays_o"][center]
    d = data["viewdirs"][center]
    t = -(o * d).sum() / (d * d).sum()
    closest = o + t * d
    assert np.linalg.norm(closest) < 0.2, closest
    # near/far from camera-pair max distance
    near, far = ds.near_far
    assert 0 < near < far
    # masks composited over the configured background (DTU: black)
    rgbs = data["rgbs"].reshape(8, n_px, 3)
    corner = rgbs[:, 0]  # image corner = background
    assert np.allclose(corner, float(cfg.data["white_bg"]), atol=2e-2)
    # Chamfer assets loaded
    assert ds.pcd is not None


def test_dtu_alphamask_then_coarse(dtu_root, tmp_path):
    from esrnerf_tpu.apps.alphamask import AlphaMask
    from esrnerf_tpu.apps.coarse import Coarse

    logdir = str(tmp_path)
    cfg1 = stage_cfg("alphamask", dtu_root, logdir, 120, extra=[
        "app.model.num_voxels=8000", "app.trainer.batch_size=256",
        "app.eval.batch_size=800",
    ])
    a1 = AlphaMask(cfg1)
    a1.load_dataset(); a1.load_model(); a1.process()
    recs = [json.loads(l) for l in open(
        os.path.join(cfg1.log["dir"], "metrics.jsonl"))]
    psnrs = [r["train/metric/srgb/PSNR"] for r in recs
             if "train/metric/srgb/PSNR" in r]
    assert psnrs[-1] > psnrs[0]

    ckpt1 = os.path.join(cfg1.log["dir"], "checkpoints", "last.ckpt")
    cfg2 = stage_cfg("coarse", dtu_root, logdir, 120, extra=[
        "app.model.num_voxels=27000", "app.trainer.batch_size=256",
        "app.eval.batch_size=800", f"app.trainer.ckpt={ckpt1}",
    ])
    a2 = Coarse(cfg2)
    a2.load_dataset(); a2.load_model(); a2.process()

    recs2 = [json.loads(l) for l in open(
        os.path.join(cfg2.log["dir"], "metrics.jsonl"))]
    # Chamfer distance computed against the synthetic GT point cloud
    cds = [v for r in recs2 for k, v in r.items()
           if k.endswith("metric/mesh/CD")]
    assert cds and np.isfinite(cds).all()
    # the coarse SDF after 120 iters on 8 views is rough; just sanity-bound
    assert cds[-1] < 1.0, cds
    assert os.path.exists(
        os.path.join(cfg2.log["dir"], "mesh", a2.pretty_global_step,
                     "mesh.ply"))
