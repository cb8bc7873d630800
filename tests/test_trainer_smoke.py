"""Fast smoke of every stage trainer's FULL learn loop + logging path.

The 5-stage pipeline e2e is the only other coverage of ``process()`` —
15 minutes, so aux-plumbing breakage (train-step return vs consumer
unpack vs logged metric keys) can hide for a whole session. This runs
each trainer for a handful of steps at micro scale and asserts the
metrics stream carries the expected keys with finite values.
"""

import json
import os

import numpy as np
import pytest

from esrnerf_tpu.config import customize_cfg, load_cfg
from esrnerf_tpu.data.synthetic import write_scene

pytestmark = pytest.mark.full

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_data_smoke"))
    write_scene(root, wh=24, n_train=4, n_test=1)
    return root


def _cfg(stage, scene_root, logdir, extra=(), n=12):
    overrides = [
        "app.phase=train",
        f"data.root={scene_root}", "data.scene=synth_ball",
        f"app.trainer.n_iters={n}",
        f"app.trainer.vis_every={10 * n}",   # no eval in the smoke
        f"app.trainer.save_every={n}",
        "app.trainer.N_vis=1",
        "app.trainer.batch_size=64",
        "app.model.num_voxels=4096",
        "system.tqdm_iters=4",
        f"log.dir={logdir}/{stage}", f"log.ckpt_dir={logdir}/{stage}_ckpt",
        "system.debug=true",
        *extra,
    ]
    cfg = load_cfg(f"cfg/exp/esrnerf/giftbox_w/{stage}.yaml", overrides,
                   root_dir=REPO)
    return customize_cfg(cfg)


def _metric_rows(cfg):
    path = os.path.join(cfg.log["dir"], "metrics.jsonl")
    return [json.loads(line) for line in open(path)]


def _assert_keys(rows, keys):
    hit = {k: False for k in keys}
    for r in rows:
        for k in keys:
            v = r.get(f"train/metric/{k}")
            if v is not None:
                assert np.isfinite(v), (k, v)
                hit[k] = True
    missing = [k for k, ok in hit.items() if not ok]
    assert not missing, f"metrics never logged: {missing}"


def test_all_stage_trainers_smoke(scene_root, tmp_path):
    logdir = str(tmp_path)

    from esrnerf_tpu.apps.alphamask import AlphaMask

    # enough steps for the density to clear the bbox threshold
    c1 = _cfg("alphamask", scene_root, logdir, n=120,
              extra=["app.trainer.batch_size=256",
                     "app.model.num_voxels=8000"])
    a = AlphaMask(c1)
    a.load_dataset(); a.load_model(); a.process()
    _assert_keys(_metric_rows(c1), ["srgb/MSE", "etc/overflow"])
    ckpt1 = os.path.join(c1.log["dir"], "checkpoints", "last.ckpt")

    from esrnerf_tpu.apps.coarse import Coarse

    c2 = _cfg("coarse", scene_root, logdir,
              extra=[f"app.trainer.ckpt={ckpt1}"])
    a = Coarse(c2)
    a.load_dataset(); a.load_model(); a.process()
    _assert_keys(_metric_rows(c2),
                 ["srgb/MSE", "etc/overflow", "etc/k1_frac", "etc/k2_frac"])
    ckpt2 = os.path.join(c2.log["dir"], "checkpoints", "last.ckpt")

    from esrnerf_tpu.apps.fine import Fine

    c3 = _cfg("fine", scene_root, logdir,
              extra=[f"app.trainer.ckpt={ckpt2}",
                     "app.trainer.num_voxels=8000",
                     "app.trainer.pg_scale=[]"])
    a = Fine(c3)
    a.load_dataset(); a.load_model(); a.process()
    _assert_keys(_metric_rows(c3),
                 ["srgb/MSE", "lin/MSE", "etc/overflow", "etc/k1_frac",
                  "etc/k2_frac"])
    ckpt3 = os.path.join(c3.log["dir"], "checkpoints", "last.ckpt")

    from esrnerf_tpu.apps.lts import LTS

    c4 = _cfg("lts", scene_root, logdir,
              extra=[f"app.trainer.ckpt={ckpt3}",
                     "app.model.num_2ndrays=4", "app.model.num_ltspts=16",
                     "app.model.points_budget_per_2ndray=8"])
    a = LTS(c4)
    a.load_dataset(); a.load_model(); a.process()
    _assert_keys(_metric_rows(c4),
                 ["srgb/MSE", "lin/pbr/off_MSE", "lin/pbr/emo_MSE",
                  "etc/overflow", "etc/k1_frac", "etc/k2_frac"])
    ckpt4 = os.path.join(c4.log["dir"], "checkpoints", "last.ckpt")

    from esrnerf_tpu.apps.pdra import PDRA

    c5 = _cfg("pdra", scene_root, logdir,
              extra=[f"app.trainer.ckpt={ckpt4}",
                     "app.model.num_2ndrays=4", "app.model.num_ltspts=16",
                     "app.model.points_budget_per_2ndray=8",
                     "app.trainer.group_interval=6",
                     "app.trainer.uncert_batch_size=32",
                     "app.trainer.cert_batch_size=32"])
    a = PDRA(c5)
    a.load_dataset(); a.load_model(); a.process()
    _assert_keys(_metric_rows(c5),
                 ["srgb/MSE", "etc/overflow", "etc/k1_frac", "etc/k2_frac"])
