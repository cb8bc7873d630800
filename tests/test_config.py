"""Config system: composition order, interpolation, overrides, save/reload."""

import pytest
import os

from esrnerf_tpu.config import customize_cfg, load_cfg, missing_keys, save_cfg

pytestmark = pytest.mark.quick


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(cn, ov=None):
    return load_cfg(cn, ov, root_dir=REPO)


def test_exp_composition_full_stack():
    cfg = _load("cfg/exp/esrnerf/giftbox_w/fine.yaml", ["app.phase=train"])
    assert cfg.app.cls == "fine.Fine"
    assert cfg.data.scene == "giftbox_w"
    assert cfg.app.model.rgbnet_width == 192
    assert cfg.app.trainer.pg_scale == [15000]
    assert missing_keys(cfg) == []


def test_scene_overrides_win_over_stage_defaults():
    cfg = _load("cfg/exp/esrnerf/billboard_v/pdra.yaml", ["app.phase=train"])
    assert cfg.app.trainer.prog_slope == 5e-05
    assert cfg.app.trainer.weight_lts_l == 5000.0
    # untouched keys keep stage defaults
    assert cfg.app.trainer.weight_emit_smooth == 0.1


def test_dtu_scene():
    cfg = _load("cfg/exp/dtu/97/coarse.yaml", ["app.phase=train"])
    assert cfg.data.cls == "dtu.DTU"
    assert cfg.data.white_bg is False
    assert cfg.data.scene == 97


def test_cli_overrides_and_interpolation():
    cfg = _load(
        "cfg/exp/esrnerf/giftbox_w/alphamask.yaml",
        ["app.phase=train", "app.trainer.batch_size=128", "log.name=myrun"],
    )
    assert cfg.app.trainer.batch_size == 128
    assert cfg.log.group == "esrnerf.ESRNeRF.giftbox_w.coarse.AlphaMask"
    cfg = customize_cfg(cfg)
    assert cfg.log.dir.endswith("myrun/train")


def test_saved_cfg_is_reloadable(tmp_path):
    cfg = _load("cfg/exp/esrnerf/giftbox_w/alphamask.yaml", ["app.phase=train"])
    cfg = customize_cfg(cfg)
    path = save_cfg(cfg, str(tmp_path / "cfg.yaml"))
    cfg2 = load_cfg(path, root_dir=str(tmp_path))
    assert cfg2.app.cls == cfg.app.cls
    assert cfg2.app.trainer["lrs"]["density"] == 0.1
