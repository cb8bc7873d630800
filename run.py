"""Entry driver: compose a config, set up logging, run a stage.

CLI-compatible with the reference (``run.py:21-67``):

    python run.py -cn cfg/exp/esrnerf/giftbox_w/alphamask.yaml app.phase=train

Stage classes are resolved by the same dotted names (``coarse.AlphaMask``,
``coarse.Coarse``, ``fine.Fine``, ``fine.LTS``, ``fine.PDRA``), the resolved
config is snapshotted into the log dir, and runs resume automatically from
``<log.dir>/checkpoints/last.ckpt``.
"""

from __future__ import annotations

import argparse
import os
import sys

# stage-class dotted name -> implementing module/class in this package
STAGE_REGISTRY = {
    "coarse.AlphaMask": "esrnerf_tpu.apps.alphamask.AlphaMask",
    "coarse.Coarse": "esrnerf_tpu.apps.coarse.Coarse",
    "fine.Fine": "esrnerf_tpu.apps.fine.Fine",
    "fine.LTS": "esrnerf_tpu.apps.lts.LTS",
    "fine.PDRA": "esrnerf_tpu.apps.pdra.PDRA",
}


def _snapshot_code(log_dir: str) -> None:
    """Copy the code tree into the log dir so every run is reproducible
    from its own artifacts (reference ``run.py:27-43``). Skipped when the
    run resumes into a dir that already holds a snapshot."""
    import shutil

    dst = os.path.join(log_dir, "code")
    if os.path.exists(dst):
        return
    repo = os.path.dirname(os.path.abspath(__file__))
    ignore = shutil.ignore_patterns(
        "__pycache__", "*.pyc", ".git", "logs", "*.so", "*.o"
    )
    try:
        os.makedirs(dst)
        shutil.copytree(os.path.join(repo, "esrnerf_tpu"),
                        os.path.join(dst, "esrnerf_tpu"), ignore=ignore)
        shutil.copytree(os.path.join(repo, "cfg"),
                        os.path.join(dst, "cfg"), ignore=ignore)
        shutil.copy2(os.path.join(repo, "run.py"), dst)
    except OSError as e:  # snapshot failure must not kill a training run
        print(f"code snapshot failed ({e!r}); continuing")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-cn", "--config-name", required=True,
                        help="path to a composed YAML config")
    parser.add_argument("overrides", nargs="*",
                        help="dot-overrides like app.phase=train")
    args = parser.parse_args(argv)

    from esrnerf_tpu.apps.base import import_class
    from esrnerf_tpu.config import customize_cfg, load_cfg, save_cfg
    from esrnerf_tpu.utils.logging import seed_everything

    cfg = load_cfg(args.config_name, args.overrides)
    cfg = customize_cfg(cfg)

    # make system.device authoritative: the environment's sitecustomize pins
    # the remote TPU platform via env var before we run, so the env route
    # (JAX_PLATFORMS=cpu) is overridden — go through jax.config instead
    import jax

    device = str(cfg.system.get("device", "tpu")).lower()
    if device.startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(cfg.log["dir"], exist_ok=True)
    save_cfg(cfg)
    _snapshot_code(cfg.log["dir"])

    seed_everything(cfg.system["seed"])

    cls_path = STAGE_REGISTRY.get(cfg.app["cls"])
    if cls_path is None:
        raise KeyError(f"unknown app.cls '{cfg.app['cls']}'")
    method = import_class(cls_path)(cfg)
    method.load_dataset()
    method.load_model()
    method.process()
    if method.logger is not None:
        method.logger.finish()


if __name__ == "__main__":
    sys.exit(main())
