"""ESR-NeRF blender-style dataset loader.

Behavioral port of the reference loader (``data/esrnerf/esrnerf.py:18-259``)
in numpy: ``transforms_{phase}.json`` with per-frame light modes; test
phases additionally load emission-area masks + EXR HDR (test_nv) or
per-light edit masks/colors/intensities (test_nvc/nvi/nvic); rays derive
from poses via the blender->opencv flip; RGBA composited over white/black
background; the train phase flattens all images into one ray pool.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, Tuple

import numpy as np

from esrnerf_tpu.data.base import DataClass, LightDict

# blender cam (+x right, +y up, -z forward) -> opencv (+x right, -y up, +z fwd)
BLENDER2OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float32
)


def _imread_float(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float32) / 255.0


def _imresize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    arr = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(arr.resize(size, Image.LANCZOS), dtype=np.float32) / 255.0


def _exrread(path: str) -> np.ndarray:
    from esrnerf_tpu.utils import exr

    return exr.imread(path)[..., :3].astype(np.float32)


class ESRNeRF(DataClass):
    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        tpath = os.path.join(
            self.root, str(self.scene), "transforms", f"transforms_{phase}.json"
        )
        with open(tpath, "r") as f:
            self.infos = json.load(f)

        sample = self.seek(0)
        h, w = sample["image"].shape[:2]
        self.width, self.height = w, h
        if self.resize:
            self.width = int(self.width * self.resize)
            self.height = int(self.height * self.resize)
        self.flen = (
            self.width / 2.0 / math.tan(float(self.infos["camera_angle_x"]) / 2.0)
        )

        # pixel-center camera-space directions (reference esrnerf.py:48-59)
        i, j = np.meshgrid(
            np.arange(self.width, dtype=np.float32),
            np.arange(self.height, dtype=np.float32),
            indexing="xy",
        )
        i, j = i + 0.5, j + 0.5
        self.pixelcoord = np.stack(
            [
                (i - self.width * 0.5) / self.flen,
                (j - self.height * 0.5) / self.flen,
                np.ones_like(i),
            ],
            axis=-1,
        ).astype(np.float32)

        self.cache: Dict[str, np.ndarray] = {}
        self.preprocess()

    # ----------------------------------------------------------- properties

    @property
    def image_size(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def focal_length(self) -> float:
        return self.flen

    @property
    def all_data(self) -> Dict[str, np.ndarray]:
        return self.cache

    @property
    def near_far(self) -> Tuple[float, float]:
        return 2.0, 6.0

    @property
    def scale_mat(self) -> np.ndarray:
        return np.eye(4, dtype=np.float32)

    def __len__(self) -> int:
        return len(self.cache["rgbs"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return {k: v[index] for k, v in self.cache.items()}

    # ------------------------------------------------------------------- io

    def seek(self, index: int) -> Dict[str, Any]:
        frame = self.infos["frames"][index]
        scene_dir = os.path.join(self.root, str(self.scene))
        dname, fname = frame["file_path"].split("/")
        sample: Dict[str, Any] = {
            "pose": np.asarray(frame["transform_matrix"], dtype=np.float32),
            "image": _imread_float(os.path.join(scene_dir, dname, fname + ".png")),
            "em_mode": [light["mode"] for light in frame["lights"]],
        }
        if self.phase == "test_nv":
            sample["area"] = _imread_float(
                os.path.join(scene_dir, dname, "emission", fname + ".png")
            )
        if self.phase != "train":
            sample["hdr"] = _exrread(
                os.path.join(scene_dir, dname, "exr", fname + ".exr")
            )
        if self.phase not in ["train", "test_nv"]:
            sample["em_mask"] = [
                _imread_float(os.path.join(scene_dir, light["mask_path"] + ".png"))
                for light in frame["lights"]
            ]
            sample["em_color"] = [light["color"] for light in frame["lights"]]
            sample["em_intensity"] = [
                light["intensity"] for light in frame["lights"]
            ]
        return sample

    # ----------------------------------------------------------- preprocess

    def preprocess(self) -> None:
        import cv2

        cache: Dict[str, list] = {
            "poses": [], "rays_o": [], "rays_d": [], "viewdirs": [],
            "rgbs": [], "em_modes": [],
        }
        if self.phase == "test_nv":
            cache["areas"] = []
            cache["hdrs"] = []
        if self.phase in ["test_nvi", "test_nvic"]:
            cache["em_masks"] = []
            cache["em_intensities"] = []
        if self.phase in ["test_nvc", "test_nvic"]:
            cache["em_masks"] = []
            cache["em_colors"] = []

        wh = (self.width, self.height)
        n_px = self.width * self.height
        for idx in range(len(self.infos["frames"])):
            s = self.seek(idx)
            cache["poses"].append(s["pose"])

            img = s["image"]
            if self.resize:
                img = _imresize(img, wh)
            cache["rgbs"].append(img.reshape(n_px, -1))

            if self.phase == "train":
                mode = np.full(n_px, LightDict[s["em_mode"][0]], dtype=np.int64)
                cache["em_modes"].append(mode)
            else:
                cache["em_modes"].append(
                    np.asarray([LightDict[m] for m in s["em_mode"]], dtype=np.int64)
                )
                if self.phase == "test_nv":
                    area = s["area"]
                    if self.resize:
                        area = _imresize(area, wh)
                    cache["areas"].append((area[..., 0] > 0.5).reshape(-1))
                    hdr = s["hdr"]
                    if self.resize:
                        hdr = cv2.resize(hdr, wh, interpolation=cv2.INTER_LANCZOS4)
                    cache["hdrs"].append(hdr.reshape(n_px, -1))
                else:
                    masks = s["em_mask"]
                    if self.resize:
                        masks = [_imresize(m, wh) for m in masks]
                    cache["em_masks"].append(
                        np.stack([m[..., 0].reshape(-1) for m in masks], axis=0)
                    )
                    if self.phase in ["test_nvc", "test_nvic"]:
                        cache["em_colors"].append(
                            np.asarray(s["em_color"], dtype=np.float32)
                        )
                    if self.phase in ["test_nvi", "test_nvic"]:
                        cache["em_intensities"].append(
                            np.asarray(s["em_intensity"], dtype=np.float32)
                        )

        out = {k: np.stack(v, axis=0) for k, v in cache.items() if len(v) > 0}

        mask = out["rgbs"][..., -1:]
        out["rgbs"] = out["rgbs"][..., :3] * mask + (1 - mask) * self.white_bg
        out["rays_o"], out["rays_d"] = self.pose2ray(out["poses"])
        out["viewdirs"] = out["rays_d"] / np.linalg.norm(
            out["rays_d"], axis=-1, keepdims=True
        )
        if self.phase == "test_nv":
            out["hdrs"] = out["hdrs"][..., :3] * mask + (1 - mask) * self.white_bg

        if self.phase == "train":
            for k in ("rgbs", "rays_o", "rays_d", "viewdirs"):
                out[k] = out[k].reshape(-1, 3)
            out["em_modes"] = out["em_modes"].reshape(-1)

        self.cache = {k: np.ascontiguousarray(v) for k, v in out.items()}

    def pose2ray(self, poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(reference esrnerf.py:252-259)"""
        _pose = poses @ BLENDER2OPENCV
        pix = self.pixelcoord.reshape(-1, 3)
        rays_o = np.broadcast_to(
            _pose[..., None, :3, -1], (*_pose.shape[:-2], len(pix), 3)
        ).astype(np.float32)
        rays_d = (pix[None, :, None, :] * _pose[:, None, :3, :3]).sum(-1)
        return np.ascontiguousarray(rays_o), rays_d.astype(np.float32)
