"""DTU multi-view stereo dataset loader.

Behavioral port of ``data/dtu/dtu.py:38-211`` in numpy: camera K/R/t from
``cameras_sphere.npz`` projection matrices via
``cv2.decomposeProjectionMatrix``; masks composited over the background;
near/far from the maximum camera-pair distance; ObsMask/Plane MAT files and
the STL point cloud loaded for the Chamfer-distance eval (trimesh replaced
by the internal PLY reader).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Any, Dict, Tuple

import numpy as np

from esrnerf_tpu.data.base import DataClass, LightDict


def load_K_Rt_from_P(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """IDR-style decomposition of a 3x4 projection matrix."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P)
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), dtype=np.float32) / 255.0


def _imresize(img: np.ndarray, size) -> np.ndarray:
    from PIL import Image

    arr = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
    return np.asarray(arr.resize(size, Image.LANCZOS), dtype=np.float32) / 255.0


class DTU(DataClass):
    def __init__(self, cfg, phase: str):
        super().__init__(cfg, phase)
        self.basedir = os.path.join(self.root, f"dtu_scan{self.scene}")
        self.camera_dict = np.load(os.path.join(self.basedir, "cameras_sphere.npz"))
        self.rgb_paths = sorted(glob(os.path.join(self.basedir, "image", "*.png")))
        self.mask_paths = sorted(glob(os.path.join(self.basedir, "mask", "*png")))

        sample = self.seek(0)
        h, w = sample["image"].shape[:2]
        self.width, self.height = w, h
        P = (sample["world_mat"] @ sample["scale_mat"])[:3, :4]
        intrinsics, _ = load_K_Rt_from_P(P)
        self.flen = float(intrinsics[0, 0])
        self.K = intrinsics
        self._scale_mat = sample["scale_mat"].astype(np.float32)

        if self.resize:
            self.width = int(self.width * self.resize)
            self.height = int(self.height * self.resize)
            self.flen *= self.resize
            self.K[:2] *= self.resize

        # DTU Chamfer evaluation assets (ObsMask/Plane .mat + STL pcd)
        self._pcd_info = None
        try:
            from scipy.io import loadmat

            from esrnerf_tpu.utils.mesh import load_ply

            obs = loadmat(f"{self.root}/ObsMask/ObsMask{self.scene}_10.mat")
            ObsMask, BB, Res = obs["ObsMask"], obs["BB"], obs["Res"]
            stl, _ = load_ply(
                f"{self.root}/Points/stl/stl{int(self.scene):03}_total.ply"
            )
            plane = loadmat(f"{self.root}/ObsMask/Plane{self.scene}.mat")["P"]
            self._pcd_info = (ObsMask, BB, Res, stl, plane)
        except (FileNotFoundError, OSError) as e:
            print(f"DTU Chamfer assets unavailable ({e}); mesh CD disabled")

        i, j = np.meshgrid(
            np.arange(self.width, dtype=np.float32),
            np.arange(self.height, dtype=np.float32),
            indexing="xy",
        )
        i, j = i + 0.5, j + 0.5
        self.pixelcoord = np.stack(
            [
                (i - self.K[0][2]) / self.K[0][0],
                (j - self.K[1][2]) / self.K[1][1],
                np.ones_like(i),
            ],
            axis=-1,
        ).astype(np.float32)

        self.cache: Dict[str, np.ndarray] = {}
        self.preprocess()

    @property
    def pcd(self):
        """(ObsMask, BB, Res, stl point cloud, ground plane) or None."""
        return self._pcd_info

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
        return self.near, self.far

    @property
    def scale_mat(self) -> np.ndarray:
        return self._scale_mat

    def __len__(self) -> int:
        return len(self.cache["rgbs"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return {k: v[index] for k, v in self.cache.items()}

    def seek(self, index: int) -> Dict[str, Any]:
        return {
            "world_mat": self.camera_dict[f"world_mat_{index}"].astype(np.float32),
            "scale_mat": self.camera_dict[f"scale_mat_{index}"].astype(np.float32),
            "image": _imread(self.rgb_paths[index]),
            "mask": _imread(self.mask_paths[index]),
        }

    def preprocess(self) -> None:
        cache: Dict[str, list] = {
            "poses": [], "rgbs": [], "em_modes": [],
        }
        wh = (self.width, self.height)
        n_px = self.width * self.height
        for i in range(len(self.rgb_paths)):
            s = self.seek(i)
            P = (s["world_mat"] @ s["scale_mat"])[:3, :4]
            _, pose = load_K_Rt_from_P(P)
            cache["poses"].append(pose)

            img, msk = s["image"], s["mask"]
            if self.resize:
                img = _imresize(img, wh)
                msk = _imresize(msk, wh)
            img = img.reshape(n_px, -1)
            msk = msk.reshape(n_px, -1)[..., :1]
            cache["rgbs"].append(img * msk + self.white_bg * (1 - msk))
            if self.phase == "train":
                cache["em_modes"].append(
                    np.full(n_px, LightDict["off"], dtype=np.int64)
                )
            else:
                cache["em_modes"].append(np.zeros(1, dtype=np.int64))

        out = {k: np.stack(v, 0) for k, v in cache.items() if len(v) > 0}

        cam_o = out["poses"][:, :3, 3]
        self.far = float(np.linalg.norm(cam_o[:, None] - cam_o, axis=-1).max())
        self.near = self.far * 0.05

        out["rays_o"], out["rays_d"] = self.pose2ray(out["poses"])
        out["viewdirs"] = out["rays_d"] / np.linalg.norm(
            out["rays_d"], axis=-1, keepdims=True
        )

        if self.phase == "train":
            for k in ("rgbs", "rays_o", "rays_d", "viewdirs"):
                out[k] = out[k].reshape(-1, 3)
            out["em_modes"] = out["em_modes"].reshape(-1)
        else:
            out["hdrs"] = out["rgbs"]

        self.cache = {k: np.ascontiguousarray(v) for k, v in out.items()}

    def pose2ray(self, poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        pix = self.pixelcoord.reshape(-1, 3)
        rays_o = np.broadcast_to(
            poses[..., None, :3, -1], (*poses.shape[:-2], len(pix), 3)
        ).astype(np.float32)
        rays_d = (pix[None, :, None, :] * poses[:, None, :3, :3]).sum(-1)
        return np.ascontiguousarray(rays_o), rays_d.astype(np.float32)
