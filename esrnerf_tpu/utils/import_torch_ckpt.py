"""Import a reference (ecrireme/ESR-NeRF, PyTorch) checkpoint.

The reference saves ``{"renderer": {cfg, near/far, bboxes, mask_*, s_val,
num_voxels, params: state_dict}, "trainer": {global_step, batch_st,
data_idxs, optimizer}}`` (reference ``app/fine/fine.py:466-490``). This
module converts that into this framework's checkpoint payload so a user of
the reference can continue training / evaluate / relight here with their
already-trained models.

Layout conversions:
- DenseGrid ``*.grid`` [1, C, X, Y, Z] torch -> [X, Y, Z, C] (same world
  indexing; the reference's zyx coordinate flip is internal to its
  F.grid_sample wrapper).
- ``nn.Linear`` weights [out, in] -> [in, out]; sequential ReLU stacks
  (RadianceNet.linear / TonemapNet.srgb / BRDFNet.brdfnet /
  EmissionNet.brdfnet / the coarse heads' bare nn.Sequential) -> the
  ``{"w0","b0",...}`` MLP pytree, layer order by the module path indices.
- SphericalGaussian ``envmap.{mus,lambdas,lobes}`` -> same-named dict.

The torch optimizer state is NOT converted (fresh Adam moments): the
intended flow is importing a finished stage's ``last.ckpt`` for the next
stage's warm start, where this framework re-initializes the optimizer
anyway. Sampler position (batch_st / data_idxs) is carried through so
mid-stage resumes replay the same ray order.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

# model kind -> {reference state_dict prefix: our param key}
_GRIDS = {
    "dvgo": {"density": "density", "off_color": "off_color",
             "emo_color": "emo_color"},
    "voxurfc": {"sdf.grid": "sdf", "off_color.grid": "off_color",
                "emo_color.grid": "emo_color"},
    "voxurff": {"sdf.grid": "sdf", "off_color.grid": "off_color",
                "emo_color.grid": "emo_color"},
    "esrnerf": {"sdf.grid": "sdf", "off_color.grid": "off_color",
                "emo_color.grid": "emo_color", "brdf.grid": "brdf"},
}
_MLPS = {
    "voxurfc": {"off_rgbnet": "off_rgbnet", "emo_rgbnet": "emo_rgbnet"},
    "voxurff": {"off_rgbnet.linear": "off_rgbnet",
                "emo_rgbnet.linear": "emo_rgbnet",
                "tonemapper.srgb": "tonemapper"},
    "esrnerf": {"off_rgbnet.linear": "off_rgbnet",
                "emo_rgbnet.linear": "emo_rgbnet",
                "tonemapper.srgb": "tonemapper",
                "brdfnet.brdfnet": "brdfnet",
                "emitnet.brdfnet": "emitnet"},
}

KINDS = ("dvgo", "voxurfc", "voxurff", "esrnerf")
# reference stage class name fragments -> model kind, matched most-specific
# first ("fine.LTS" contains "fine" — a bare-substring scan would import
# LTS/PDRA checkpoints as voxurff and silently drop brdf/emit/envmap)
STAGE_KINDS = (
    ("fine.lts", "esrnerf"), ("fine.pdra", "esrnerf"),
    ("lts", "esrnerf"), ("pdra", "esrnerf"),
    ("alphamask", "dvgo"),
    ("coarse.coarse", "voxurfc"), ("coarse", "voxurfc"),
    ("fine", "voxurff"),
)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _grid(x) -> np.ndarray:
    a = _np(x).astype(np.float32)
    assert a.ndim == 5 and a.shape[0] == 1, f"not a [1,C,X,Y,Z] grid: {a.shape}"
    return np.ascontiguousarray(np.transpose(a[0], (1, 2, 3, 0)))


def _mlp(state: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """Collect `prefix.<seq-path>.weight/bias` into {"w0","b0",...}."""
    pat = re.compile(re.escape(prefix) + r"\.((?:\d+\.)*\d+)\.(weight|bias)$")
    layers: Dict[tuple, Dict[str, np.ndarray]] = {}
    for key, val in state.items():
        m = pat.match(key)
        if not m:
            continue
        path = tuple(int(p) for p in m.group(1).split("."))
        layers.setdefault(path, {})[m.group(2)] = _np(val).astype(np.float32)
    if not layers:
        raise KeyError(f"no '{prefix}.*' Linear layers in state_dict")
    out: Dict[str, np.ndarray] = {}
    for i, path in enumerate(sorted(layers)):
        lw = layers[path]
        out[f"w{i}"] = np.ascontiguousarray(lw["weight"].T)  # [in, out]
        out[f"b{i}"] = lw["bias"]
    return out


def convert_state_dict(state: Dict[str, Any], kind: str) -> Dict[str, Any]:
    """Reference ``model.state_dict()`` -> this framework's param pytree."""
    assert kind in KINDS, kind
    params: Dict[str, Any] = {}
    for src, dst in _GRIDS[kind].items():
        params[dst] = _grid(state[src])
    for src, dst in _MLPS.get(kind, {}).items():
        params[dst] = _mlp(state, src)
    if kind == "esrnerf":
        params["envmap"] = {
            "mus": _np(state["envmap.mus"]).astype(np.float32),
            "lambdas": _np(state["envmap.lambdas"]).astype(np.float32),
            "lobes": _np(state["envmap.lobes"]).astype(np.float32),
        }
    return params


def convert_checkpoint(ref: Dict[str, Any], kind: str) -> Dict[str, Any]:
    """Full reference checkpoint dict -> this framework's payload."""
    r = ref["renderer"]
    t = ref.get("trainer", {})
    renderer: Dict[str, Any] = {
        "near": float(r["near"]),
        "far": float(r["far"]),
        "xyz_min": _np(r["xyz_min"]).astype(np.float32),
        "xyz_max": _np(r["xyz_max"]).astype(np.float32),
        "s_val": float(_np(r["s_val"])) if r.get("s_val") is not None else None,
        "num_voxels": int(r["num_voxels"]) if "num_voxels" in r else None,
        "params": convert_state_dict(r["params"], kind),
    }
    if "mask_density" in r:
        md = _np(r["mask_density"]).astype(np.float32)
        if md.ndim == 5:  # [1,1,X,Y,Z]
            md = np.transpose(md[0], (1, 2, 3, 0))
        renderer.update(
            mask_density=md,
            mask_xyz_min=_np(r["mask_xyz_min"]).astype(np.float32),
            mask_xyz_max=_np(r["mask_xyz_max"]).astype(np.float32),
            mask_alpha_init=float(r["mask_alpha_init"]),
        )
    trainer: Dict[str, Any] = {
        "global_step": int(t.get("global_step", 0)),
    }
    for k in ("batch_st", "data_idxs", "uncert_idxs", "cert_idxs",
              "uncert_batch_st", "cert_batch_st"):
        if k in t:
            trainer[k] = _np(t[k])
    return {"renderer": renderer, "trainer": trainer}
