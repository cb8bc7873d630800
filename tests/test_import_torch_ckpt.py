"""Reference-checkpoint import parity.

Instantiates the reference's own torch head modules (pure-torch file,
``app/utils/pbr/module.py`` — no CUDA extensions) with random weights,
converts their state_dict through the importer, and asserts OUR functional
heads reproduce the torch outputs on random inputs. This is the strongest
available evidence that an imported real checkpoint behaves identically.

Skipped when /root/reference or torch is unavailable.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")
pytestmark = [
    pytest.mark.quick,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from esrnerf_tpu.models import mlp as mlpops  # noqa: E402
from esrnerf_tpu.ops import pbr as pbrops  # noqa: E402
from esrnerf_tpu.utils.import_torch_ckpt import (  # noqa: E402
    _grid, _mlp, convert_state_dict)


@pytest.fixture(scope="module")
def ref_pbr():
    # load the file directly: the app package __init__ pulls in omegaconf,
    # which this environment doesn't ship
    import importlib.util

    path = os.path.join(REF, "app", "utils", "pbr", "module.py")
    spec = importlib.util.spec_from_file_location("ref_pbr_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _apply_ours(params, x, act):
    out = mlpops.apply_mlp(params, jnp.asarray(x))
    return np.asarray(act(out))


@pytest.mark.parametrize("cls,act", [
    ("RadianceNet", jax.nn.softplus),
    ("TonemapNet", jax.nn.sigmoid),
])
def test_radiance_tonemap_head_parity(ref_pbr, cls, act):
    torch.manual_seed(0)
    net = getattr(ref_pbr, cls)(39, 64, 4).eval()
    prefix = "linear" if cls == "RadianceNet" else "srgb"
    ours = _mlp({k: v for k, v in net.state_dict().items()}, prefix)
    x = np.random.default_rng(1).standard_normal((257, 39)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = _apply_ours(ours, x, act)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_brdf_emission_head_parity(ref_pbr):
    torch.manual_seed(1)
    brdf = ref_pbr.BRDFNet(55, 64, 4, mode=object()).eval()  # disney branch
    emit = ref_pbr.EmissionNet(55, 64, 4).eval()
    x = np.random.default_rng(2).standard_normal((130, 55)).astype(np.float32)
    with torch.no_grad():
        b3, r1, m1 = brdf(torch.from_numpy(x))
        e = emit(torch.from_numpy(x)).numpy()
    ours_b = _mlp(dict(brdf.state_dict()), "brdfnet")
    ours_e = _mlp(dict(emit.state_dict()), "brdfnet")
    got_b = _apply_ours(ours_b, x, jax.nn.sigmoid)
    np.testing.assert_allclose(got_b[:, :3], b3.numpy(), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_b[:, 3:4], r1.numpy(), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(got_b[:, 4:5], m1.numpy(), rtol=2e-5, atol=2e-6)
    got_e = _apply_ours(ours_e, x, jax.nn.softplus)
    np.testing.assert_allclose(got_e, e, rtol=2e-5, atol=2e-6)


def test_envmap_parity(ref_pbr):
    torch.manual_seed(2)
    sg = ref_pbr.SphericalGaussian(48, "softplus")
    dirs = np.random.default_rng(3).standard_normal((64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        want = sg(torch.from_numpy(dirs)).numpy()
    got = np.asarray(pbrops.sg_envmap(
        jnp.asarray(sg.mus.detach().numpy()),
        jnp.asarray(sg.lambdas.detach().numpy()),
        jnp.asarray(sg.lobes.detach().numpy()),
        jnp.asarray(dirs), activation=jax.nn.softplus,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_grid_conversion_sampling_parity():
    """[1,C,X,Y,Z] -> [X,Y,Z,C] preserves world-space trilinear samples:
    the reference's DenseGrid flips query coords to zyx because
    F.grid_sample's last coordinate walks the FIRST spatial dim; our
    sampler takes xyz directly on the transposed layout."""
    from esrnerf_tpu.ops import grid as gridops

    rng = np.random.default_rng(4)
    g5 = rng.standard_normal((1, 2, 7, 9, 11)).astype(np.float32)
    ours = _grid(g5)
    pts = rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32)

    ind = torch.from_numpy(pts).flip(-1)[None, None, None]  # zyx, align DVGO
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(g5), ind, mode="bilinear", align_corners=True,
    ).numpy().reshape(2, -1).T
    got = np.asarray(gridops.grid_sample_3d(
        jnp.asarray(ours), jnp.asarray(pts),
        jnp.asarray([-1.0, -1.0, -1.0]), jnp.asarray([1.0, 1.0, 1.0]),
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_full_state_dict_roundtrip(ref_pbr):
    """convert_state_dict on a synthetic reference-shaped ESRNeRF
    state_dict produces a pytree our ESRNeRF accepts shape-for-shape."""
    torch.manual_seed(3)
    X = Y = Z = 6
    dim0 = 39
    state = {}
    for name, c in (("sdf", 1), ("off_color", 3), ("emo_color", 3),
                    ("brdf", 3)):
        state[f"{name}.grid"] = torch.randn(1, c, X, Y, Z)
    for pref in ("off_rgbnet.linear", "emo_rgbnet.linear",
                 "tonemapper.srgb"):
        net = ref_pbr.RadianceNet(dim0, 16, 4)
        for k, v in net.state_dict().items():
            state[f"{pref}.{k.split('linear.', 1)[1]}"] = v
    for pref, cls in (("brdfnet", ref_pbr.BRDFNet),
                      ("emitnet", ref_pbr.EmissionNet)):
        net = (cls(dim0, 16, 3, mode=object())
               if cls is ref_pbr.BRDFNet else cls(dim0, 16, 3))
        for k, v in net.state_dict().items():
            state[f"{pref}.{k}"] = v
    sg = ref_pbr.SphericalGaussian(8, "softplus")
    state["envmap.mus"] = sg.mus
    state["envmap.lambdas"] = sg.lambdas
    state["envmap.lobes"] = sg.lobes

    params = convert_state_dict(state, "esrnerf")
    assert params["sdf"].shape == (X, Y, Z, 1)
    assert params["brdf"].shape == (X, Y, Z, 3)
    assert params["off_rgbnet"]["w0"].shape == (dim0, 16)
    assert params["brdfnet"]["w2"].shape[1] == 5  # disney 3/1/1 split
    assert params["emitnet"]["w2"].shape[1] == 3
    assert params["envmap"]["mus"].shape == (8, 3)


@pytest.mark.full
def test_full_checkpoint_import_runs_forward(ref_pbr, tmp_path):
    """A complete reference-style torch checkpoint imports and drives OUR
    ESRNeRF forward_evaluate end to end (key names, shapes, meta)."""
    import jax
    from esrnerf_tpu.config import load_cfg
    from esrnerf_tpu.models.esrnerf import ESRNeRF
    from esrnerf_tpu.models.voxurf_base import make_mask_cache
    from esrnerf_tpu.utils import checkpoint as ckpt_io
    from esrnerf_tpu.utils.import_torch_ckpt import convert_checkpoint

    REPO_ = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg(
        "cfg/app/lts.yaml",
        ["app.phase=train", "data.cls=esrnerf.ESRNeRF", "data.root=x",
         "data.scene=x", "app.model.num_2ndrays=4",
         "app.model.num_ltspts=8", "app.model.points_budget_per_2ndray=8",
         "app.model.rgbnet_width=16", "app.model.rgbnet_depth=3",
         "app.model.tonemap_width=8", "app.model.tonemap_depth=2",
         "app.model.brdfnet_width=16", "app.model.brdfnet_depth=3",
         "app.model.env_sg=8"],
        root_dir=REPO_,
    )
    # build OUR model first to learn the true input dims
    density = np.where(
        np.linalg.norm(np.mgrid[-1:1:8j, -1:1:8j, -1:1:8j], axis=0) < 0.7,
        20.0, -20.0,
    ).astype(np.float32)[..., None]
    mask_cache = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6,
                                 1e-3, 3)
    model = ESRNeRF(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache,
                    s_val=80.0, num_voxels=1000)
    ours0 = model.init_params(jax.random.PRNGKey(0))
    X, Y, Z = model.geo.world_size
    C = model.color_dim

    # synthesize the reference state_dict at exactly these dims
    torch.manual_seed(7)
    state = {"sdf.grid": torch.randn(1, 1, X, Y, Z) * 0.1}
    for g in ("off_color", "emo_color", "brdf"):
        state[f"{g}.grid"] = torch.randn(1, C, X, Y, Z) * 0.1
    dim0 = int(ours0["off_rgbnet"]["w0"].shape[0])
    for pref in ("off_rgbnet", "emo_rgbnet"):
        net = ref_pbr.RadianceNet(dim0, 16, 3)
        for k, v in net.state_dict().items():
            state[f"{pref}.{k}"] = v
    tdim = int(ours0["tonemapper"]["w0"].shape[0])
    tm = ref_pbr.TonemapNet(tdim, 8, 2)
    for k, v in tm.state_dict().items():
        state[f"tonemapper.{k}"] = v
    bdim = int(ours0["brdfnet"]["w0"].shape[0])
    bn = ref_pbr.BRDFNet(bdim, 16, 3, mode=object())
    en = ref_pbr.EmissionNet(bdim, 16, 3)
    for k, v in bn.state_dict().items():
        state[f"brdfnet.{k}"] = v
    for k, v in en.state_dict().items():
        state[f"emitnet.{k}"] = v
    sg = ref_pbr.SphericalGaussian(8, "softplus")
    state["envmap.mus"], state["envmap.lambdas"] = sg.mus, sg.lambdas
    state["envmap.lobes"] = sg.lobes

    ref_ckpt = {
        "renderer": {
            "cfg": None, "near": 0.5, "far": 4.0,
            "xyz_min": torch.tensor([-1.0, -1.0, -1.0]),
            "xyz_max": torch.tensor([1.0, 1.0, 1.0]),
            "mask_xyz_min": torch.tensor([-1.0, -1.0, -1.0]),
            "mask_xyz_max": torch.tensor([1.0, 1.0, 1.0]),
            "mask_alpha_init": 1e-6,
            "mask_density": torch.from_numpy(
                density.transpose(3, 0, 1, 2)[None]
            ),
            "s_val": 80.0, "num_voxels": 1000,
            "params": state,
        },
        "trainer": {"global_step": 1234,
                    "batch_st": np.int64(77),
                    "data_idxs": np.arange(10)},
    }
    src = os.path.join(str(tmp_path), "fine.LTS-last.ckpt")
    torch.save(ref_ckpt, src)

    # through the CLI machinery (torch.load + convert + our ckpt writer)
    loaded = torch.load(src, map_location="cpu", weights_only=False)
    payload = convert_checkpoint(loaded, "esrnerf")
    dst = os.path.join(str(tmp_path), "imported.ckpt")
    ckpt_io.save_checkpoint(dst, payload)
    back = ckpt_io.load_checkpoint(dst)
    assert back["trainer"]["global_step"] == 1234
    assert float(back["renderer"]["s_val"]) == 80.0

    # imported params drive our forward (pytree must match init_params)
    params = jax.tree.map(jnp.asarray, back["renderer"]["params"])
    assert set(params) == set(ours0)
    for k in ours0:
        a, b = jax.tree.leaves(params[k]), jax.tree.leaves(ours0[k])
        assert [x.shape for x in a] == [y.shape for y in b], k
    rng = np.random.default_rng(9)
    o = rng.normal(size=(16, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = (-o + rng.normal(scale=0.2, size=(16, 3))).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    out = model.forward_evaluate(
        params, jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd),
        jnp.int32(0), jnp.eye(3), jnp.float32(80.0),
    )
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
