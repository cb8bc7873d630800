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
