"""sRGB gamma, HSV, PBR function parity (reference ``utils2/image.py``,
``app/utils/pbr/functions.py``)."""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

from esrnerf_tpu.ops import image, pbr

pytestmark = pytest.mark.quick


def test_gamma_roundtrip_and_values():
    x = jnp.asarray(np.linspace(0, 1, 513), dtype=jnp.float32)
    y = image.apply_gamma_curve(x)
    back = image.remove_gamma_curve(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    # spot values of the exact OETF
    assert abs(float(image.apply_gamma_curve(jnp.float32(0.002))) - 12.92 * 0.002) < 1e-7
    assert (
        abs(float(image.apply_gamma_curve(jnp.float32(0.5)))
            - (1.055 * 0.5 ** (1 / 2.4) - 0.055)) < 1e-6
    )


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0.05, 1.0, (128, 3)), dtype=jnp.float32)
    hsv = image.rgb_to_hsv(rgb)
    back = image.hsv_to_rgb(hsv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def _np_disney(albedo, roughness, metallic, normal, win, wout):
    EPS = 1e-7

    def norm(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    def d(a, b):
        return (a * b).sum(-1, keepdims=True)

    h = norm(win + wout)
    noh = np.clip(d(normal, h), 0, None)
    ooh = np.clip(d(wout, h), 0, None)
    ion = np.clip(d(win, normal), 0, None)
    oon = np.clip(d(wout, normal), 0, None)

    fd = (1 - metallic) * albedo / math.pi
    r2 = np.clip(roughness * roughness, EPS, None)
    D = (1 / (r2 * math.pi)) * np.exp((2 / r2) * (noh - 1))
    F0 = 0.04 * (1 - metallic) + albedo * metallic
    F = F0 + (1 - F0) * (1 - ooh) ** 5

    def v(cos):
        k = ((1 + roughness) ** 2) / 8
        return 0.5 / np.clip(cos * (1 - k) + k, EPS, None)

    fs = D * F * v(ion) * v(oon)
    return (fd + fs) * ion * math.pi * 2


def test_disney_reflection_matches_reference_formula():
    rng = np.random.default_rng(1)
    n = 64
    albedo = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    rough = rng.uniform(0.05, 1, (n, 1)).astype(np.float32)
    metal = rng.uniform(0, 1, (n, 1)).astype(np.float32)

    def unit(shape):
        v = rng.normal(size=shape).astype(np.float32)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    normal, win, wout = unit((n, 3)), unit((n, 3)), unit((n, 3))
    ours = pbr.disney_reflection(
        jnp.asarray(albedo), jnp.asarray(rough), jnp.asarray(metal),
        jnp.asarray(normal), jnp.asarray(win), jnp.asarray(wout),
    )
    ref = _np_disney(albedo, rough, metal, normal, win, wout)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_fibonacci_hemisphere_is_unit_and_upper():
    dirs = pbr.fibonacci_hemisphere(64)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-6)
    assert (dirs[:, 2] >= 0).all()


def test_diffuse_scattering_in_hemisphere():
    key = jax.random.PRNGKey(0)
    normal = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    dirs = pbr.diffuse_scattering(key, normal, 32)
    cos = (np.asarray(dirs) * np.asarray(normal)[:, None, :]).sum(-1)
    assert (cos >= 0).all()
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(dirs), axis=-1), 1.0, atol=1e-5
    )


def test_sg_envmap_energy_normalized_init():
    params = pbr.init_sg_params(jax.random.PRNGKey(0), 48, "softplus")
    dirs = jnp.asarray(pbr.fibonacci_sphere(512))
    vals = pbr.sg_envmap(params["mus"], params["lambdas"], params["lobes"], dirs)
    assert np.asarray(vals).shape == (512, 3)
    assert np.isfinite(np.asarray(vals)).all()
    # energy-normalized init keeps mean radiance order-of-1 ("*0.8" target)
    mean = float(np.asarray(vals).mean())
    assert 0.005 < mean < 5.0
