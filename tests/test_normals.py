"""Regression: every normal handed to the BRDF must be unit length.

Round-5 bug: ``jnp.linalg.norm(exp_grad, -1, keepdims=True)`` passed -1 as
the ``ord`` argument (a matrix norm), not ``axis`` — normals came out with
|n| up to ~5, and the Disney D term ``exp((2/r^2)(n.h - 1))`` explodes for
n.h > 1 (the relight finetune target overflowed to inf; forward_evaluate's
PBR decomposition was silently wrong). These tests pin the unit-norm
contract at both call sites (esrnerf.py:513,651).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as g

    model, params = g._tiny_model_and_params()
    model.pdra_mode = True
    return model, params


def _surface_batch(n):
    """Rays from outside aimed at the occupancy blob (guaranteed hits)."""
    rng = np.random.default_rng(7)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.5
    d = -o + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d.astype(np.float32)), jnp.asarray(vd)


@pytest.mark.full
def test_finetune_normal_unit_and_target_bounded(tiny):
    model, params = tiny
    full = dict(params)
    full["emit_color"] = jnp.copy(full["emo_color"])
    n = 16
    ro, rd, vd = _surface_batch(n)
    rng = np.random.default_rng(0)
    res = model.forward_finetune(
        {k: full[k] for k in ("emo_color", "emo_rgbnet")},
        {k: v for k, v in full.items()
         if k not in ("emo_color", "emo_rgbnet")},
        ro, rd, vd,
        jnp.asarray(rng.integers(0, 5, n)),
        jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32)),
        jnp.float32(220.0), jax.random.PRNGKey(0),
    )
    hat = np.asarray(res["lin/pbr/emo_hat"], np.float64)
    valid = np.asarray(res["lin/pbr/valid"])
    assert valid.any(), "no valid surface points — scene setup regressed"
    assert np.isfinite(hat).all()
    # with O(1) radiances and sane BRDF inputs the target is O(100) at
    # most; the ord-bug produced 1e12..inf here
    assert np.abs(hat[valid]).max() < 1e4, np.abs(hat[valid]).max()


def test_evaluate_pbr_normals_unit(tiny):
    model, params = tiny
    n = 16
    ro, rd, vd = _surface_batch(n)
    out = model.forward_evaluate(
        params, ro, rd, vd, jnp.int32(1), jnp.eye(3),
        jnp.float32(220.0), render_pbr=True,
    )
    assert "pbr_points" in out, "render_pbr eval must emit pbr_points"
    nrm = np.asarray(out["pbr_points"]["normal"], np.float64)
    pad = np.asarray(out["pbr_points"]["pad"])
    norms = np.linalg.norm(nrm[~pad], axis=-1)
    if norms.size:
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
