"""Eval overflow auto-retry (VERDICT r2 #9): a march-budget overflow at
eval time must escalate the budgets and re-run the chunk instead of
silently truncating the render — the reference's ragged CUDA kernels can
never drop samples (render_utils_kernel.cu:196-242), so truncation is a
parity corruption unique to the static-budget rebuild."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrnerf_tpu.apps.base import AppClass
from esrnerf_tpu.config import load_cfg

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.quick


def _mk_app(renderer):
    app = AppClass.__new__(AppClass)  # skip __init__ (needs full cfg)
    app.renderer = renderer
    app._mesh = None
    return app


class _FakeGeo:
    def __init__(self):
        self.points_per_ray = 4
        self.points_per_ray_masked = 16


class _FakeRenderer:
    def __init__(self):
        self.geo = _FakeGeo()
        self.points_per_2ndray = 2
        self.points_per_2ndray_masked = 8


def test_scaled_budgets_scales_and_restores():
    r = _FakeRenderer()
    app = _mk_app(r)
    with app.scaled_budgets(4):
        assert r.geo.points_per_ray == 16
        assert r.geo.points_per_ray_masked == 64
        assert r.points_per_2ndray == 8
        assert r.points_per_2ndray_masked == 32
    assert r.geo.points_per_ray == 4
    assert r.geo.points_per_ray_masked == 16
    assert r.points_per_2ndray == 2
    assert r.points_per_2ndray_masked == 8


def test_retry_escalates_until_clean():
    app = _mk_app(_FakeRenderer())
    calls = []

    def fwd_for_scale(scale):
        def fn(x):
            calls.append(scale)
            # overflows at scale 1 and 2, clean at 4
            return {"etc/overflow": 0.0 if scale >= 4 else 0.25, "y": x * scale}

        return fn

    out = app.eval_chunk_retry(fwd_for_scale, 3.0)
    assert calls == [1, 2, 4]
    assert out["y"] == 12.0
    assert float(out["etc/overflow"]) == 0.0
    assert app._overflow_retries == 2


def test_retry_stops_at_cap_and_keeps_overflow_visible():
    app = _mk_app(_FakeRenderer())

    def fwd_for_scale(scale):
        return lambda: {"etc/overflow": 0.5}

    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = app.eval_chunk_retry(fwd_for_scale)
    assert float(out["etc/overflow"]) == 0.5  # caller's track_overflow warns
    assert any("TRUNC" in str(x.message).upper() or "truncat" in
               str(x.message) for x in w), [str(x.message) for x in w]
    # the per-image flag is set and pops exactly once (VERDICT r4 weak #5)
    assert app.pop_eval_truncation() == 0.5
    assert app.pop_eval_truncation() == 0.0


def test_truncation_flag_clean_path():
    app = _mk_app(_FakeRenderer())

    def fwd_for_scale(scale):
        return lambda: {"etc/overflow": 0.0}

    app.eval_chunk_retry(fwd_for_scale)
    assert app.pop_eval_truncation() == 0.0


def test_mean_txt_and_log_eval_skip_none_rows(tmp_path):
    """None metric entries (the truncation flag on clean images) must not
    break mean.txt or the logged means."""
    app = _mk_app(_FakeRenderer())
    app.cfg = type("C", (), {"log": {"dir": str(tmp_path)}})()
    logged = {}
    app.get_logger = lambda: type(
        "L", (), {"log": lambda self, d, step=None: logged.update(d),
                  "log_media": lambda self, **k: None}
    )()
    dirs = {"image": str(tmp_path / "i"), "video": str(tmp_path / "v"),
            "text": str(tmp_path / "t")}
    import os

    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    metrics = {"srgb/PSNR": [30.0, 31.0],
               "etc/truncated_frac": [None, 0.25]}
    app.phase = "test_nv"
    app.global_step = 0
    app.save_renders(dirs, {}, metrics)
    app.log_eval("test_nv/", metrics)
    txt = open(os.path.join(dirs["text"], "mean.txt")).read()
    assert "etc/truncated_frac: 0.25" in txt
    assert "etc/truncated_frac: -" in txt
    assert logged["test_nv/metric/etc/truncated_frac"] == 0.25
    assert logged["test_nv/metric/srgb/PSNR"] == 30.5


def test_retry_on_real_march_recovers_truncated_eval():
    """Force a real overflow with a deliberately tiny primary budget and
    check the escalated trace renders the un-truncated result."""
    from esrnerf_tpu.models.voxurff import VoxurfF
    from esrnerf_tpu.models.voxurf_base import make_mask_cache

    def build(ppr):
        cfg = load_cfg(
            "cfg/app/fine.yaml",
            [
                "app.phase=train",
                "data.cls=esrnerf.ESRNeRF", "data.root=unused",
                "data.scene=unused",
                f"app.model.points_budget_per_ray={ppr}",
                f"app.model.points_budget_masked_per_ray={4 * ppr}",
            ],
            root_dir=REPO,
        )
        g = np.linspace(-1, 1, 16)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        occ = (np.sqrt(xx**2 + yy**2 + zz**2) < 0.7).astype(np.float32)
        density = np.where(occ > 0, 20.0, -20.0)[..., None]
        mc = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6, 1e-3, 3)
        model = VoxurfF(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mc,
                        s_val=220.0, num_voxels=4096)
        params = model.init_params(jax.random.PRNGKey(0))
        return model, params

    model, params = build(ppr=4)  # deliberately too small
    app = _mk_app(model)

    n = 16
    rng = np.random.default_rng(3)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32) - o
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    args = (params, jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd),
            jnp.int32(0), jnp.eye(3), jnp.float32(220.0))

    def fwd_for_scale(scale):
        def builder():
            # fresh closure per scale: jit's trace cache keys on the
            # callable, and equal bound methods collide across scales
            fn = jax.jit(lambda *a: model.forward_evaluate(*a))
            if scale == 1:
                return fn

            def scaled(*a):
                with app.scaled_budgets(scale):
                    return fn(*a)

            return scaled

        return app.cached_jit("eval_fwd", builder, key_extra=(scale,))

    out1 = fwd_for_scale(1)(*args)
    assert float(out1["etc/overflow"]) > 0.0, "budget not small enough"

    out = app.eval_chunk_retry(fwd_for_scale, *args)
    assert float(out["etc/overflow"]) == 0.0

    # the retried render equals an un-truncated reference trace
    model_ref, params_ref = build(ppr=16)
    ref = jax.jit(model_ref.forward_evaluate)(params_ref, *args[1:])
    assert float(ref["etc/overflow"]) == 0.0
    np.testing.assert_allclose(
        np.asarray(out["srgb/rgb"]), np.asarray(ref["srgb/rgb"]),
        rtol=1e-5, atol=1e-6,
    )
