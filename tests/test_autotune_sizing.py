"""Unit tests for the budget-autotune sizing math (the e2e behavior is
covered by tests/test_budget_autotune.py; these pin the arithmetic)."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick


class _Geo:
    phase1_block = 8
    points_per_ray_masked = 256
    points_per_ray = 64


class _Model:
    def __init__(self):
        self.geo = _Geo()


def _app(model, enabled=True, target=0.65):
    from esrnerf_tpu.apps.base import AppClass

    app = AppClass.__new__(AppClass)
    app.cfg = type("C", (), {})()
    app.cfg.app = {"model": {"budget_autotune": enabled,
                             "budget_autotune_target": target}}
    app.renderer = model
    return app


def test_sizes_toward_target_and_rounds_to_block():
    model = _Model()
    app = _app(model)
    changed = app.maybe_autotune_budgets({"k1": 0.25, "k2": 0.023})
    assert changed
    # 256 * 0.25 / 0.65 = 98.5 -> next multiple of blk(8) = 104
    assert model.geo.points_per_ray_masked == 104
    # 64 * 0.023 / 0.65 = 2.26 -> mult 4, floor 4
    assert model.geo.points_per_ray == 4
    # one-shot: second call is a no-op
    assert not app.maybe_autotune_budgets({"k1": 0.01, "k2": 0.01})


def test_growth_bounded_and_floors():
    model = _Model()
    app = _app(model)
    app.maybe_autotune_budgets({"k1": 1.0, "k2": 0.0})
    # frac 1.0 grows by at most 1/target
    assert model.geo.points_per_ray_masked == 400  # ceil(256/0.65/8)*8
    assert model.geo.points_per_ray == 4  # frac<=0 -> floor
    # NaN telemetry also floors rather than crashing
    m2 = _Model()
    a2 = _app(m2)
    a2.maybe_autotune_budgets({"k1": float("nan"), "k2": 0.5})
    assert m2.geo.points_per_ray_masked == 16  # lo = 2*blk
    assert m2.geo.points_per_ray == 52  # ceil(64*0.5/0.65/4)*4


def test_disabled_is_noop():
    model = _Model()
    app = _app(model, enabled=False)
    assert not app.maybe_autotune_budgets({"k1": 0.1, "k2": 0.1})
    assert model.geo.points_per_ray_masked == 256
