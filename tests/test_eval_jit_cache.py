"""Eval jits must be traced once per app lifetime (VERDICT r1 weak #5:
every evaluate() used to build a fresh jax.jit wrapper — seconds of
re-tracing per eval at production graph sizes)."""

import pytest
import jax

from esrnerf_tpu.apps.base import AppClass

pytestmark = pytest.mark.quick


class _DummyCfg(dict):
    def __getattr__(self, k):
        return self[k]


def _mk_app():
    app = AppClass.__new__(AppClass)  # skip __init__ (needs full cfg)
    app.renderer = object()
    return app


def test_cached_jit_returns_same_callable():
    app = _mk_app()
    traces = []

    def build():
        @jax.jit
        def f(x):
            traces.append(1)
            return x * 2

        return f

    f1 = app.cached_jit("eval_fwd", build)
    f2 = app.cached_jit("eval_fwd", build)
    assert f1 is f2
    f1(jax.numpy.ones(4))
    f2(jax.numpy.ones(4))
    assert len(traces) == 1  # second call: zero tracing


def test_cached_jit_rebuilds_on_renderer_swap_and_key_change():
    app = _mk_app()
    f1 = app.cached_jit("eval_fwd", lambda: (lambda x: x))
    # progressive grid scaling replaces the renderer -> must re-jit
    app.renderer = object()
    f2 = app.cached_jit("eval_fwd", lambda: (lambda x: x))
    assert f1 is not f2
    # key_extra change (e.g. emit_grid_key flip) -> must re-jit
    f3 = app.cached_jit("eval_fwd", lambda: (lambda x: x), key_extra=("a",))
    assert f3 is not f2
    # distinct names are cached independently
    g1 = app.cached_jit("lts_chunk", lambda: (lambda x: x))
    assert app.cached_jit("lts_chunk", lambda: (lambda x: x)) is g1
