"""Pallas transmittance-scan kernel vs the jnp dense oracle — forward and
the hand-written reverse-scan backward. On CPU the default path is the
vectorized jnp mirror (interpret-mode Pallas costs seconds per march);
``ESR_SCAN_INTERPRET=1`` forces the interpreted kernel so its logic stays
covered off-TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrnerf_tpu.ops import render as renderops
from esrnerf_tpu.ops import scan as scanops

pytestmark = pytest.mark.quick


def test_jnp_mirror_matches_interpreted_kernel(monkeypatch):
    """The CPU fast path must reproduce the kernel's exact semantics,
    including the early-exit freeze and the division-form backward."""
    rng = np.random.default_rng(3)
    N, S = 9, 24
    alpha = rng.uniform(0, 0.95, (N, S)).astype(np.float32)
    alpha[2] = 0.9999  # deep early-exit ray
    alpha[4] = 0.0
    a = jnp.asarray(alpha)
    ctw = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
    ctl = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def run():
        def loss(x):
            w, last = scanops.alpha2weights_pallas(x, 1e-3)
            return (w * ctw).sum() + (last * ctl).sum()

        (w, last) = scanops.alpha2weights_pallas(a, 1e-3)
        return w, last, jax.grad(loss)(a)

    w_j, last_j, g_j = run()
    monkeypatch.setenv("ESR_SCAN_INTERPRET", "1")
    w_k, last_k, g_k = run()
    np.testing.assert_allclose(np.asarray(w_j), np.asarray(w_k),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(last_j), np.asarray(last_k),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_j), np.asarray(g_k),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("ee", [1e-3, None])
def test_pallas_scan_matches_dense(seed, ee):
    rng = np.random.default_rng(seed)
    N, S = 37, 53
    alpha = rng.uniform(0, 0.9, (N, S)).astype(np.float32)
    # saturated samples + fully-empty rays
    alpha[3, 10] = 1.0
    alpha[5] = 0.0
    mask = rng.uniform(size=(N, S)) > 0.3
    alpha = jnp.asarray(np.where(mask, alpha, 0.0))

    w_ref, last_ref = renderops.alpha2weights(alpha, None, early_exit=ee)
    ee_k = -1.0 if ee is None else ee
    w_k, last_k = scanops.alpha2weights_pallas(alpha, ee_k)

    np.testing.assert_allclose(np.asarray(w_k), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(last_k), np.asarray(last_ref),
                               rtol=1e-5, atol=1e-7)

    # gradients — away from exact saturation (at alpha == 1 the kernel
    # reproduces the CUDA division-form backward, which differs from
    # cumprod autodiff; see ops/scan.py docstring)
    alpha = jnp.minimum(alpha, 0.999)
    ctw = jnp.asarray(rng.normal(size=(N, S)).astype(np.float32))
    ctl = jnp.asarray(rng.normal(size=(N,)).astype(np.float32))

    def loss_ref(a):
        w, last = renderops.alpha2weights(a, None, early_exit=ee)
        return (w * ctw).sum() + (last * ctl).sum()

    def loss_k(a):
        w, last = scanops.alpha2weights_pallas(a, ee_k)
        return (w * ctw).sum() + (last * ctl).sum()

    g_ref = jax.grad(loss_ref)(alpha)
    g_k = jax.grad(loss_k)(alpha)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
