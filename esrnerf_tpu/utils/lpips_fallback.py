"""Deterministic offline LPIPS fallback: AlexNet-topology random features.

The reference computes LPIPS-alex on every eval
(``/root/reference/utils2/metric.py:15-28``). This sandbox has zero
network egress, so the calibrated ImageNet-pretrained backbone cannot be
obtained here; when no real bundle is committed/pointed at (see
``metrics._load_lpips``), this module provides a *deterministic*
perceptual distance with the same structure:

- an AlexNet-shaped 5-stage conv feature pyramid (64/192/384/256/256
  channels, same kernel sizes/strides/padding as torchvision's AlexNet
  features) with He-initialized weights drawn from a pinned
  ``numpy.random.Philox`` counter stream (bit-stable across NumPy
  releases and platforms — no weight binary needs committing);
- unit-normalized feature differences, squared, averaged spatially,
  uniformly weighted across channels and summed over stages — exactly the
  LPIPS formula with the calibration vector replaced by 1/C.

This is the "random network" baseline of the LPIPS paper (Zhang et al.
2018, Table 5: random AlexNet features already correlate strongly with
human judgments); values are NOT comparable to calibrated lpips-alex
numbers and are logged with a one-time provenance warning. Drop a real
bundle in ``assets/lpips_alex.pt`` (built by
``scripts/make_lpips_bundle.py`` on a connected machine) to get the real
metric — the loader prefers it automatically.
"""

from __future__ import annotations

import functools

import numpy as np

# (out_ch, in_ch, ksize, stride, pad, maxpool_after) per conv stage —
# torchvision AlexNet ``features`` topology.
_STAGES = (
    (64, 3, 11, 4, 2, True),
    (192, 64, 5, 1, 2, True),
    (384, 192, 3, 1, 1, False),
    (256, 384, 3, 1, 1, False),
    (256, 256, 3, 1, 1, True),
)

# ImageNet normalization, as the lpips package's ScalingLayer applies to
# [-1, 1] inputs: (x - shift) / scale with shift/scale in [-1,1] units.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@functools.lru_cache(maxsize=1)
def _weights():
    """He-init conv kernels from a pinned Philox counter stream."""
    rng = np.random.Generator(np.random.Philox(key=0x5E5F_1E37))
    ws = []
    for oc, ic, k, _s, _p, _mp in _STAGES:
        std = np.sqrt(2.0 / (ic * k * k))
        ws.append(
            (rng.standard_normal((oc, ic, k, k)) * std).astype(np.float32)
        )
    return ws


@functools.lru_cache(maxsize=1)
def _distance_fn():
    import jax
    import jax.numpy as jnp

    def dist(im0, im1, *ws):
        # im: [1, 3, H, W] in [-1, 1]
        def feats(x):
            x = (x - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
            out = []
            for w, (_oc, _ic, _k, s, p, mp) in zip(ws, _STAGES):
                x = jax.lax.conv_general_dilated(
                    x, w, (s, s), [(p, p), (p, p)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                )
                x = jax.nn.relu(x)
                out.append(x)
                if mp:
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                        "VALID",
                    )
            return out

        total = jnp.float32(0.0)
        for f0, f1 in zip(feats(im0), feats(im1)):
            n0 = f0 / jnp.sqrt((f0 * f0).sum(1, keepdims=True) + 1e-10)
            n1 = f1 / jnp.sqrt((f1 * f1).sum(1, keepdims=True) + 1e-10)
            d = (n0 - n1) ** 2
            # uniform calibration 1/C, spatial mean — LPIPS formula with
            # lin-layer weights replaced by a constant vector
            total = total + d.mean(axis=(2, 3)).mean(axis=1).sum()
        return total

    return jax.jit(dist, backend="cpu")


def rand_lpips(gt: np.ndarray, im: np.ndarray) -> float:
    """Distance between two ``[3, H, W]`` float tensors in [-1, 1]."""
    fn = _distance_fn()
    ws = _weights()
    a = np.asarray(gt, np.float32)[None]
    b = np.asarray(im, np.float32)[None]
    # AlexNet's stride-4 conv1 + three pools need >= ~17px inputs; tile
    # small probes up rather than crash (metrics tests use 8x8 images)
    h, w = a.shape[-2:]
    if h < 32 or w < 32:
        ry, rx = -(-32 // h), -(-32 // w)
        a = np.tile(a, (1, 1, ry, rx))
        b = np.tile(b, (1, 1, ry, rx))
    return float(fn(a, b, *ws))


class RandLPIPS:
    """Callable with the metrics scorer contract: (gt, im, normalize)."""

    provenance = (
        "deterministic random-feature LPIPS fallback (uncalibrated; "
        "commit assets/lpips_<net>.pt for the real metric)"
    )

    def __call__(self, gt, im, normalize: bool = True):
        import torch

        if normalize:  # [0,1] -> [-1,1]
            gt, im = 2 * gt - 1, 2 * im - 1
        return torch.tensor(
            rand_lpips(np.asarray(gt), np.asarray(im))
        )
