"""Image-space ops: exact sRGB OETF pair and RGB<->HSV conversions.

Reference: ``utils2/image.py:14-81`` and the duplicated HSV pair in
``app/utils/pbr/functions.py:214-255``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def apply_gamma_curve(image: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB (exact piecewise OETF)."""
    low = 12.92 * image
    # clip the argument so the unused pow branch stays finite for autodiff
    high = 1.055 * jnp.power(jnp.maximum(image, 1e-12), 1.0 / 2.4) - 0.055
    return jnp.where(image <= 0.0031308, low, high)


def remove_gamma_curve(image: jnp.ndarray) -> jnp.ndarray:
    """sRGB -> linear (exact piecewise EOTF)."""
    low = image / 12.92
    high = jnp.power(jnp.maximum((image + 0.055) / 1.055, 1e-12), 2.4)
    return jnp.where(image < 0.04045, low, high)


def mse2psnr(mse) -> jnp.ndarray:
    return -10.0 * jnp.log(jnp.asarray(mse)) / np.log(10.0)


def tensor2img(x: np.ndarray) -> np.ndarray:
    """0~1 float -> 0~255 uint8."""
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)


def rgb_to_hsv(rgb: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Kornia-style RGB->HSV with h in [0, 1)."""
    max_rgb = rgb.max(-1)
    argmax_rgb = rgb.argmax(-1)
    min_rgb = rgb.min(-1)
    deltac = max_rgb - min_rgb

    v = max_rgb
    s = deltac / (max_rgb + eps)

    deltac_safe = jnp.where(deltac == 0, 1.0, deltac)
    diff = max_rgb[..., None] - rgb
    rc, gc, bc = diff[..., 0], diff[..., 1], diff[..., 2]

    h1 = bc - gc
    h2 = (rc - bc) + 2.0 * deltac_safe
    h3 = (gc - rc) + 4.0 * deltac_safe
    h = jnp.stack([h1, h2, h3], axis=-1) / deltac_safe[..., None]
    h = jnp.take_along_axis(h, argmax_rgb[..., None], axis=-1)[..., 0]
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    hi = jnp.floor(h * 6) % 6
    f = ((h * 6) % 6) - hi
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)

    hi = hi.astype(jnp.int32)
    indices = jnp.stack([hi, hi + 6, hi + 12], axis=-1)
    table = jnp.stack(
        [v, q, p, p, t, v, t, v, v, q, p, p, p, p, t, v, v, q], axis=-1
    )
    return jnp.take_along_axis(table, indices, axis=-1)
