"""Compute ops: the TPU-native replacements for the reference's CUDA
extensions (`render_utils_cuda`, `total_variation_cuda`) and torch ops.

Everything here is pure jax.numpy (differentiable, jit-able); the Pallas
fused variants live under ``esrnerf_tpu.ops.pallas`` and are drop-in
replacements for the hot paths.
"""

from esrnerf_tpu.ops import encoding, grid, image, pbr, ray, render, tv  # noqa: F401
