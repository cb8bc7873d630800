"""Crash bisect: run each production family shape standalone on the TPU.

Usage: python scripts/bench_family_shapes.py <case>
  tz  taps z-axis   family=(1,6)      C=1
  ty  taps y-axis   family=(257,6)    C=1
  tx  taps x-axis   family=(66049,6)  C=1
  c6  trilinear     family=(1,2)      C=6
Validates against the XLA oracle (max |diff|).
"""

import sys

import numpy as np

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from esrnerf_tpu.ops import splat as sp


def main():
    case = sys.argv[1]
    X = Y = Z = 257
    R = X * Y * Z
    M = 524288
    rng = np.random.default_rng(0)
    sb, sc = {"tz": (Y * Z, Z), "ty": (Y * Z, 1), "tx": (Z, 1)}.get(
        case, (None, None))
    if case.startswith("t"):
        sa = {"tz": 1, "ty": Z, "tx": Y * Z}[case]
        W, C = 6, 1
        offsets = tuple(db * sb + dc * sc + w * sa
                        for db in (0, 1) for dc in (0, 1) for w in range(W))
        fam = (sa, W)
        weights = None
    else:
        # C>1 weighted: family mode is forbidden (multi-row lane roll
        # faults the TPU worker) — exercise the per-offset path
        sa, W, C = 1, 2, 6
        offsets = tuple((d >> 2 & 1) * Y * Z + (d >> 1 & 1) * Z + (d & 1)
                        for d in range(8))
        fam = None
        weights = rng.standard_normal((M, 8)).astype(np.float32)

    hi = R - max(offsets) - 2
    p = rng.normal(size=(M, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    p = p * rng.uniform(0, 0.8, (M, 1)) ** (1 / 3)
    idx = np.clip(((p + 1) / 2 * 250), 0, 250).astype(np.int64)
    base = np.sort((idx[:, 0] * Y + idx[:, 1]) * Z + idx[:, 2])
    base = np.clip(base, 0, hi).astype(np.int32)

    table = rng.standard_normal((R, C)).astype(np.float32)
    out = sp.sorted_corner_gather(
        jnp.asarray(table), jnp.asarray(base),
        None if weights is None else jnp.asarray(weights),
        offsets, raw=weights is None, family=fam,
    )
    out = np.asarray(out)
    if weights is None:
        want = np.stack([table[base + o, 0] for o in offsets], -1)
    else:
        want = sum(weights[:, d:d + 1] * table[base + offsets[d]]
                   for d in range(8))
    print(case, "max|diff|", np.abs(out - want).max(), "ok")


if __name__ == "__main__":
    main()
