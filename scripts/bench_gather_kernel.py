"""Microbench: sorted_corner_gather at the production march shapes.

Compares the kernel against XLA's row-gather lowering at the exact call
shapes the fine/LTS steps make (524k cell-sorted points with ~98% pads
collapsed to the max cell, 16.7M-row table): 24-offset raw taps and
8-corner weighted C=6 color reads. ESR_GATHER_PRECISION=default|high|highest
selects the one-hot matmul precision (set before import).

Timing per the playbook: only float() transfers sync through the tunnel.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from esrnerf_tpu.ops import splat as sp


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    f = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(f)
    return dt


def main():
    X = Y = Z = 256
    R = X * Y * Z
    M = 524288
    rng = np.random.default_rng(0)

    # march-like base: ~2% real points on a spherical shell (cell-sorted),
    # pads collapsed to the max real cell
    n_real = 10000
    pts = rng.normal(size=(n_real, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 0.7
    idx = ((pts + 1) / 2 * (X - 1)).astype(np.int64)
    cells = (idx[:, 0] * Y + idx[:, 1]) * Z + idx[:, 2]
    cells.sort()
    base = np.concatenate([cells, np.full(M - n_real, cells[-1])])
    base = base.astype(np.int32)

    # production contract (ops/grid.py displaced_taps): the base is
    # pre-shifted down so every offset is NON-NEGATIVE (the kernel sweeps
    # pieces forward from the chunk min; negative offsets would silently
    # read as zeros) — model the x-axis window: 4 (b,c) corners x W slots
    W = 6
    tap_offsets = tuple(db * Y * Z + dc * Z + jj
                        for db in (0, 1) for dc in (0, 1)
                        for jj in range(W))  # 24
    corner_offsets = tuple(
        (dd >> 2 & 1) * Y * Z + (dd >> 1 & 1) * Z + (dd & 1) for dd in range(8)
    )

    table1 = jnp.asarray(rng.normal(size=(R, 1)).astype(np.float32))
    table6 = jnp.asarray(rng.normal(size=(R, 6)).astype(np.float32))
    w8 = jnp.asarray(rng.uniform(size=(M, 8)).astype(np.float32))
    base_j = jnp.asarray(base)

    n_valid = jnp.int32(n_real)
    kern_taps = jax.jit(lambda t, b: sp.sorted_corner_gather(
        t, b, None, tap_offsets, raw=True))
    kern_col = jax.jit(lambda t, b, w: sp.sorted_corner_gather(
        t, b, w, corner_offsets))
    kern_taps_nv = jax.jit(lambda t, b, nv: sp.sorted_corner_gather(
        t, b, None, tap_offsets, raw=True, n_valid=nv))
    kern_col_nv = jax.jit(lambda t, b, w, nv: sp.sorted_corner_gather(
        t, b, w, corner_offsets, n_valid=nv))

    def xla_taps(t, b):
        outs = [jnp.take(t[:, 0], jnp.clip(b + o, 0, R - 1)) for o in tap_offsets]
        return jnp.stack(outs, -1)

    def xla_col(t, b, w):
        out = jnp.zeros((M, 6), jnp.float32)
        for i, o in enumerate(corner_offsets):
            out = out + w[:, i:i + 1] * jnp.take(
                t, jnp.clip(b + o, 0, R - 1), axis=0)
        return out

    prec = os.environ.get("ESR_GATHER_PRECISION", "high")
    print(f"precision={prec}")
    print(f"kernel taps 24xC1 : {timeit(kern_taps, table1, base_j)*1e3:8.1f} ms")
    print(f"kernel taps +skip : {timeit(kern_taps_nv, table1, base_j, n_valid)*1e3:8.1f} ms")
    print(f"xla    taps 24xC1 : {timeit(jax.jit(xla_taps), table1, base_j)*1e3:8.1f} ms")
    print(f"kernel col 8xC6   : {timeit(kern_col, table6, base_j, w8)*1e3:8.1f} ms")
    print(f"kernel col  +skip : {timeit(kern_col_nv, table6, base_j, w8, n_valid)*1e3:8.1f} ms")
    print(f"xla    col 8xC6   : {timeit(jax.jit(xla_col), table6, base_j, w8)*1e3:8.1f} ms")

    # correctness cross-check at the chosen precision (valid rows only for
    # the +skip variants — pad rows intentionally read as zeros)
    k = np.asarray(kern_taps(table1, base_j))
    x = np.asarray(jax.jit(xla_taps)(table1, base_j))
    print("taps max |diff|:", np.abs(k - x).max())
    kv = np.asarray(kern_taps_nv(table1, base_j, n_valid))
    print("taps+skip valid-row max |diff|:", np.abs(kv - x)[:n_real].max())
    k6 = np.asarray(kern_col(table6, base_j, w8))
    x6 = np.asarray(jax.jit(xla_col)(table6, base_j, w8))
    print("col  max |diff|:", np.abs(k6 - x6).max())
    k6v = np.asarray(kern_col_nv(table6, base_j, w8, n_valid))
    print("col +skip valid-row max |diff|:", np.abs(k6v - x6)[:n_real].max())


if __name__ == "__main__":
    main()
