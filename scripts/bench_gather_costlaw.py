"""Diagnostic: what drives sorted_corner_gather cost — pieces, chunks, or
fixed overhead? Same static shapes (one compile), three base distributions:

  shell : ~10k real points on a thin shell, 98% pads (fine-stage-like)
  ball  : all 524k real, sorted, uniform inside a 0.8-radius ball
          (secondary-march-like: spans most of the occupied grid)
  tight : all 524k real, sorted, packed into a single 16-slab band
          (best-case locality)

Each prints ms/call for the 24-offset raw taps at 16.7M rows. Timing via
float() transfer (the only true sync through the tunnel).
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


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    f = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(f)
    return dt


def sorted_cells(pts, X, Y, Z):
    idx = np.clip(((pts + 1) / 2 * (X - 1)), 0, X - 2).astype(np.int64)
    cells = (idx[:, 0] * Y + idx[:, 1]) * Z + idx[:, 2]
    cells.sort()
    return cells.astype(np.int32)


def npc_estimate(base, W=6):
    from esrnerf_tpu.ops import splat as _sp
    GCH, GCAP = _sp._GCH, 98304
    span = max(db * 66049 + dc * 257 + jj
               for db in (0, 1) for dc in (0, 1) for jj in range(W)) + 2
    nch = len(base) // GCH
    b = base.reshape(nch, GCH)
    cmin, cmax = b.min(1), b.max(1)
    w0 = (cmin // 128) * 128
    return int(np.ceil((cmax + span - w0) / GCAP).clip(0).sum())


def main():
    X = Y = Z = 257
    R = X * Y * Z
    M = 524288
    rng = np.random.default_rng(0)
    W = 6
    tap_offsets = tuple(db * Y * Z + dc * Z + jj
                        for db in (0, 1) for dc in (0, 1)
                        for jj in range(W))

    # shell (98% pad)
    p = rng.normal(size=(10000, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True) * 0.7
    c = sorted_cells(p, X, Y, Z)
    shell = np.concatenate([c, np.full(M - len(c), c[-1], np.int32)])

    # ball (all real, global span)
    p = rng.normal(size=(M, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    p = p * rng.uniform(0, 0.8, (M, 1)) ** (1 / 3)
    ball = sorted_cells(p, X, Y, Z)

    # tight band (all real, 16 x-slabs)
    p = rng.uniform(-1, 1, (M, 3))
    p[:, 0] = rng.uniform(-0.06, 0.06, M)
    tight = sorted_cells(p, X, Y, Z)

    table1 = jnp.asarray(rng.normal(size=(R, 1)).astype(np.float32))
    fam = (1, W) if os.environ.get("ESR_FAMILY", "1") == "1" else None
    kern = jax.jit(lambda t, b: sp.sorted_corner_gather(
        t, b, None, tap_offsets, raw=True, family=fam))

    for name, base in (("shell", shell), ("ball", ball), ("tight", tight)):
        nv = jnp.asarray(base)
        est = npc_estimate(base, W)
        dt = timeit(kern, table1, nv) * 1e3
        print(f"{name:6s}: {dt:8.1f} ms   est_total_pieces={est}"
              f"   ms/piece={dt/max(est,1):.3f}")


if __name__ == "__main__":
    main()
