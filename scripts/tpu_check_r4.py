"""On-device (TPU) parity checks for the round-4 landings:

1. phase1_block march: block-granular phase 1 (block-center coarse test +
   exact per-sample re-test) must produce a bitwise-identical March to the
   dense per-sample path on the real backend (Mosaic lowering differs from
   the CPU interpreter, so CPU parity alone is not hardware evidence).
2. sorted_trilinear_sample_multi: the fused multi-grid gather must match
   per-grid sorted_trilinear_sample forward + backward on device.

Prints PASS/FAIL per check; exits non-zero on any FAIL.
"""

from __future__ import annotations

import copy
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check_phase1_block(band=14.0):
    import jax.numpy as jnp

    from esrnerf_tpu.config import load_cfg
    from esrnerf_tpu.models.voxurf_base import VoxurfGeometry, make_mask_cache

    X = Y = Z = 20
    x, y, z = np.mgrid[-1:1:X * 1j, -1:1:Y * 1j, -1:1:Z * 1j]
    sdf = ((x**2 + y**2 + z**2) ** 0.5 - 0.6).astype(np.float32)[..., None]
    density = np.where(np.abs(sdf[..., 0]) < 0.5, 20.0, -20.0).astype(
        np.float32)[..., None]
    mask_cache = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6,
                                 1e-3, 3)
    cfg = load_cfg(
        "cfg/app/coarse.yaml",
        ["app.phase=train", "data.cls=x", "data.root=x", "data.scene=x",
         "app.model.num_voxels=8000",
         "app.model.points_budget_per_ray=256",
         "app.model.points_budget_masked_per_ray=512",
         f"app.model.surf_band_factor={band}"],
        root_dir=REPO,
    )
    geo = VoxurfGeometry(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache)

    rng = np.random.default_rng(9)
    o = rng.normal(size=(48, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
    d = (rng.normal(scale=0.3, size=(48, 3)) - o).astype(np.float32)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    sdf_j = jnp.asarray(sdf)

    def run(blk):
        g = copy.copy(geo)
        g.phase1_block = blk
        g._rebuild_mask_blk()
        return g.march(sdf_j, jnp.asarray(o), jnp.asarray(d),
                       jnp.asarray(vd), 80.0, 1e-4, "interp", style="fine")

    m1, m8 = run(1), run(8)
    ok = float(m1.overflow) == 0.0 and float(m8.overflow) == 0.0
    ok &= int(m1.n_valid) == int(m8.n_valid)
    nv = int(m1.n_valid)
    for field in ("pts", "ray_id", "step_id", "weights", "alpha", "sdf"):
        a = np.asarray(getattr(m1, field))[:nv]
        b = np.asarray(getattr(m8, field))[:nv]
        if not np.array_equal(a, b):
            print(f"  phase1_block mismatch in {field}: "
                  f"{np.abs(a - b).max()}")
            ok = False
    ok &= np.array_equal(np.asarray(m1.alphainv_last),
                         np.asarray(m8.alphainv_last))
    print(f"phase1_block parity (band={band}, n_valid={nv}): "
          f"{'PASS' if ok else 'FAIL'}")
    return ok


def check_multi_gather():
    import jax
    import jax.numpy as jnp

    from esrnerf_tpu.ops import splat as splatops

    rng = np.random.default_rng(11)
    shape3 = (48, 48, 48)
    widths = (6, 6, 3)
    grids = tuple(
        jnp.asarray(rng.standard_normal((*shape3, c)).astype(np.float32))
        for c in widths
    )
    M = 40000
    pts = rng.uniform(0.001, 0.999, size=(M, 3)).astype(np.float32)
    idx = np.floor(pts * (np.array(shape3) - 1)).astype(np.int64)
    base = (idx[:, 0] * shape3[1] + idx[:, 1]) * shape3[2] + idx[:, 2]
    pts = jnp.asarray(pts[np.argsort(base)])
    mn, mx = jnp.zeros(3), jnp.ones(3)
    n_valid = jnp.int32(M - 1000)

    outs, vjp = jax.vjp(
        lambda gs: splatops.sorted_trilinear_sample_multi(
            gs, pts, mn, mx, n_valid),
        grids,
    )
    cts = tuple(
        jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))
        for o in outs
    )
    (dgrids,) = vjp(cts)

    ok = True
    for g, o, ct, dg in zip(grids, outs, cts, dgrids):
        want, vjp_ref = jax.vjp(
            lambda gg: splatops.sorted_trilinear_sample(
                gg, pts, mn, mx, n_valid),
            g,
        )
        if not np.allclose(np.asarray(o), np.asarray(want), rtol=1e-5,
                           atol=1e-5):
            print("  multi-gather fwd mismatch")
            ok = False
        if not np.allclose(np.asarray(dg), np.asarray(vjp_ref(ct)[0]),
                           rtol=2e-4, atol=2e-4):
            print("  multi-gather bwd mismatch")
            ok = False
    print(f"multi-gather parity (M={M}): {'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    import jax

    print("backend:", jax.devices())
    ok = True
    for check in (check_multi_gather, check_phase1_block,
                  lambda: check_phase1_block(band=0.0)):
        try:
            ok &= bool(check())
        except Exception:
            import traceback

            traceback.print_exc()
            ok = False
    sys.exit(0 if ok else 1)
