"""Benchmark: LTS-stage training throughput — the pipeline's heaviest
workload (reference cfg/app/lts.yaml:41-59: 40k iters x 8,192 primary rays,
each step spawning num_ltspts(100) x num_2ndrays(256) secondary rays whose
incoming radiance is volume-rendered, esrnerf.py:534-651).

Drives the REAL LTS trainer step (apps/lts.py::_build_train_step — jit on
one device, shard_map on a mesh). Prints one JSON line:
  {"metric": "lts_train_rays_per_sec", "value": N, "unit": "rays/s", ...}
where rays/s counts PRIMARY rays (the reference's unit), and the JSON also
reports the secondary-ray rate.

Env knobs: BENCH_NUM_VOXELS, BENCH_BATCH, BENCH_ITERS, BENCH_TRACE_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    # fuse the off/emo/brdf splat backwards into one 18-channel sweep
    # (16.7M x cpad(18) x 4B = 1.6 GB transient, fits the single-batch
    # LTS step: 1.535 -> 1.457 s/step measured r5). Env wins if set.
    os.environ.setdefault("ESR_SPLAT_MULTI_BWD_CAP", "1700000000")

    import jax

    # sitecustomize pins the axon TPU backend before env vars can take
    # effect; BENCH_PLATFORM=cpu forces a local run through jax.config
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from esrnerf_tpu.apps.lts import LTS
    from esrnerf_tpu.config import load_cfg
    from esrnerf_tpu.models.esrnerf import ESRNeRF
    from esrnerf_tpu.models.voxurf_base import make_mask_cache
    from esrnerf_tpu.optim import Adam

    num_voxels = int(os.environ.get("BENCH_NUM_VOXELS", 16777216))
    batch = int(os.environ.get("BENCH_BATCH", 8192))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    warmup = 2

    cfg = load_cfg(
        "cfg/app/lts.yaml",
        [
            "app.phase=train",
            "data.cls=esrnerf.ESRNeRF", "data.root=unused", "data.scene=unused",
            f"app.trainer.batch_size={batch}",
            # phase-1 budgets sized for the SDF surface-band cull
            # (surf_band_factor=14 at s_val=220 keeps a ~16-voxel shell
            # around the ball surface; ~64 samples per crossing at step
            # 0.5). Overflow is asserted 0 below — without the band cull
            # the fully-occupied ball interior needed 384/ray
            # 160/96 measured r5: overflow 0 at k1_frac 0.905/0.695 (the
            # r5 overlapping band-corner windows grew the conservative
            # superset ~12%; 144 overflowed 0.6%)
            "app.model.points_budget_masked_per_ray="
            + os.environ.get("BENCH_MASKED_PER_RAY", "160"),
            "app.model.points_budget_masked_per_2ndray="
            + os.environ.get("BENCH_MASKED_PER_2NDRAY", "96"),
            # block-granular phase 1 (8 = default; 1 = per-sample parity
            # path). Blocks enter K1 whole, so the primary budget needs
            # ~10% headroom over the BLK=1 advisor numbers (128 -> 144).
            "app.model.phase1_block="
            + os.environ.get("BENCH_PHASE1_BLOCK", "8"),
            # phase-2 budgets: every downstream row count (head MLPs, tap
            # sweeps, splat streams) is K2 = N * per_ray. At s_val=220 a
            # ray keeps ~1-2 weight-threshold survivors, so the 64/24
            # defaults ran at 2-3% utilization
            "app.model.points_budget_per_ray="
            + os.environ.get("BENCH_PER_RAY", "8"),
            "app.model.points_budget_per_2ndray="
            + os.environ.get("BENCH_PER_2NDRAY", "8"),
        ],
        root_dir=REPO,
    )

    g = np.linspace(-1, 1, 64)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    density = np.where(
        np.sqrt(xx**2 + yy**2 + zz**2) < 0.7, 20.0, -20.0
    ).astype(np.float32)[..., None]
    mask_cache = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6,
                                 1e-3, 3)

    app = LTS(cfg)
    model = ESRNeRF(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache,
                    s_val=220.0, num_voxels=num_voxels)
    app.renderer = model
    params = model.init_params(jax.random.PRNGKey(0))
    app.opt = Adam({k: 1e-2 for k in params})
    opt_state = app.opt.init(params)
    train_step = app._build_train_step()

    lrs = {k: jnp.float32(1.0) for k in params}
    n_sec = model.num_ltspts * model.num_2ndrays

    def make_batch(seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(batch, 3)).astype(np.float32)
        o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
        d = (r.normal(scale=0.3, size=(batch, 3)) - o).astype(np.float32)
        vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
        return {
            "rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(vd),
            "em_modes": jnp.asarray(r.integers(0, 2, batch)),
            "uncert_masks": jnp.asarray(r.uniform(size=batch) > 0.3),
            "rgbs": jnp.asarray(r.uniform(0, 1, (batch, 3)).astype(np.float32)),
        }

    batches = [make_batch(i) for i in range(4)]
    extras = lambda: (
        jnp.float32(220.0), lrs, jnp.float32(1.0), jnp.float32(0.02),
        jnp.float32(1e-4), jnp.bool_(True), jax.random.PRNGKey(0),
    )

    for i in range(warmup):
        params, opt_state, aux = train_step(
            params, opt_state, batches[i % len(batches)], *extras()
        )
    # aux = (mse, lin_mse, off_l, emo_l, overflow, k1f, k2f, k1f2, k2f2)
    def kfracs(a):
        return {k: round(float(v), 3) for k, v in
                zip(("k1_frac", "k2_frac", "k1_frac_2nd", "k2_frac_2nd"),
                    a[5:9])}

    ovf = float(aux[4])
    assert ovf == 0.0, (
        f"march overflow {ovf:.4f}: budget too small (utilization {kfracs(aux)})"
    )

    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for i in range(2):
                params, opt_state, aux = train_step(
                    params, opt_state, batches[i % len(batches)], *extras()
                )
            jax.block_until_ready(aux)

    # float() transfer is the only true sync through the tunnel (PERF.md)
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, aux = train_step(
            params, opt_state, batches[i % len(batches)], *extras()
        )
    final_mse = float(aux[0])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_mse), f"non-finite mse {final_mse}"
    assert float(aux[4]) == 0.0, f"march overflow {float(aux[4]):.4f}"

    print(
        json.dumps(
            {
                "metric": "lts_train_rays_per_sec",
                "value": round(batch * iters / dt, 1),
                "unit": "rays/s",
                "secondary_rays_per_sec": round(n_sec * iters / dt, 1),
                "step_seconds": round(dt / iters, 3),
                "batch": batch,
                "num_secondary": n_sec,
                "num_voxels": num_voxels,
                **kfracs(aux),
            }
        )
    )


if __name__ == "__main__":
    main()
