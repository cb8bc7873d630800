"""Benchmark: PDRA-stage training throughput + regroup-sweep cost — the
pipeline's LONGEST stage (reference cfg/app/pdra.yaml: 80k iters x
(8,192 uncertain + 8,192 certain) rays per step, with the uncertain pool's
emission re-rendered every group_interval=200 steps, pdra.py:875-932).

Drives the REAL PDRA trainer step (apps/pdra.py::_build_train_step) and the
REAL regroup renderer (models/esrnerf.py::eval_emit at the trainer's
eval.uncert_batch_size chunking). Prints one JSON line:
  {"metric": "pdra_train_rays_per_sec", "value": N, "unit": "rays/s", ...}
where rays/s counts PRIMARY rays (uncert+cert), plus:
  - regroup_rays_per_sec: eval_emit sweep throughput;
  - regroup_amortized_frac: sweep cost per step / step cost, for a pool of
    BENCH_POOL rays re-grouped every group_interval steps (VERDICT r2 asked
    for this bound; the target is <10%).

Env knobs: BENCH_NUM_VOXELS, BENCH_BATCH (per-pool), BENCH_ITERS,
BENCH_POOL (assumed uncertain-pool size for amortization), BENCH_TRACE_DIR.
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
    # the fused 18-channel splat backward fits even the HBM-tight double
    # -batch step (2.703 -> 2.563 s/step measured r5). Env wins if set.
    os.environ.setdefault("ESR_SPLAT_MULTI_BWD_CAP", "1700000000")

    import jax

    # sitecustomize pins the axon TPU backend before env vars can take
    # effect; BENCH_PLATFORM=cpu forces a local run through jax.config
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from esrnerf_tpu.apps.pdra import PDRA
    from esrnerf_tpu.config import load_cfg
    from esrnerf_tpu.models.esrnerf import ESRNeRF
    from esrnerf_tpu.models.voxurf_base import make_mask_cache
    from esrnerf_tpu.optim import Adam

    num_voxels = int(os.environ.get("BENCH_NUM_VOXELS", 16777216))
    batch = int(os.environ.get("BENCH_BATCH", 8192))  # per pool
    iters = int(os.environ.get("BENCH_ITERS", 10))
    # production uncertain pools start at every train ray intersecting the
    # emission mask; O(1-4M) rays for the 800x800x100-view ESR scenes
    pool = int(os.environ.get("BENCH_POOL", 2_000_000))
    warmup = 2

    cfg = load_cfg(
        "cfg/app/pdra.yaml",
        [
            "app.phase=train",
            "data.cls=esrnerf.ESRNeRF", "data.root=unused", "data.scene=unused",
            f"app.trainer.uncert_batch_size={batch}",
            f"app.trainer.cert_batch_size={batch}",
            # same band-cull-sized budgets as bench_lts (overflow asserted
            # 0; 160/96 measured r5 — the overlapping band-corner windows
            # grew the conservative superset and 128 overflowed 11.8%.
            # The double-pool step only fits 16 GB HBM at tight budgets)
            "app.model.points_budget_masked_per_ray="
            + os.environ.get("BENCH_MASKED_PER_RAY", "160"),
            "app.model.points_budget_masked_per_2ndray="
            + os.environ.get("BENCH_MASKED_PER_2NDRAY", "96"),
            # phase-2 head budgets (same telemetry story as bench_lts:
            # the 64/24 defaults ran the head pipeline at 2-3%
            # utilization; overflow asserted 0 keeps the shrink honest)
            "app.model.points_budget_per_ray="
            + os.environ.get("BENCH_PER_RAY", "16"),
            "app.model.points_budget_per_2ndray="
            + os.environ.get("BENCH_PER_2NDRAY", "12"),
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

    app = PDRA(cfg)
    model = ESRNeRF(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache,
                    s_val=220.0, num_voxels=num_voxels)
    model.pdra_mode = True
    app.renderer = model
    params = model.init_params(jax.random.PRNGKey(0))
    app.opt = Adam({k: 1e-2 for k in params})
    opt_state = app.opt.init(params)
    train_step = app._build_train_step()

    lrs = {k: jnp.float32(1.0) for k in params}
    n2 = 2 * batch

    def make_batch(seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(n2, 3)).astype(np.float32)
        o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
        d = (r.normal(scale=0.3, size=(n2, 3)) - o).astype(np.float32)
        vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
        # first half = uncertain pool, second half = certain pool, exactly
        # as RayGroupManager.sample() concatenates them
        um = np.zeros(n2, bool)
        um[:batch] = True
        return {
            "rays_o": jnp.asarray(o), "rays_d": jnp.asarray(d),
            "viewdirs": jnp.asarray(vd),
            "em_modes": jnp.asarray(r.integers(0, 2, n2)),
            "uncert_masks": jnp.asarray(um),
            "rgbs": jnp.asarray(r.uniform(0, 1, (n2, 3)).astype(np.float32)),
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
    ovf = float(aux[4])
    assert ovf == 0.0, f"march overflow {ovf:.4f}: budget too small"

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
    step_s = dt / iters
    assert np.isfinite(final_mse), f"non-finite mse {final_mse}"
    assert float(aux[4]) == 0.0, f"march overflow {float(aux[4]):.4f}"

    # --- regroup sweep: eval_emit at the trainer's chunking (pdra.py:129-173)
    ebs = int(cfg.app["eval"]["uncert_batch_size"])
    emit_fn = jax.jit(
        lambda p, ro, rd, vd, s: model.eval_emit(p, ro, rd, vd, s)
    )
    eb = batches[0]
    ro, rd, vd = (jnp.resize(eb[k], (ebs, 3))
                  for k in ("rays_o", "rays_d", "viewdirs"))
    out, _ovf = emit_fn(params, ro, rd, vd, jnp.float32(220.0))  # compile
    _ = float(out.ravel()[0])
    n_chunks = max(2, int(np.ceil(131072 / ebs)))
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        out, _ovf = emit_fn(params, ro, rd, vd, jnp.float32(220.0))
    _ = float(out.ravel()[0])
    edt = time.perf_counter() - t0
    regroup_rps = n_chunks * ebs / edt
    group_interval = int(cfg.app["trainer"]["group_interval"])
    amortized = (pool / regroup_rps) / group_interval / step_s

    print(
        json.dumps(
            {
                "metric": "pdra_train_rays_per_sec",
                "value": round(2 * batch * iters / dt, 1),
                "unit": "rays/s",
                "step_seconds": round(step_s, 3),
                "uncert_batch": batch,
                "cert_batch": batch,
                "num_voxels": num_voxels,
                "regroup_rays_per_sec": round(regroup_rps, 1),
                "regroup_amortized_frac": round(amortized, 4),
                "regroup_pool_assumed": pool,
                "group_interval": group_interval,
            }
        )
    )


if __name__ == "__main__":
    main()
