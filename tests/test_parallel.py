"""Multi-chip correctness: the sharded train step must match the
single-device step bit-for-bit (SURVEY.md §4 item 4 — the TPU analogue of
"test multi-node without a real cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrnerf_tpu.config import load_cfg
from esrnerf_tpu.models.dvgo import DVGO
from esrnerf_tpu.optim import Adam
from esrnerf_tpu.parallel import get_mesh, replicated, shard_batch

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_setup():
    cfg = load_cfg(
        "cfg/exp/esrnerf/giftbox_w/alphamask.yaml",
        ["app.phase=train", "app.model.num_voxels=8000"], root_dir=REPO,
    )
    model = DVGO(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1])
    params = model.init_params()
    opt = Adam({"density": 0.1, "off_color": 0.1, "emo_color": 0.1})
    state = opt.init(params)

    def train_step(params, state, batch, key):
        def loss_fn(p):
            res = model.forward_training(
                p, batch["rays_o"], batch["rays_d"], batch["em_modes"], key
            )
            pred = jnp.clip(res["srgb/rgb"] + res["etc/white_bg"], 0, 1)
            return ((pred - batch["rgbs"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    return model, params, state, jax.jit(train_step)


def make_batch(n):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32) - o
    return {
        "rays_o": o, "rays_d": d.astype(np.float32),
        "em_modes": rng.integers(0, 2, n),
        "rgbs": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }


def test_sharded_train_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    _, params, state, train_step = make_setup()
    batch_np = make_batch(64)
    key = jax.random.PRNGKey(0)

    # single device
    b1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    p1, s1, l1 = train_step(params, state, b1, key)
    for _ in range(3):
        p1, s1, l1 = train_step(p1, s1, b1, key)

    # 8-way data-parallel
    mesh = get_mesh()
    p2 = jax.device_put(params, replicated(mesh))
    s2 = jax.device_put(state, replicated(mesh))
    b2 = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
    p2, s2, l2 = train_step(p2, s2, b2, key)
    for _ in range(3):
        p2, s2, l2 = train_step(p2, s2, b2, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6, atol=1e-7
        )


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, REPO)
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(8, len(jax.devices())))


def _tiny_esrnerf(cfg, seed=0):
    """Tiny ESRNeRF on a synthetic occupancy blob (no dataset)."""
    from esrnerf_tpu.models.esrnerf import ESRNeRF
    from esrnerf_tpu.models.voxurf_base import make_mask_cache

    g = np.linspace(-1, 1, 16)
    xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
    occ = (np.sqrt(xx**2 + yy**2 + zz**2) < 0.7).astype(np.float32)
    density = np.where(occ > 0, 20.0, -20.0)[..., None]
    mask_cache = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6,
                                 1e-3, 3)
    model = ESRNeRF(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache,
                    s_val=220.0, num_voxels=4096)
    params = model.init_params(jax.random.PRNGKey(seed))
    return model, params


def test_lts_trainer_shard_map_matches_single_device():
    """The REAL LTS stage train step (march compaction + secondary-ray
    LTS fan-out + TV-grad term + Adam) must agree between one device and
    the 8-shard shard_map fast path.

    Randomness is made layout-invariant: fibonacci scattering
    (deterministic per normal), eps weights 0 (noise draws multiplied
    away), and num_ltspts = the full march budget so the random top-k
    selection picks EVERY slot on both layouts (sums over the selected
    set are then permutation-invariant)."""
    from esrnerf_tpu.apps.lts import LTS

    n_rays, ppr, D = 32, 16, 8
    overrides = [
        # exact cross-layout parity is this test's contract; bf16 MLP
        # matmuls accumulate in a shape-dependent order (2-3e-4 drift
        # between layouts), so pin f32 here — bf16 *quality* is gated by
        # the pipeline-e2e PSNR thresholds instead
        "system.compute_dtype=float32",
        "app.phase=train",
        "data.cls=esrnerf.ESRNeRF", "data.root=unused", "data.scene=unused",
        "app.model.ray_sampling=fib",
        "app.model.num_2ndrays=8",
        f"app.model.num_ltspts={n_rays * ppr}",
        "app.model.points_budget_per_2ndray=8",
        f"app.model.points_budget_per_ray={ppr}",
        "app.trainer.normal_eps=0.0",
        "app.trainer.emit_eps=0.0",
        # with eps=0 the smoothness term is a degenerate a-a=0: its exact-
        # zero gradient picks up 1-ulp compiler-fusion noise on one layout
        # only, which Adam's sign normalization amplifies to a full lr step
        # — zero the weight so the degenerate term carries no gradient
        "app.trainer.weight_normal_smooth=0.0",
        f"app.trainer.batch_size={n_rays}",
    ]

    def build(mesh):
        cfg = load_cfg("cfg/app/lts.yaml", list(overrides), root_dir=REPO)
        app = LTS(cfg)
        app._mesh = mesh  # bypass the device-count heuristic
        app.renderer, params = _tiny_esrnerf(cfg)
        app.opt = Adam({k: 0.01 for k in params})
        return app, params, app.opt.init(params), app._build_train_step()

    rng = np.random.default_rng(7)
    o = rng.normal(size=(n_rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = rng.normal(scale=0.3, size=(n_rays, 3)).astype(np.float32) - o
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    batch_np = {
        "rays_o": o, "rays_d": d.astype(np.float32),
        "viewdirs": vd.astype(np.float32),
        "em_modes": rng.integers(0, 2, n_rays),
        "uncert_masks": rng.uniform(size=n_rays) > 0.3,
        "rgbs": rng.uniform(0, 1, (n_rays, 3)).astype(np.float32),
    }
    extras = dict(
        s_val=jnp.float32(220.0), tv_flag=jnp.float32(1.0),
        smooth_grad_tv=jnp.float32(0.02), sdf_tv_w=jnp.float32(1e-4),
        tv_dense=jnp.bool_(True), rng=jax.random.PRNGKey(3),
    )

    def run(app, params, state, step, batch, n_steps=2):
        lr_scales = {k: jnp.float32(1.0) for k in params}
        for _ in range(n_steps):
            params, state, aux = step(
                params, state, batch, extras["s_val"], lr_scales,
                extras["tv_flag"], extras["smooth_grad_tv"],
                extras["sdf_tv_w"], extras["tv_dense"], extras["rng"],
            )
        return params, aux

    app1, params, state1, step1 = build(None)
    b1 = jax.tree.map(jnp.asarray, batch_np)
    p1, aux1 = run(app1, params, state1, step1, b1)

    mesh = get_mesh(devices=jax.devices()[:D])
    app2, params2, state2, step2 = build(mesh)
    assert app2.parallel_mode == "shard_map"
    assert app2.renderer.lts_points_divisor == D
    p2r = jax.device_put(params2, replicated(mesh))
    s2r = jax.device_put(app2.opt.init(params2), replicated(mesh))
    b2 = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
    p2, aux2 = run(app2, p2r, s2r, step2, b2)

    # aux = (mse, lin_mse, off_l, emo_l, overflow, k1_frac, k2_frac):
    # losses must match tightly and overflow must be zero on both layouts
    # or the selected sets differ. The budget-utilization diagnostics are
    # layout-dependent BY DESIGN (max over per-shard utilizations vs one
    # global fraction — per-shard max is what sizes per-shard budgets), so
    # only sanity-bound them.
    assert float(aux1[4]) == 0.0 and float(aux2[4]) == 0.0
    for a, b in zip(aux1[:4], aux2[:4]):
        assert np.isclose(float(a), float(b), rtol=1e-4, atol=1e-7), (a, b)
    for a in (*aux1[5:], *aux2[5:]):
        assert 0.0 <= float(a) <= 1.0, a
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(p1[k])[0]),
            np.asarray(jax.tree.leaves(p2[k])[0]),
            rtol=2e-4, atol=1e-6, err_msg=k,
        )


def test_shard_map_fast_path_matches_single_device():
    """The shard_map step (local compactions, one grad pmean) must agree
    with the plain single-device step."""
    from esrnerf_tpu.parallel.mesh import sharded_train_step

    model, params, state, train_step = make_setup()
    opt = Adam({"density": 0.1, "off_color": 0.1, "emo_color": 0.1})

    # per-ray jitter must ride the batch (a shaped rng draw differs per
    # shard count); precompute and shard it like the rest of the batch
    def loss_fn(p, batch, key):
        res = model.forward_training(
            p, batch["rays_o"], batch["rays_d"], batch["em_modes"], key,
            rand_shift=batch["shift"],
        )
        pred = jnp.clip(res["srgb/rgb"] + res["etc/white_bg"], 0, 1)
        return ((pred - batch["rgbs"]) ** 2).mean()

    mesh = get_mesh(devices=jax.devices()[:8])
    step = sharded_train_step(mesh, loss_fn, opt, has_rng=True)

    batch_np = make_batch(64)
    batch_np["shift"] = np.random.default_rng(3).uniform(
        size=(64, 1)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    def single_step(params, state, batch, key):
        def lf(p):
            return loss_fn(p, batch, key)
        loss, grads = jax.value_and_grad(lf)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    p1, s1, l1 = jax.jit(single_step)(
        params, state, jax.tree.map(jnp.asarray, batch_np), key)

    params_r = jax.device_put(params, replicated(mesh))
    state_r = jax.device_put(opt.init(params), replicated(mesh))
    batch_sh = shard_batch(jax.tree.map(jnp.asarray, batch_np), mesh)
    p2, s2, l2 = step(params_r, state_r, batch_sh, key)

    assert np.isclose(float(l1), float(l2), rtol=1e-6), (l1, l2)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


def test_fsdp_param_sharding_matches_replicated():
    """system.param_shard=fsdp (gspmd): voxel grids + Adam moments shard
    over the data axis, numerics match the replicated run (all-gather is
    exact), and the App plumbing honors the cfg switch."""
    from esrnerf_tpu.parallel import place_params_fsdp

    cfg = load_cfg(
        "cfg/exp/esrnerf/giftbox_w/alphamask.yaml",
        ["app.phase=train", "app.model.num_voxels=32768"], root_dir=REPO,
    )
    model = DVGO(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1])
    params = model.init_params()
    opt = Adam({"density": 0.1, "off_color": 0.1, "emo_color": 0.1})
    state = opt.init(params)

    def train_step(params, state, batch, key):
        def loss_fn(p):
            res = model.forward_training(
                p, batch["rays_o"], batch["rays_d"], batch["em_modes"], key
            )
            pred = jnp.clip(res["srgb/rgb"] + res["etc/white_bg"], 0, 1)
            return ((pred - batch["rgbs"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, state = opt.step(params, grads, state)
        return params, state, loss

    step = jax.jit(train_step)
    batch_np = make_batch(64)
    key = jax.random.PRNGKey(0)
    mesh = get_mesh()

    # replicated reference
    p1 = jax.device_put(params, replicated(mesh))
    s1 = jax.device_put(state, replicated(mesh))
    b = shard_batch({k: jnp.asarray(v) for k, v in batch_np.items()}, mesh)
    for _ in range(3):
        p1, s1, l1 = step(p1, s1, b, key)

    # fsdp-sharded params + optimizer state
    p2 = place_params_fsdp(params, mesh)
    s2 = place_params_fsdp(state, mesh)
    assert p2["density"].sharding.spec[0] == "data"  # grid actually sharded
    assert jax.tree.leaves(s2)[0].sharding is not None
    for _ in range(3):
        p2, s2, l2 = step(p2, s2, b, key)

    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-6, atol=1e-7,
            err_msg=k,
        )

    # App-level cfg plumbing
    from esrnerf_tpu.apps.alphamask import AlphaMask

    cfg2 = load_cfg(
        "cfg/exp/esrnerf/giftbox_w/alphamask.yaml",
        ["app.phase=train", "app.model.num_voxels=32768",
         "system.parallel=gspmd", "system.param_shard=fsdp"], root_dir=REPO,
    )
    app = AlphaMask(cfg2)
    app._mesh = mesh
    placed = app.place_replicated(params)
    assert placed["density"].sharding.spec[0] == "data"


def test_sharded_eval_sweeps_match_single_device():
    """Eval-time heavy sweeps — chunked ``forward_evaluate`` (with the PBR
    point hand-off), the ``lts_eval_chunk`` decomposition, and the
    ``eval_emit``/``eval_esp`` regroup renderers — run data-parallel under
    GSPMD when their chunk inputs are sharded over the mesh (the apps'
    ``place_ray_chunk``). Outputs must match the single-device run."""
    from esrnerf_tpu.parallel import batch_sharding

    cfg = load_cfg(
        "cfg/app/lts.yaml",
        [
            "system.compute_dtype=float32",
            "app.phase=train",
            "data.cls=esrnerf.ESRNeRF", "data.root=unused",
            "data.scene=unused",
            "app.model.ray_sampling=fib",
            "app.model.num_2ndrays=8",
            "app.model.num_ltspts=8",
            "app.model.points_budget_per_2ndray=8",
            "app.model.points_budget_per_ray=16",
        ],
        root_dir=REPO,
    )
    model, params = _tiny_esrnerf(cfg)
    n = 64
    rng = np.random.default_rng(11)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32) - o
    vd = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    pos_rt = jnp.eye(3)
    sv = jnp.float32(220.0)

    mesh = get_mesh(devices=jax.devices()[:8])
    bsh = batch_sharding(mesh)
    pr = jax.device_put(params, replicated(mesh))

    def both(fn, *arrays, extra=()):
        """(single-device out, sharded-chunk out) for one eval fn."""
        one = fn(params, *[jnp.asarray(a) for a in arrays], *extra)
        two = fn(pr, *[jax.device_put(jnp.asarray(a), bsh) for a in arrays],
                 *extra)
        return one, two

    # --- forward_evaluate with the pbr point hand-off
    fwd = jax.jit(lambda p, ro, rd, v, s: model.forward_evaluate(
        p, ro, rd, v, 1, pos_rt, s, render_pbr=True))
    out1, out2 = both(fwd, o, d, vd, extra=(sv,))
    pbr1 = out1.pop("pbr_points")
    pbr2 = out2.pop("pbr_points")
    for k in out1:
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out2[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"forward_evaluate {k}",
        )
    np.testing.assert_array_equal(
        np.asarray(pbr1["ray_id"]), np.asarray(pbr2["ray_id"])
    )
    np.testing.assert_allclose(
        np.asarray(pbr1["pts"]), np.asarray(pbr2["pts"]), rtol=1e-6,
        atol=1e-7,
    )

    # --- the chunked LTS decomposition over surviving points
    K = 32
    sel = [k for k in ("pts", "viewdirs", "normal", "basecolor",
                       "roughness", "metallic")]
    chunk_in = [np.asarray(pbr1[k])[:K] for k in sel]
    key = jax.random.PRNGKey(5)
    chunk = jax.jit(
        lambda p, pts, v, nr, bc, rg, mt, s: model.lts_eval_chunk(
            p, key, pts, v, nr, bc, rg, mt, s)
    )
    c1, c2 = both(chunk, *chunk_in, extra=(sv,))
    for k in c1:
        np.testing.assert_allclose(
            np.asarray(c1[k]), np.asarray(c2[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"lts_eval_chunk {k}",
        )

    # --- the regroup emission renderer + expected-surface-point probe
    emit = jax.jit(lambda p, ro, rd, v, s: model.eval_emit(p, ro, rd, v, s))
    (e1, ov1), (e2, ov2) = both(emit, o, d, vd, extra=(sv,))
    assert float(ov1) == float(ov2) == 0.0
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), rtol=1e-5,
                               atol=1e-6)
    esp = jax.jit(lambda p, ro, rd, v, s: model.eval_esp(p, ro, rd, v, s))
    (s1, _), (s2, _) = both(esp, o, d, vd, extra=(sv,))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5,
                               atol=1e-6)
