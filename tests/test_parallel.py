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
