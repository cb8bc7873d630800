"""Optimizer parity vs the reference custom Adam (torch oracle,
``app/utils/optimizer.py:63-228``), incl. per-voxel LR and per-group decay,
and the CosineLR schedule values (``optimizer.py:231-275``)."""

import pytest
import math

import jax.numpy as jnp
import numpy as np
import torch

from esrnerf_tpu.optim import Adam, CosineLR, exp_decay_factor
from esrnerf_tpu.optim.adam import make_pervoxel_lr

pytestmark = pytest.mark.quick


class TorchRefAdam(torch.optim.Optimizer):
    """Minimal port of the reference Adam's update rule for oracle use."""

    def __init__(self, param_groups, betas=(0.9, 0.99), eps=1e-8):
        defaults = dict(lr=1e-3, betas=betas, eps=eps)
        super().__init__(param_groups, defaults)
        self.per_lr = None

    @torch.no_grad()
    def step(self):
        for group in self.param_groups:
            b1, b2 = group["betas"]
            for p in group["params"]:
                if p.grad is None:
                    continue
                st = self.state[p]
                if len(st) == 0:
                    st["step"] = 0
                    st["m"] = torch.zeros_like(p)
                    st["v"] = torch.zeros_like(p)
                st["step"] += 1
                t = st["step"]
                st["m"].mul_(b1).add_(p.grad, alpha=1 - b1)
                st["v"].mul_(b2).addcmul_(p.grad, p.grad, value=1 - b2)
                denom = (st["v"].sqrt() / math.sqrt(1 - b2**t)).add_(group["eps"])
                step_size = group["lr"] / (1 - b1**t)
                num = st["m"]
                if self.per_lr is not None and p.shape == self.per_lr.shape:
                    num = num * self.per_lr
                p.addcdiv_(num, denom, value=-step_size)


def test_adam_matches_reference_with_pervoxel_lr_and_decay():
    rng = np.random.default_rng(0)
    density = rng.normal(size=(4, 5, 6, 1)).astype(np.float32)
    color = rng.normal(size=(4, 5, 6, 3)).astype(np.float32)
    count = rng.integers(0, 9, size=(4, 5, 6, 1)).astype(np.float32) + 1

    params = {"density": jnp.asarray(density), "off_color": jnp.asarray(color)}
    opt = Adam({"density": 0.1, "off_color": 0.05})
    state = opt.init(params)
    per_lr = {"density": make_pervoxel_lr(jnp.asarray(count))}

    t_density = torch.tensor(density, requires_grad=True)
    t_color = torch.tensor(color, requires_grad=True)
    t_opt = TorchRefAdam(
        [
            {"params": [t_density], "lr": 0.1},
            {"params": [t_color], "lr": 0.05},
        ]
    )
    t_opt.per_lr = torch.tensor(count / count.max())

    decay = exp_decay_factor(20)
    scale = 1.0
    for it in range(5):
        g_density = rng.normal(size=density.shape).astype(np.float32)
        g_color = rng.normal(size=color.shape).astype(np.float32)
        grads = {"density": jnp.asarray(g_density), "off_color": jnp.asarray(g_color)}
        params, state = opt.step(
            params, grads, state,
            lr_scales={"density": scale, "off_color": scale},
            per_lr=per_lr,
        )

        t_density.grad = torch.tensor(g_density)
        t_color.grad = torch.tensor(g_color)
        t_opt.step()
        for pg in t_opt.param_groups:
            pg["lr"] *= decay
        scale *= decay

    np.testing.assert_allclose(
        np.asarray(params["density"]), t_density.detach().numpy(), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["off_color"]), t_color.detach().numpy(), rtol=2e-5, atol=1e-6
    )


def test_frozen_groups_not_updated():
    params = {"sdf": jnp.ones((3, 3, 3, 1)), "frozen": jnp.ones((2, 2))}
    opt = Adam({"sdf": 0.1, "frozen": 0.0})
    state = opt.init(params)
    assert "frozen" not in state.mu
    grads = {"sdf": jnp.ones((3, 3, 3, 1)), "frozen": jnp.ones((2, 2))}
    new_params, _ = opt.step(params, grads, state)
    np.testing.assert_array_equal(np.asarray(new_params["frozen"]), 1.0)
    assert not np.allclose(np.asarray(new_params["sdf"]), 1.0)


def test_cosine_lr_matches_reference_formula():
    sched = CosineLR(
        n_iters=100, warm_up_iters=10, warm_up_min_ratio=0.3,
        const_warm_up=False, cos_min_ratio=0.05,
    )
    # absolute values
    for it in [0, 5, 9, 10, 50, 99]:
        if it < 10:
            ref = 0.3 + 0.7 * it / 10
        else:
            ref = (1 + math.cos((it - 10) / 90 * math.pi)) * 0.5 * 0.95 + 0.05
        assert abs(sched(it) - ref) < 1e-12

    # multiplicative factors compose to the absolute value
    run = 1.0
    for it in range(20):
        run *= sched.decay_factor
    assert abs(run - sched(19)) < 1e-9

    # resume-from-step behaves like the reference (cur_step=k)
    sched2 = CosineLR(
        n_iters=100, warm_up_iters=10, warm_up_min_ratio=0.3,
        const_warm_up=False, cos_min_ratio=0.05, cur_step=20,
    )
    assert abs(sched2.decay_factor - sched(20) / sched(19)) < 1e-9
