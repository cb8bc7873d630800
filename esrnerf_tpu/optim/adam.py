"""Adam with per-group learning rates and per-voxel LR scaling.

Functional re-implementation of the reference's custom optimizer
(``app/utils/optimizer.py:11-228``): parameters live in a nested dict whose
*top-level keys* are the reference's param groups (``density``,
``off_color``, ``sdf``, ``off_rgbnet``, ...); groups configured with
``lr <= 0`` are frozen (excluded from state and never updated), matching
``create_optimizer_or_freeze_model``. ``set_pervoxel_lr``'s semantics —
scale the *first-moment* numerator elementwise by ``count / count.max()``
for every param whose shape matches — are reproduced by the optional
``per_lr`` argument (``optimizer.py:97-99,225-228``).

Learning-rate *scales* are dynamic (traced) inputs so per-step decay never
triggers recompilation; base LRs are static.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


class AdamState(NamedTuple):
    step: Dict[str, jnp.ndarray]  # per-group scalar step count
    mu: Params
    nu: Params


class Adam:
    def __init__(
        self,
        lrs: Dict[str, float],
        betas: Tuple[float, float] = (0.9, 0.99),
        eps: float = 1e-8,
    ):
        # betas default (0.9, 0.99) matches create_optimizer_or_freeze_model
        # (reference optimizer.py:60).
        self.lrs = {k: float(v) for k, v in lrs.items()}
        self.betas = betas
        self.eps = eps

    def trainable(self, group: str) -> bool:
        return self.lrs.get(group, 0.0) > 0.0

    def init(self, params: Params) -> AdamState:
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        mu = {g: zeros(p) for g, p in params.items() if self.trainable(g)}
        nu = {g: zeros(p) for g, p in params.items() if self.trainable(g)}
        step = {g: jnp.zeros((), jnp.int32) for g in mu}
        return AdamState(step, mu, nu)

    def step(
        self,
        params: Params,
        grads: Params,
        state: AdamState,
        lr_scales: Optional[Dict[str, Any]] = None,
        per_lr: Optional[Params] = None,
    ) -> Tuple[Params, AdamState]:
        """One update. ``lr_scales`` maps group -> dynamic multiplicative
        factor on the base LR (per-step decay); ``per_lr`` maps group ->
        elementwise LR tensor (or None)."""
        b1, b2 = self.betas
        new_params = dict(params)
        new_step = dict(state.step)
        new_mu = dict(state.mu)
        new_nu = dict(state.nu)

        for g, p in params.items():
            if not self.trainable(g):
                continue
            t = state.step[g] + 1
            new_step[g] = t
            bc1 = 1.0 - b1 ** t.astype(jnp.float32)
            bc2 = 1.0 - b2 ** t.astype(jnp.float32)
            lr = self.lrs[g]
            if lr_scales is not None and g in lr_scales:
                lr = lr * lr_scales[g]
            step_size = lr / bc1

            plr = per_lr.get(g) if per_lr is not None else None

            def upd(p_, g_, m_, v_):
                m = b1 * m_ + (1 - b1) * g_
                v = b2 * v_ + (1 - b2) * g_ * g_
                denom = jnp.sqrt(v) / jnp.sqrt(bc2) + self.eps
                # per-voxel LR only applies to shape-matching params,
                # mirroring reference optimizer.py:131-134
                use_plr = plr is not None and plr.shape == p_.shape
                num = m * plr if use_plr else m
                return p_ - step_size * num / denom, m, v

            out = jax.tree.map(upd, p, grads[g], state.mu[g], state.nu[g])
            # un-zip the tuple-leaf tree
            leaves, treedef = jax.tree.flatten(
                out, is_leaf=lambda x: isinstance(x, tuple)
            )
            new_params[g] = jax.tree.unflatten(treedef, [l[0] for l in leaves])
            new_mu[g] = jax.tree.unflatten(treedef, [l[1] for l in leaves])
            new_nu[g] = jax.tree.unflatten(treedef, [l[2] for l in leaves])

        return new_params, AdamState(new_step, new_mu, new_nu)


def make_pervoxel_lr(count: jnp.ndarray) -> jnp.ndarray:
    """``count / count.max()`` (reference ``optimizer.py:97-99``)."""
    return count.astype(jnp.float32) / count.max()
