"""Device mesh and sharding utilities.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed
anywhere); scale-out here is first-class instead. The core layout:

- **data axis**: ray batches are embarrassingly parallel — shard the leading
  (ray) dimension of every batch tensor across the ``data`` mesh axis; the
  per-ray losses are means, so XLA inserts the ``psum`` over ICI
  automatically when the jitted step reduces them.
- **parameters replicated**: voxel grids + MLPs fit per-chip for all the
  reference's workloads (fine grid 16.7M voxels × 6ch ≈ 400 MB fp32); the
  gradient all-reduce is again XLA-inserted.
- The mesh is 1-D by default but callers may pass an ``(data, grid)`` 2-D
  mesh for future grid (tensor-parallel) sharding of oversized grids.

All entry points work on any backend — the multi-chip path is validated on
a CPU mesh via ``--xla_force_host_platform_device_count`` (see tests and
``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over all (or given) devices. 1-D ``(data,)`` by default;
    pass ``shape`` for multi-axis layouts (product must equal #devices)."""
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devs)] + [1] * (len(axis_names) - 1)
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batch tensors: leading dim split across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_sharding(mesh: Mesh, x, axis: str = "data") -> NamedSharding:
    """FSDP-style persistent-state sharding for one parameter array.

    Voxel grids (and their Adam moments — 3x the grid bytes total) dominate
    HBM: shard any >=3-D array whose leading dim divides the data axis over
    that axis; everything else (MLP weights, scalars) stays replicated. XLA
    all-gathers a sharded grid just-in-time where the step needs full rows
    (a transient), and reduce-scatters its gradient — the persistent
    footprint drops by the shard count. Numerics are unchanged (all-gather
    is exact; grad reduction order is XLA's either way)."""
    n = int(mesh.shape[axis])
    if getattr(x, "ndim", 0) >= 3 and x.shape[0] % max(n, 1) == 0 and n > 1:
        return NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
    return NamedSharding(mesh, P())


def place_params_fsdp(tree, mesh: Mesh, axis: str = "data"):
    return jax.tree.map(
        lambda x: jax.device_put(x, fsdp_param_sharding(mesh, x, axis)), tree
    )


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every leading-dim tensor of a batch on the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (batch padding for even shards)."""
    return ((n + m - 1) // m) * m


def _psum_id_grad(tree, axis: str):
    """``psum`` whose VJP is the identity.

    Inside a differentiated shard_map body with ``check_vma=False``, plain
    ``lax.psum`` transposes to another ``psum`` — so a replicated cotangent
    (the loss seed 1.0) comes back multiplied by the shard count, inflating
    every downstream gradient n-fold. For "recipe B" (global loss value on
    every shard, LOCAL gradient contribution per shard, one psum of grads
    after ``value_and_grad``) the correct cotangent is the identity: each
    shard's local numerator enters the global sum exactly once.
    """

    @jax.custom_vjp
    def f(x):
        return jax.lax.psum(x, axis)

    def fwd(x):
        return jax.lax.psum(x, axis), None

    def bwd(_, ct):
        return (ct,)

    f.defvjp(fwd, bwd)
    return jax.tree.map(f, tree)


class ShardHelpers:
    """Cross-shard reduction helpers for a train-step body.

    Written so the single-device instance (``axis=None``) is the exact
    identity: a step body using these computes *global* quantities under
    shard_map and the plain quantities on one device — one code path for
    both. The scheme ("recipe B"):

    - every data-dependent loss term is ``gsum(numerator) / global_count``
      (exact even for count-normalized masked losses, unlike mean-of-
      shard-means);
    - parameter-only terms (TV) divide by ``n`` so their psum'd gradient
      contributes once;
    - after ``value_and_grad`` the grads are ``gsum``'d (each shard holds
      only its local data's contribution to the already-global loss, because
      ``gsum``'s VJP is the identity — see :func:`_psum_id_grad`);
    - the optimizer then runs identically on every shard.
    """

    def __init__(self, axis: Optional[str], n: int):
        self.axis = axis
        self.n = n

    def gsum(self, tree):
        """Cross-shard sum (psum value, identity gradient) of a tree."""
        if self.axis is None:
            return tree
        return _psum_id_grad(tree, self.axis)

    def gmean(self, x):
        """Global mean of a per-shard array (equal-sized shards)."""
        return self.gsum(x.sum()) / (x.size * self.n)

    def gmax(self, x):
        if self.axis is None:
            return x
        return jax.lax.pmax(x, self.axis)

    def glast(self, x):
        """The value on the LAST shard (global-last-row quirks). Identity-
        gradient psum: the cotangent flows back through the ``where`` so only
        the last shard's local grad carries the term — matching the
        single-device semantics after the outer grad psum."""
        if self.axis is None:
            return x
        idx = jax.lax.axis_index(self.axis)
        return _psum_id_grad(
            jnp.where(idx == self.n - 1, x, jnp.zeros_like(x)), self.axis
        )

    def fold_key(self, key):
        """Decorrelate per-shard rng draws."""
        if self.axis is None:
            return key
        return jax.random.fold_in(key, jax.lax.axis_index(self.axis))


def wrap_step_shard_map(mesh: Mesh, step_impl, n_args: int,
                        axis: str = "data", donate=(0, 1)):
    """shard_map + jit a train step ``(params, opt_state, batch, *extras)``
    -> ``(params, opt_state, aux)``: batch leading dims shard over ``axis``,
    everything else replicated. ``step_impl`` must already fold cross-shard
    reductions via :class:`ShardHelpers` (check_rep can't verify that, so
    outputs are trusted replicated)."""
    specs = (P(), P(), P(axis)) + (P(),) * (n_args - 3)
    fn = jax.shard_map(
        step_impl, mesh=mesh, in_specs=specs, out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=donate)


def sharded_train_step(mesh: Mesh, loss_fn, opt, axis: str = "data",
                       has_rng: bool = False):
    """Build a ``shard_map`` data-parallel train step — the fast path.

    Under plain jit+GSPMD the march's global compactions (``jnp.nonzero``
    over the whole batch) force cross-shard collectives; under shard_map
    every shard marches its own rays with local static budgets and only the
    loss/gradients cross the ICI (one ``pmean``).

    ``loss_fn(params, batch[, rng]) -> scalar`` is the per-shard loss over
    the LOCAL batch (mean over local rays; the pmean makes it the global
    mean when shards are equal-sized). ``opt`` is an ``optim.Adam``-style
    object with ``step(params, grads, opt_state) -> (params, opt_state)``.

    Returns ``step(params, opt_state, batch[, rng]) -> (params, opt_state,
    loss)`` — jitted; params/opt_state replicated, batch leading dims
    sharded over ``axis``.
    """
    bspec = P(axis)
    rspec = P()

    def _step(params, opt_state, batch, rng=None):
        args = (batch, rng) if has_rng else (batch,)
        loss, grads = jax.value_and_grad(loss_fn)(params, *args)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        params, opt_state = opt.step(params, grads, opt_state)
        return params, opt_state, loss

    in_specs = [rspec, rspec, bspec] + ([rspec] if has_rng else [])
    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(rspec, rspec, rspec),
        check_vma=False,
    )
    return jax.jit(sharded)
