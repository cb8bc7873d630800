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


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place every leading-dim tensor of a batch on the data axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (batch padding for even shards)."""
    return ((n + m - 1) // m) * m


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
    import functools

    from jax.experimental.shard_map import shard_map

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
    sharded = shard_map(
        _step, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(rspec, rspec, rspec),
        check_rep=False,
    )
    return jax.jit(sharded)
