"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 item 4).

Note: the environment's sitecustomize imports jax and pins the remote TPU
('axon') platform before conftest runs, so the env-var route
(``JAX_PLATFORMS=cpu``) is too late — force the platform through
``jax.config`` instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu"


def pytest_collection_modifyitems(config, items):
    """``-m quick`` must stay under its 5-minute 1-core budget: tests
    marked ``full`` (multi-second full-graph compiles) are deselected from
    the quick tier even when a module-level ``pytestmark = quick`` would
    otherwise include them (markers add up, they don't override)."""
    if "quick" in (config.option.markexpr or "") and "full" not in (
        config.option.markexpr or ""
    ):
        keep, drop = [], []
        for it in items:
            (drop if it.get_closest_marker("full") else keep).append(it)
        if drop:
            config.hook.pytest_deselected(items=drop)
            items[:] = keep
