"""esrnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for emissive
source reconstruction from LDR multi-view images, with the full capability
surface of the ESR-NeRF reference implementation (CVPR 2024).

The framework is a five-layer stack mirroring the reference architecture
(see SURVEY.md §1) but redesigned TPU-first:

- ``esrnerf_tpu.config``   — layered YAML config system (Hydra-compatible tree)
- ``esrnerf_tpu.apps``     — stage trainers: AlphaMask, Coarse, Fine, LTS, PDRA
- ``esrnerf_tpu.models``   — renderers: DVGO, VoxurfC, VoxurfF, ESRNeRF
- ``esrnerf_tpu.ops``      — compute kernels: dense ray engine, trilinear grid
                             sampling, transmittance scans, NeuS alphas, PBR
- ``esrnerf_tpu.data``     — datasets (ESR-NeRF blender-style, DTU) + samplers
- ``esrnerf_tpu.optim``    — per-voxel-LR Adam, LR schedules
- ``esrnerf_tpu.parallel`` — device mesh / sharding utilities
- ``esrnerf_tpu.utils``    — metrics, logging, checkpointing, mesh extraction

Design stance (vs. the CUDA reference): dense ``[N_rays, S]`` sample grids
with validity masks instead of ragged ``ray_id`` indirection; pure-functional
models (params as pytrees) with a single jitted train step per stage; XLA
collectives over a ``jax.sharding.Mesh`` for scale-out.
"""

__version__ = "0.1.0"


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    The TPU backend takes minutes to compile the per-stage train steps at
    production shapes (measured: ~90s for the fine step, ~4min for graphs
    with large sorts); the cache cuts warm restarts to seconds. Called at
    import so every entry point (run.py, bench.py, tests, notebooks)
    benefits; override the location with ESRNERF_XLA_CACHE, disable with
    ESRNERF_XLA_CACHE=0.
    """
    import os

    loc = os.environ.get("ESRNERF_XLA_CACHE")
    if loc == "0":
        return
    path = loc or os.path.expanduser("~/.cache/esrnerf_tpu/xla")
    try:
        # Key the cache dir by toolchain + machine: a cached AOT executable
        # built against a different libtpu or host CPU is not loadable
        # (round-1 multichip dryrun died on exactly this; XLA:CPU warns
        # "machine features don't match ... could lead to SIGILL").
        path = os.path.join(path, _cache_fingerprint())
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


def _cache_fingerprint() -> str:
    """Short hash of everything that can invalidate a cached executable:
    jax/jaxlib/libtpu builds, the pinned platform, and the host CPU model
    (XLA:CPU AOT results encode machine features)."""
    import hashlib
    import os
    import platform

    parts = [os.environ.get("JAX_PLATFORMS", "")]
    for mod in ("jax", "jaxlib", "libtpu"):
        try:
            m = __import__(mod)
            parts.append(f"{mod}={getattr(m, '__version__', '?')}")
        except Exception:
            parts.append(f"{mod}=absent")
    try:
        with open("/proc/cpuinfo") as f:
            flags = [l for l in f if l.startswith(("model name", "flags"))]
        parts.append(flags[0] if flags else platform.processor())
        parts.append(flags[1] if len(flags) > 1 else "")
    except Exception:
        parts.append(platform.processor())
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


enable_compilation_cache()
