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
