from esrnerf_tpu.optim.adam import Adam  # noqa: F401
from esrnerf_tpu.optim.schedule import CosineLR, exp_decay_factor  # noqa: F401
