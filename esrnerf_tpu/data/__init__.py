from esrnerf_tpu.data.base import DataClass, LightDict  # noqa: F401
