from esrnerf_tpu.apps.base import AppClass, import_class  # noqa: F401
