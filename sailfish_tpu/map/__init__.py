from .pipeline import DeviceMapperBackend  # noqa: F401
