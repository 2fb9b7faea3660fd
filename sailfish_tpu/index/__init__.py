from .builder import QuasiIndex, build_index, load_index  # noqa: F401
