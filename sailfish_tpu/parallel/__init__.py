from .dist import make_mesh, distributed_quant_step  # noqa: F401
