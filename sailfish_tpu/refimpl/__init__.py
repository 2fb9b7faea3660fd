"""Slow-but-clear numpy reference implementation of the mapping semantics.

This package is the *semantic oracle*: the device (JAX) kernels in
sailfish_tpu.map are tested for agreement with it, and it documents the
quasi-mapping behavior we implement (the reference's RapMap sources are
external to its repo, so behavior is pinned here rather than by a port).
"""

from .mapper import RefMapper, ReadMapping  # noqa: F401
