from .sam import encode_sequence_in_sam  # noqa: F401
