from .em import EMResult, run_em  # noqa: F401
