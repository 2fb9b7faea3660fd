from .classes import EqClasses, EqClassAccumulator  # noqa: F401
