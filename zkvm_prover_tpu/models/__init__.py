from . import air  # noqa: F401
