from . import readers  # noqa: F401
