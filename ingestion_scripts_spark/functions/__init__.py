from . import text, timefns, sentiment  # noqa: F401
