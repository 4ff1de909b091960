from . import mc, scene  # noqa: F401
