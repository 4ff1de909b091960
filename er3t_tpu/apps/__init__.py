from . import lut  # noqa: F401
