from . import ahi, daac, modis, oco2, viirs  # noqa: F401
