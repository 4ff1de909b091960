from . import constants, hg, mie, rayleigh, solar, twostream, water  # noqa: F401
