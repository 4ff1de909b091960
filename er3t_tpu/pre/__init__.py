from . import atm  # noqa: F401
