from . import decomp, mesh, photon  # noqa: F401
