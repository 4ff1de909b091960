"""Multi-wavelength convenience drivers.

Capability parity with the reference's spectral flux/radiance builders
(er3t/rtm/lrt/lrt_flx.py:207-412 ``lrt_init_spec_flx`` and the per-
wavelength loops in the example scripts): run the solver over a wavelength
grid and assemble spectra, optionally convolved with an instrument slit
function.
"""

from __future__ import annotations

import numpy as np

from ..pre.abs import abs_16g
from ..rtm import solver

__all__ = ['spectral_flux', 'spectral_radiance', 'slit_convolve']


def slit_convolve(wvl_grid, spectrum, slit_wvl, slit_weight, wvl_out):
    """Convolve a spectrum with a tabulated slit function."""
    out = np.zeros(np.asarray(wvl_out).size)
    for i, w0 in enumerate(np.atleast_1d(wvl_out)):
        w = np.interp(w0 + np.asarray(slit_wvl), wvl_grid, spectrum)
        out[i] = np.average(w, weights=slit_weight)
    return out


def _spectral(atm, wavelengths, target, abs_fn=None, **kw):
    abs_fn = abs_fn or (lambda w, a: abs_16g(w, a))
    results = []
    for w in np.atleast_1d(wavelengths):
        ab = abs_fn(float(w), atm)
        results.append(solver.solve(atm=atm, abs_coef=ab, target=target, **kw))
    return results


def spectral_flux(atm, wavelengths, **kw):
    """Flux spectra: dict of (Nwvl, ...) arrays + 'wvl'."""
    res = _spectral(atm, wavelengths, 'flux', **kw)
    out = {'wvl': np.atleast_1d(np.asarray(wavelengths, dtype=float))}
    for key in ('f_down', 'f_up', 'f_down_direct', 'f_down_diffuse'):
        out[key] = np.stack([r[key] for r in res])
    out['toa'] = np.array([r.toa for r in res])
    return out


def spectral_radiance(atm, wavelengths, **kw):
    """Radiance spectra: (Nwvl, Nx, Ny) + 'wvl'."""
    res = _spectral(atm, wavelengths, 'radiance', **kw)
    return {'wvl': np.atleast_1d(np.asarray(wavelengths, dtype=float)),
            'rad': np.stack([r['rad'] for r in res]),
            'toa': np.array([r.toa for r in res])}
