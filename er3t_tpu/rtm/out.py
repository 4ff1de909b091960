"""Spectral reduction of raw tallies to physical radiance / irradiance.

Reproduces the reference's normalization chain
(/root/reference/er3t/rtm/mca/mca_out.py:311-328, 444-453):

    factor(iz, ig) = sol_fac * solar(ig) * weight(ig) * slit(iz, ig)
                     / sum_g[weight * slit(iz, :)]

applied to per-g raw outputs and summed over g; means/stds over the Nrun
independent repeats are computed by the solver driver.

Raw-tally units: the transport kernel launches photons of unit weight from
TOA, so per-photon tallies are normalized to unit *horizontal* TOA solar
flux: raw_flux = tally/N * mu0 and raw_radiance = tally/N * mu0 * nx * ny
(pixel-area normalization) are the direct MCARaTS raw-output equivalents.
"""

from __future__ import annotations

import numpy as np

from ..physics.solar import sol_fac as _sol_fac

__all__ = ['spectral_factors', 'reduce_flux', 'reduce_radiance',
           'heating_rate', 'smooth_diffusion']


def smooth_diffusion(field, n_iter=1, axes=(0, 1)):
    """Numerical-diffusion smoothing of noisy MC fields.

    The reference exposes MCARaTS's numerical diffusion knobs
    (``Flx_diff0/1``, ``Rad_difr0/1``, mca_inp.py) to smooth noisy flux /
    heating-rate / radiance fields; here the equivalent is ``n_iter``
    explicit diffusion steps over the horizontal axes (periodic domain),
    each a 5-point stencil f <- f/2 + (sum of 4 neighbors)/8.  Conserves
    the field total exactly.
    """
    f = np.asarray(field, dtype=np.float64).copy()
    a0, a1 = axes
    for _ in range(int(n_iter)):
        nb = (np.roll(f, 1, axis=a0) + np.roll(f, -1, axis=a0)
              + np.roll(f, 1, axis=a1) + np.roll(f, -1, axis=a1))
        f = 0.5 * f + 0.125 * nb
    return f


def spectral_factors(abs_coef, date=None, nz_out: int | None = None):
    """(Nz_out, Ng) factors + scalar TOA irradiance (reference protocol)."""
    w = abs_coef.weight
    slit = abs_coef.slit_func
    sol = abs_coef.solar
    sf = _sol_fac(date)
    nz = nz_out or slit.shape[0] + 1
    zz = np.arange(nz)
    zz = np.clip(zz, 0, slit.shape[0] - 1)
    if nz > 1:
        zz[-1] = zz[-2]
    norm = sf / (w[None, :] * slit[zz, :]).sum(axis=1)          # (Nz_out,)
    factors = norm[:, None] * sol[None, :] * w[None, :] * slit[zz, :]
    toa = float(np.sum(sf * sol * w))
    return factors, toa


def reduce_flux(tally_flux: np.ndarray, n_launched: int, abs_coef, mu0: float,
                date=None, precontracted=False):
    """Physical fluxes from a raw flux tally (Nxf, Nyf, Nlev, 3, Ng).

    Returns dict of (Nxf, Nyf, Nlev) arrays in W/m^2/nm:
    f_down_direct, f_down_diffuse, f_down, f_up.

    ``precontracted``: the tally's g axis is a singleton already contracted
    with the spectral factors in-kernel (mc_flight ``flux_w``); only the
    photon normalization is applied here.
    """
    nlev = tally_flux.shape[2]
    factors, toa = spectral_factors(abs_coef, date=date, nz_out=nlev)
    # per-column tallies: each of the Nxf*Nyf columns receives an equal share
    # of the uniformly-spawned photon budget, so per-area normalization is
    # (Nxf*Nyf)/N (reference counterpart: MCARaTS normalizes per grid cell)
    n_col = tally_flux.shape[0] * tally_flux.shape[1]
    raw = tally_flux * (mu0 * n_col / max(n_launched, 1))       # (..., Nlev, 3, Ng)
    if precontracted:
        phys = raw[..., 0]
    else:
        phys = np.einsum('xyzcg,zg->xyzc', raw, factors)
    out = {
        'f_down_direct': phys[..., 0],
        'f_down_diffuse': phys[..., 1],
        'f_up': phys[..., 2],
        'f_down': phys[..., 0] + phys[..., 1],
        'toa': toa,
    }
    return out


def reduce_radiance(tally_rad: np.ndarray, n_launched: int, abs_coef,
                    mu0: float, date=None, precontracted=False):
    """Physical radiance (Nx, Ny) [W/m^2/nm/sr] from a raw radiance tally.

    ``precontracted``: the tally's g axis is a singleton already contracted
    with the spectral factors in-kernel (mc_flight ``rad_w``)."""
    nx, ny, ng = tally_rad.shape
    factors, toa = spectral_factors(abs_coef, date=date, nz_out=1)
    raw = tally_rad * (mu0 * nx * ny / max(n_launched, 1))
    rad = raw[..., 0] if precontracted else raw @ factors[0]
    return {'rad': rad, 'toa': toa}


def reduce_camera_radiance(tally_rad, n_launched, abs_coef, mu0,
                           domain_area_m2, qmax_deg, date=None,
                           precontracted=False):
    """Physical fisheye radiance [W/m^2/nm/sr] from a camera tally.

    The point-estimator tallies flux-at-sensor per direction bin; dividing
    by each pixel's solid angle (equidistant fisheye projection) yields
    radiance.  Photon normalization: each photon carries
    E(lambda)*mu0*A_domain / N.
    """
    nx, ny, ng = tally_rad.shape
    factors, toa = spectral_factors(abs_coef, date=date, nz_out=1)
    # per-pixel solid angle of the equidistant fisheye mapping
    i, j = np.meshgrid(np.arange(nx), np.arange(ny), indexing='ij')
    px = (i + 0.5) / nx * 2 - 1
    py = (j + 0.5) / ny * 2 - 1
    pr = np.sqrt(px ** 2 + py ** 2)
    qmax = np.deg2rad(qmax_deg)
    theta = pr * qmax
    inside = pr < 1.0
    # dOmega = sin(theta) dtheta dphi; jacobian of (px,py)->(theta,phi):
    # dpx dpy = (pr/qmax^2)^-1 ... for the equidistant map pr = theta/qmax:
    # dOmega = sin(theta)/pr * qmax^2 * dpx dpy / (2/nx * 2/ny scaling)
    with np.errstate(invalid='ignore', divide='ignore'):
        sinc = np.where(pr > 1e-6, np.sin(theta) / np.maximum(pr, 1e-6), qmax)
    d_omega = sinc * qmax * (2.0 / nx) * (2.0 / ny)
    d_omega = np.where(inside, d_omega, np.nan)

    raw = tally_rad * (mu0 * domain_area_m2 / max(n_launched, 1))
    rad = (raw[..., 0] if precontracted else raw @ factors[0]) / d_omega
    return {'rad': rad, 'toa': toa, 'solid_angle': d_omega}


def heating_rate(flux: dict, atm):
    """Shortwave heating rate [K/day] per layer from level net fluxes.

    HR = dF_net/dz / (rho cp); the energy absorbed in a layer divided by its
    air heat capacity (the reference obtains this from MCARaTS's Flx_mhrt=1
    target; mca_inp.py:129-152).  Prefer :func:`heating_rate_from_absorbed`
    when the direct tally is available: with the flight kernel's analytic
    per-flight fluxes the noise is equivalent (measured parity — the two
    estimators are fully correlated), but the direct tally is exact by
    construction (its energy closure exposed a missing surface up-crossing
    in all three engines) and needs no post-processing.
    """
    f_net = flux['f_down'] - flux['f_up']                       # (..., Nlev)
    d_fnet = f_net[..., 1:] - f_net[..., :-1]                   # absorbed per layer
    cp = 1004.0
    dz_m = atm.lay.thickness * 1000.0
    rho = atm.lay.pressure * 100.0 / (287.0 * atm.lay.temperature)
    return d_fnet / (rho * cp * dz_m) * 86400.0


def heating_rate_from_absorbed(absorbed_tally, n_launched, abs_coef, mu0,
                               atm, date=None):
    """Heating rate [K/day] from the kernel's direct per-layer absorbed
    tally (mc_flight ``tally_absorbed`` — the Flx_mhrt estimator): the
    same photon normalization and factor chain as the flux tallies, then
    the layer heat-capacity conversion."""
    nz, ng = np.asarray(absorbed_tally).shape
    factors, _ = spectral_factors(abs_coef, date=date, nz_out=nz + 1)
    # per-layer factors: use the level factors of the layer bottoms (the
    # slit columns are layer-resolved already; nz_out=nz+1 pads the TOA row)
    abs_phys = (np.asarray(absorbed_tally) * factors[:nz]).sum(axis=1) \
        * (mu0 / max(n_launched, 1))                        # W/m^2/nm per layer
    cp = 1004.0
    dz_m = atm.lay.thickness * 1000.0
    rho = atm.lay.pressure * 100.0 / (287.0 * atm.lay.temperature)
    return abs_phys / (rho * cp * dz_m) * 86400.0
