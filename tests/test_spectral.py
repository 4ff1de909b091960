"""Spectral machinery (apps/spectral.py — the rtm.lrt spectral role).

Anchors spec_flx/spec_rad (doubling-adding engine + correlated-k gas
absorption + cld/aer configs + slit convolution) against physics bounds and
the MC solver.
"""

import numpy as np
import pytest

import jax

jax.config.update('jax_platforms', 'cpu')

from er3t_tpu.apps.spectral import (slit_convolve, spec_flx, spec_rad,
                                    triangular_slit)
from er3t_tpu.physics.cloud_optics import water_cloud_optics
from er3t_tpu.pre.atm import atm_atmmod


@pytest.fixture(scope='module')
def atm():
    return atm_atmmod(np.linspace(0, 20, 21))


def test_water_cloud_optics_physical():
    for wvl, reff in ((550.0, 10.0), (1650.0, 5.0), (2130.0, 20.0)):
        scale, ssa, asy = water_cloud_optics(wvl, reff)
        assert 0.7 < scale < 1.3
        assert 0.8 < ssa <= 1.0
        assert 0.75 < asy < 0.92
    # absorption grows with reff and into the NIR
    assert water_cloud_optics(2130.0, 20.0)[1] < water_cloud_optics(2130.0, 5.0)[1]
    assert water_cloud_optics(1940.0, 10.0)[1] < water_cloud_optics(860.0, 10.0)[1]


def test_spec_flx_clear_bounds(atm):
    out = spec_flx(atm, wavelengths=[450.0, 550.0, 650.0],
                   solar_zenith_angle=30.0, surface_albedo=0.2,
                   slit=None, n_streams=6)
    assert np.all(out['f_down'] > 0)
    assert np.all(out['f_down'] <= out['toa'] * 1.001)
    assert np.all(out['f_up'] < out['f_down'])
    # direct beam bounded by Rayleigh+gas attenuation; diffuse grows bluer
    assert np.all(out['f_down_direct'] < out['toa'])
    r450 = out['f_down_diffuse'][0] / out['f_down'][0]
    r650 = out['f_down_diffuse'][2] / out['f_down'][2]
    assert r450 > r650          # stronger Rayleigh scattering at 450 nm


def test_spec_flx_cloud_and_albedo_file(atm):
    alb_tab = np.array([[350.0, 0.1], [950.0, 0.5]])   # albedo_file role
    clear = spec_flx(atm, wavelengths=[650.0], solar_zenith_angle=30.0,
                     surface_albedo=alb_tab, slit=None, n_streams=6)
    cloudy = spec_flx(atm, wavelengths=[650.0], solar_zenith_angle=30.0,
                      surface_albedo=alb_tab, slit=None, n_streams=6,
                      cld_cfg=dict(cloud_base=1.0, cloud_top=2.0,
                                   cloud_optical_thickness=10.0,
                                   cloud_effective_radius=10.0))
    assert cloudy['f_down'][0] < 0.75 * clear['f_down'][0]
    assert cloudy['f_up'][0] > clear['f_up'][0]
    # interpolated albedo at 650 nm is 0.3; clear-sky direct unchanged
    np.testing.assert_allclose(cloudy['toa'], clear['toa'])


def test_spec_flx_aerosol(atm):
    clear = spec_flx(atm, wavelengths=[550.0], solar_zenith_angle=30.0,
                     slit=None, n_streams=6)
    hazy = spec_flx(atm, wavelengths=[550.0], solar_zenith_angle=30.0,
                    slit=None, n_streams=6,
                    aer_cfg=dict(aerosol_optical_depth=0.5,
                                 single_scattering_albedo=0.9,
                                 asymmetry_parameter=0.7))
    assert hazy['f_down_direct'][0] < 0.7 * clear['f_down_direct'][0]
    assert hazy['f_down_diffuse'][0] > clear['f_down_diffuse'][0]


def test_spec_rad_cloud_brightens_nadir(atm):
    kw = dict(wavelengths=[650.0], solar_zenith_angle=30.0,
              sensor_zenith_angle=0.0, relative_azimuth=0.0,
              surface_albedo=0.03, slit=None, n_streams=8)
    clear = spec_rad(atm, **kw)
    cloudy = spec_rad(atm, cld_cfg=dict(cloud_base=1.0, cloud_top=2.0,
                                        cloud_optical_thickness=10.0,
                                        cloud_effective_radius=10.0), **kw)
    assert cloudy['rad'][0] > 3.0 * clear['rad'][0]
    assert clear['rad'][0] > 0


def test_slit_convolution_smooths():
    wvl = np.arange(400.0, 500.1, 1.0)
    spec = np.where(wvl == 450.0, 1.0, 0.0)       # a line
    off, wt = triangular_slit(8.0)
    out = slit_convolve(wvl, spec, off, wt, wvl)
    assert out[np.where(wvl == 450.0)[0][0]] < 0.2   # spread out
    np.testing.assert_allclose(out.sum(), spec.sum(), rtol=0.05)


@pytest.mark.slow
def test_spec_flx_matches_mc(atm):
    """1D spectral flux closes against the MC solver (clear sky, 650 nm)."""
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.rtm import solver

    out = spec_flx(atm, wavelengths=[650.0], solar_zenith_angle=30.0,
                   surface_albedo=0.2, slit=None, n_streams=8,
                   abs_fn=abs_synthetic)
    ab = abs_synthetic(650.0, atm)
    r = solver.solve(atm=atm, abs_coef=ab, target='flux', surface=0.2,
                     solar_zenith_angle=30.0, photons=1.5e5, n_run=1, seed=2)
    mc_dn_sfc = float(r['f_down'][0, 0, 0])
    mc_up_toa = float(r['f_up'][0, 0, -1])
    assert out['f_down'][0] == pytest.approx(mc_dn_sfc, rel=0.03)
    assert out['f_up'][0] == pytest.approx(mc_up_toa, rel=0.06)
