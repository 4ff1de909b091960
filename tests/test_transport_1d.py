"""Transport-engine validation against analytic / deterministic references.

The reference validates its solver chain by cross-checking MCARaTS against
libRadtran (examples/00_er3t_bmk.py); here the MC engine is cross-checked
against closed forms and the in-framework delta-Eddington solver.
"""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.physics import rayleigh, twostream
from er3t_tpu.rtm.mc import SolverConfig, run_transport
from er3t_tpu.rtm.scene import build_scene
from er3t_tpu.rtm import solver


@pytest.fixture(scope='module')
def atm20():
    return atm_atmmod(np.linspace(0, 20, 21))


@pytest.fixture(scope='module')
def clear_run(atm20):
    """Shared clear-sky conservative MC run (pure Rayleigh, alb=0.3, sza=30)."""
    ab = abs_synthetic(650.0, atm20)
    ab.abso_coef[:] = 0.0
    scn, st = build_scene(atm20, ab, surface=0.3, solar_zenith_angle=30.0)
    cfg = SolverConfig(target='flux', batch=1 << 13)
    tal = run_transport(scn, st, cfg, n_photon=60000, seed=7)
    n = int(tal.n_launched)
    flux = np.asarray(tal.flux)[0, 0] / n
    w = ab.weight
    return {
        'f_dir': flux[:, 0, :] @ w,
        'f_dif': flux[:, 1, :] @ w,
        'f_up': flux[:, 2, :] @ w,
    }


def test_budget_respected(atm20):
    ab = abs_synthetic(650.0, atm20)
    scn, st = build_scene(atm20, ab, surface=0.0)
    cfg = SolverConfig(target='flux', batch=1 << 12)
    tal = run_transport(scn, st, cfg, n_photon=10000, seed=0)
    assert int(tal.n_launched) == 10000


def test_energy_conservation(clear_run):
    f = clear_run
    net_in = f['f_dir'][-1] + f['f_dif'][-1] - f['f_up'][-1]
    absorbed_sfc = (f['f_dir'][0] + f['f_dif'][0]) * (1 - 0.3)
    assert net_in == pytest.approx(absorbed_sfc, rel=0.01)


def test_direct_beam_beer_law(clear_run):
    mu0 = np.cos(np.deg2rad(30.0))
    tau = rayleigh.rayleigh_od(650.0, np.array([1013.25, 55.3]), lat_deg=30.0)[0]
    assert clear_run['f_dir'][0] == pytest.approx(np.exp(-tau / mu0), rel=0.01)


def test_flux_vs_delta_eddington(clear_run, atm20):
    mu0 = np.cos(np.deg2rad(30.0))
    tau_ray = rayleigh.rayleigh_od(650.0, atm20.lev.pressure, lat_deg=30.0)
    de = twostream.delta_eddington_flux(tau_ray, np.ones(20) - 1e-9,
                                        np.zeros(20), mu0=mu0, albedo=0.3)
    # delta-Eddington itself is ~1% accurate for Rayleigh slabs
    assert clear_run['f_up'][-1] == pytest.approx(de['f_up'][-1] / mu0, rel=0.03)
    f_dn_sfc = clear_run['f_dir'][0] + clear_run['f_dif'][0]
    assert f_dn_sfc == pytest.approx(de['f_down'][0] / mu0, rel=0.01)


def test_radiance_single_scatter_anchor(atm20):
    """Nadir radiance over Lambertian surface ~ SS Rayleigh + surface term."""
    ab = abs_synthetic(650.0, atm20)
    ab.abso_coef[:] = 0.0
    alb, sza = 0.3, 30.0
    mu0 = np.cos(np.deg2rad(sza))
    scn, st = build_scene(atm20, ab, surface=alb, solar_zenith_angle=sza)
    cfg = SolverConfig(target='radiance', batch=1 << 13)
    tal = run_transport(scn, st, cfg, n_photon=100000, seed=3)
    rad = float(np.asarray(tal.rad)[0, 0] @ ab.weight) / int(tal.n_launched)
    tau = rayleigh.rayleigh_od(650.0, np.array([1013.25, 55.3]), lat_deg=30.0)[0]
    p_ray = 0.75 * (1 + mu0 ** 2)
    ss = p_ray / (4 * np.pi) * (1 - np.exp(-tau * (1 + 1 / mu0))) / (1 + mu0)
    sfc = alb / np.pi * np.exp(-tau / mu0) * np.exp(-tau)
    # first-order analytic is a lower bound; multiple scattering adds ~5-8%
    assert rad == pytest.approx(ss + sfc, rel=0.10)
    assert rad > ss + sfc


def test_solver_driver_flux(atm20):
    ab = abs_synthetic(650.0, atm20)
    res = solver.solve(atm=atm20, abs_coef=ab, surface=0.0, target='flux',
                       solar_zenith_angle=0.0, photons=30000, n_run=2,
                       batch=1 << 12)
    assert res.target == 'flux'
    f_dir_toa = float(res['f_down_direct'][0, 0, -1])
    # physical TOA direct flux = E(650nm)*mu0 ~ 1.60 W/m2/nm
    assert f_dir_toa == pytest.approx(1.60, rel=0.02)
    assert res['f_up'].shape == (1, 1, 21)
    assert 'f_up_std' in res.std


def test_ipa_equals_3d_for_homogeneous(atm20):
    """IPA and 3D must agree when the scene is horizontally homogeneous."""
    ab = abs_synthetic(650.0, atm20)
    kw = dict(atm=atm20, abs_coef=ab, surface=0.1, target='flux',
              solar_zenith_angle=30.0, photons=40000, n_run=1, batch=1 << 12)
    r3d = solver.solve(solver='3d', seed=11, **kw)
    ripa = solver.solve(solver='ipa', seed=12, **kw)
    np.testing.assert_allclose(r3d['f_up'][0, 0, -1], ripa['f_up'][0, 0, -1],
                               rtol=0.03)


def test_heating_rate(atm20):
    ab = abs_synthetic(650.0, atm20)
    res = solver.solve(atm=atm20, abs_coef=ab, surface=0.0, target='hr',
                       solar_zenith_angle=0.0, photons=30000, n_run=1,
                       batch=1 << 12)
    hr = np.asarray(res['hr'])
    assert hr.shape == (20,)      # direct absorbed-energy tally (r4)
    assert np.all(np.isfinite(hr))
    # absorption -> positive heating somewhere, modest magnitudes
    assert hr.max() > 0
    assert hr.max() < 5.0
