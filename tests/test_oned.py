"""Deterministic 1D multi-stream radiance anchor (the libRadtran/DISORT role,
reference er3t/rtm/lrt/lrt_rad.py:31-541): doubling-adding solver validated
against closed forms and cross-checked against the MC kernels."""

import numpy as np
import pytest

from er3t_tpu.rtm.oned import (solve_plane_parallel, hg_moments,
                               rayleigh_moments)


def test_thin_limit_single_scattering():
    """Optically thin Rayleigh layer reproduces the single-scattering
    closed form to O(tau)."""
    mu0, muv = 0.8, 0.6
    tau = 1e-4
    for dphi in (0.0, 1.0, np.pi):
        cs = -muv * mu0 + np.sqrt((1 - muv ** 2) * (1 - mu0 ** 2)) * np.cos(dphi)
        p = 0.75 * (1 + cs ** 2)
        k = 1 / mu0 + 1 / muv
        i1 = p / (4 * np.pi) * mu0 / (mu0 + muv) * -np.expm1(-tau * k)
        r = solve_plane_parallel([tau], [1.0], rayleigh_moments(3), mu0, muv,
                                 dphi, n_streams=16, delta_m=False, tms=False)
        assert r == pytest.approx(i1, rel=1e-3)


def test_conservation_and_stream_convergence():
    """Conservative thick cloud: energy closes and radiance is converged in
    stream count (delta-M + aliasing-safe moment truncation)."""
    rads = []
    for ns in (8, 16, 32):
        r, fl = solve_plane_parallel([20.0], [1.0], hg_moments(0.85, 128),
                                     0.8, 0.5, 0.7, n_streams=ns, flux=True)
        tot = fl['f_up_toa'] + fl['f_dn_sfc_direct'] + fl['f_dn_sfc_diffuse']
        assert tot == pytest.approx(0.8, rel=3e-3)
        rads.append(r)
    assert rads[0] == pytest.approx(rads[2], rel=2e-3)
    assert rads[1] == pytest.approx(rads[2], rel=1e-3)


def test_lambertian_surface_coupling():
    """Pure absorber over a Lambertian surface: exact closed form
    I = alb/pi * mu0 * exp(-tau/mu0) * exp(-tau/muv)."""
    tau, mu0, muv, alb = 0.5, 0.7, 0.9, 0.4
    r = solve_plane_parallel([tau], [1e-9], hg_moments(0.0, 4), mu0, muv,
                             0.0, surface_albedo=alb, n_streams=8)
    exact = alb / np.pi * mu0 * np.exp(-tau / mu0) * np.exp(-tau / muv)
    assert r == pytest.approx(exact, rel=1e-3)


@pytest.fixture(scope='module')
def mc_env():
    import jax  # noqa: F401  (conftest forces CPU)
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_synthetic(650.0, atm, ng=1)
    return atm, ab


def _mc_reflectance_units(res):
    """MC radiance divided by the TOA beam irradiance (per-unit-flux units
    of solve_plane_parallel)."""
    return float(np.asarray(res['rad']).mean()) / res.toa


def test_mc_vs_doubling_adding_clear(mc_env):
    """Clear Rayleigh+gas sky: MC radiance matches the deterministic solver
    within MC noise at several SZA/VZA pairs."""
    from er3t_tpu.rtm import solver
    from er3t_tpu.rtm.scene import build_scene
    atm, ab = mc_env
    for sza, alb in ((30.0, 0.2), (60.0, 0.05)):
        scn, st = build_scene(atm, ab, surface=alb, solar_zenith_angle=sza)
        dz = np.asarray(scn.z_lev)[1:] - np.asarray(scn.z_lev)[:-1]
        tau_ray = np.asarray(scn.sig_ray) * dz
        tau_abs = np.asarray(scn.kabs)[:, 0] * dz
        tau = tau_ray + tau_abs
        ssa = tau_ray / np.maximum(tau, 1e-12)
        res = solver.solve(atm=atm, abs_coef=ab, surface=alb,
                           target='radiance', solar_zenith_angle=sza,
                           photons=150000, n_run=1, batch=1 << 12, seed=11)
        i_mc = _mc_reflectance_units(res)
        i_da = solve_plane_parallel(tau, ssa, rayleigh_moments(4),
                                    np.cos(np.deg2rad(sza)), 1.0, 0.0,
                                    surface_albedo=alb, n_streams=16)
        assert i_mc == pytest.approx(i_da, rel=0.02), (sza, alb)


@pytest.mark.slow
def test_mc_vs_doubling_adding_cloud(mc_env):
    """Homogeneous HG cloud: nadir MC radiance matches doubling-adding
    (delta-M + TMS) within MC noise at two solar geometries."""
    from er3t_tpu.pre.cld import cld_gen_hom
    from er3t_tpu.rtm import solver
    from er3t_tpu.rtm.scene import build_scene
    atm, ab = mc_env
    cot = 8.0
    cld = cld_gen_hom(nx=2, ny=2, nz=2, dx=1.0, dy=1.0, cot0=cot, cer0=10.0,
                      cloud_base=1.0, cloud_top=3.0)
    for sza in (30.0, 60.0):
        alb = 0.1
        scn, st = build_scene(atm, ab, cld=cld, surface=alb,
                              solar_zenith_angle=sza)
        dz = np.asarray(scn.z_lev)[1:] - np.asarray(scn.z_lev)[:-1]
        tau_ray = np.asarray(scn.sig_ray) * dz
        tau_abs = np.asarray(scn.kabs)[:, 0] * dz
        tau_cld = np.zeros_like(tau_ray)
        tau_cld[st.iz3l:st.iz3l + st.nz3] = \
            np.asarray(scn.ext3d)[0, 0] * dz[st.iz3l:st.iz3l + st.nz3]
        tau = tau_ray + tau_abs + tau_cld
        ssa = (tau_ray + tau_cld) / np.maximum(tau, 1e-12)
        # per-layer moments: Rayleigh/cloud mixture weighted by scattering
        nmom = 128
        mom = np.zeros((tau.size, nmom))
        m_ray = rayleigh_moments(nmom)
        m_cld = hg_moments(0.85, nmom)
        wc = tau_cld / np.maximum(tau_ray + tau_cld, 1e-12)
        mom[:] = (1 - wc)[:, None] * m_ray[None, :] + wc[:, None] * m_cld[None, :]
        res = solver.solve(atm=atm, abs_coef=ab, cld=cld, surface=alb,
                           target='radiance', solar_zenith_angle=sza,
                           photons=250000, n_run=1, batch=1 << 12, seed=12)
        i_mc = _mc_reflectance_units(res)
        i_da = solve_plane_parallel(tau, ssa, mom,
                                    np.cos(np.deg2rad(sza)), 1.0, 0.0,
                                    surface_albedo=alb, n_streams=16)
        assert i_mc == pytest.approx(i_da, rel=0.03), sza


def test_multilayer_surface_diffuse_closure():
    """Surface diffuse flux must be layer-split invariant and close the
    energy budget (regression: the surface-first adding scheme froze the
    surface field before upper layers existed, losing ~45% of diffuse-down
    for a 2-layer Rayleigh atmosphere)."""
    import numpy as np

    from er3t_tpu.rtm.oned import (hg_moments, rayleigh_moments,
                                   solve_plane_parallel)

    mu0 = np.cos(np.deg2rad(30.0))
    mom1 = rayleigh_moments(3)
    results = []
    for taus in ([0.4], [0.2, 0.2], [0.1] * 4):
        n = len(taus)
        mom = np.tile(mom1, (n, 1))
        _, fl = solve_plane_parallel(np.array(taus), np.ones(n), mom, mu0,
                                     0.8, np.array([0.0]),
                                     surface_albedo=0.0, flux=True)
        total = (fl['f_up_toa'] + fl['f_dn_sfc_direct']
                 + fl['f_dn_sfc_diffuse'])
        assert total == pytest.approx(mu0, rel=1e-4)   # conservative medium
        results.append(fl['f_dn_sfc_diffuse'])
    assert results[0] == pytest.approx(results[1], rel=1e-6)
    assert results[0] == pytest.approx(results[2], rel=1e-6)
    # inhomogeneous split invariance incl. a reflecting surface
    kw = dict(mu0=mu0, mu_v=0.8, dphi=np.array([0.0]), surface_albedo=0.2,
              flux=True)
    _, f2 = solve_plane_parallel(
        np.array([0.3, 5.0]), np.array([1.0, 0.99]),
        np.vstack([rayleigh_moments(32), hg_moments(0.85, 32)]), **kw)
    _, f4 = solve_plane_parallel(
        np.array([0.15, 0.15, 2.5, 2.5]), np.array([1.0, 1.0, 0.99, 0.99]),
        np.vstack([rayleigh_moments(32)] * 2 + [hg_moments(0.85, 32)] * 2),
        **kw)
    for k in f2:
        assert f2[k] == pytest.approx(f4[k], rel=1e-6)
