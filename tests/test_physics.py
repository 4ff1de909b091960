"""Unit tests for the physics foundation (atmosphere, Rayleigh, Mie, solar).

Anchor values are published numbers: Bodhaine (1999) Rayleigh optical
depths, BHMIE efficiencies, U.S.-standard column amounts.
"""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod, us_standard_profile
from er3t_tpu.physics import mie, rayleigh, solar, twostream
from er3t_tpu.physics.hg import hg_phase, sample_hg_mu


def test_ussa_profile_anchors():
    prof = us_standard_profile(np.array([0.0, 11.0, 20.0, 50.0]))
    assert prof['pressure'][0] == pytest.approx(1013.25, rel=1e-6)
    assert prof['temperature'][0] == pytest.approx(288.15, rel=1e-6)
    assert prof['pressure'][1] == pytest.approx(226.3, rel=0.01)   # tropopause
    assert prof['temperature'][1] == pytest.approx(216.7, rel=0.01)
    assert prof['pressure'][3] == pytest.approx(0.798, rel=0.03)   # 50 km


def test_o3_column_345du():
    z = np.linspace(0, 120, 4801)
    prof = us_standard_profile(z)
    col_du = np.trapezoid(prof['o3'], z * 1e5) / 2.6867811e16
    assert col_du == pytest.approx(345.0, rel=1e-3)


def test_atmosphere_object():
    atm = atm_atmmod(np.linspace(0, 20, 21))
    assert atm.nz == 20
    assert atm.lev.pressure[0] > atm.lev.pressure[-1]
    # number densities positive, o2 ~ 20.95% of air
    np.testing.assert_allclose(atm.lay.o2 / atm.lay.factor, 0.2095, rtol=1e-6)


def test_rayleigh_bodhaine_anchor():
    # Bodhaine et al. (1999): sea-level column OD at 550 nm ~ 0.0973, at
    # 450 nm ~ 0.2206 (within the parameterization's few-permille accuracy)
    od550 = rayleigh.rayleigh_od(550.0, np.array([1013.25, 0.0]), lat_deg=45.0)
    od450 = rayleigh.rayleigh_od(450.0, np.array([1013.25, 0.0]), lat_deg=45.0)
    assert od550[0] == pytest.approx(0.0973, rel=0.005)
    assert od450[0] == pytest.approx(0.2206, rel=0.005)


def test_rayleigh_sampling_moments():
    import jax
    u = np.asarray(jax.random.uniform(jax.random.key(0), (200000,)))
    mu = np.asarray(rayleigh.sample_rayleigh_mu(u))
    assert abs(mu.mean()) < 5e-3                      # asymmetry 0
    assert np.mean(mu ** 2) == pytest.approx(0.4, abs=5e-3)  # <mu^2>=2/5


def test_mie_bhmie_anchor():
    qext, qsca, g, _ = mie.mie_single(1.0, 1.5 + 0j, np.array([1.0, -1.0]))
    assert qsca == pytest.approx(0.2151, rel=1e-3)
    assert qext == pytest.approx(qsca, rel=1e-6)      # non-absorbing


def test_mie_water_cloud():
    res = mie.mie_gamma_dist(650.0, [10.0], n_quad=24)
    assert res['ssa'][0] > 0.999
    assert 0.83 < res['asy'][0] < 0.89
    assert 1.9 < res['qe'][0] < 2.3
    mu = np.cos(np.deg2rad(res['ang']))
    # normalization and internal consistency of asy
    assert -np.trapezoid(res['pha'][:, 0], mu) == pytest.approx(2.0, rel=1e-6)
    asy_p = -np.trapezoid(res['pha'][:, 0] * mu, mu) / 2.0
    assert asy_p == pytest.approx(res['asy'][0], abs=5e-3)


def test_hg_sampling():
    import jax
    g = 0.85
    u = np.asarray(jax.random.uniform(jax.random.key(1), (200000,)))
    mu = np.asarray(sample_hg_mu(g, u))
    assert mu.mean() == pytest.approx(g, abs=3e-3)


def test_hg_phase_norm():
    mu = np.linspace(-1, 1, 20001)
    p = hg_phase(0.85, mu)
    assert np.trapezoid(p, mu) == pytest.approx(2.0, rel=1e-3)


def test_twostream_closed_forms():
    assert twostream.r_twostream(0.0) == 0.0
    r = twostream.r_twostream(10.0, g=0.85, mu=1.0)
    t = twostream.t_twostream(10.0, g=0.85, mu=1.0)
    assert r + t == pytest.approx(1.0)


def test_delta_eddington_conservation():
    tau = np.array([0.1, 0.5, 5.0])
    omega = np.ones(3) * (1 - 1e-9)
    g = np.array([0.0, 0.5, 0.85])
    de = twostream.delta_eddington_flux(tau, omega, g, mu0=0.7, albedo=0.2)
    absorbed_sfc = de['f_down'][0] * 0.8
    net_toa = de['f_down_direct'][-1] - de['f_up'][-1]
    assert absorbed_sfc == pytest.approx(net_toa, rel=2e-3)


def test_solar_angles_sane():
    import datetime
    sza, saa = solar.solar_angles(datetime.datetime(2017, 8, 13, 18, 0), -105.0, 40.0)
    assert 25.0 < sza < 33.0
    assert 120.0 < saa < 180.0


def test_sol_fac_range():
    import datetime
    f_jan = solar.sol_fac(datetime.datetime(2019, 1, 3))
    f_jul = solar.sol_fac(datetime.datetime(2019, 7, 4))
    assert f_jan == pytest.approx(1.034, abs=0.002)   # perihelion
    assert f_jul == pytest.approx(0.967, abs=0.002)   # aphelion


def test_legendre_moment_roundtrip():
    """pmom machinery (reference pha_mie.py:229-376): HG moments are g^l;
    reconstruction matches the analytic phase; the series integral over the
    full range is 2."""
    import numpy as np
    from er3t_tpu.pre.pmom import (phase2mom, legendre2phase, mom2phase,
                                   mom2phaseint)
    from er3t_tpu.physics.hg import hg_phase

    g = 0.7
    ang = np.linspace(0.0, 180.0, 3601)
    mu = np.cos(np.deg2rad(ang))
    p = hg_phase(g, mu)
    mom = phase2mom(ang, p, 64)
    np.testing.assert_allclose(mom[:8], g ** np.arange(8), atol=2e-4)
    # reconstruction without delta scaling matches analytic HG
    p_rec = legendre2phase(mom, angle=ang, deltascaling=False)
    sel = ang > 5.0
    np.testing.assert_allclose(p_rec[sel], p[sel], rtol=2e-2, atol=5e-3)
    # mom2phase recurrence agrees with legval path
    w = mom * (2.0 * np.arange(mom.size) + 1.0)
    np.testing.assert_allclose(mom2phase(w, mu[::100]),
                               np.polynomial.legendre.legval(mu[::100], w),
                               rtol=1e-10)
    # integral of P over [-1, 1] is 2
    np.testing.assert_allclose(mom2phaseint(w, np.array([-1.0])), 2.0,
                               rtol=1e-5)


def test_pha_mie_wc_pmom():
    import numpy as np
    from er3t_tpu.pre.pmom import pha_mie_wc_pmom
    obj = pha_mie_wc_pmom(650.0, n_mom=256,
                          reff_grid=np.array([5.0, 10.0]))
    assert obj.data['pmom'].shape == (2, 256)
    np.testing.assert_allclose(obj.data['pmom'][:, 0], 1.0, atol=1e-3)
    # first moment = asymmetry parameter
    np.testing.assert_allclose(obj.data['pmom'][:, 1], obj.data['asy'],
                               atol=5e-3)
    # reconstructed phase is usable by the table compiler
    from er3t_tpu.pre.pha import build_phase_table
    t = build_phase_table(obj, forward_trunc_deg=20.0)
    assert t.n_pf == 3 and np.all(t.trunc_f[1:] >= 0)
