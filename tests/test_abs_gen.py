"""Absorption-database generator + abs_synthetic validation (VERDICT r3
weak #6 / next-round item 4).

gen_abs_16g_h5 writes a real abs_16g.h5-layout database (59 log-pressure
levels x 5 temperature offsets x 10 wv points, reference units) from the
embedded cross-sections; abs_16g_from_h5 then reads it through the full
trilinear interpolation machinery.  Agreement between that path and the
direct abs_synthetic evaluation validates both the reader/accumulator and
the synthetic model's self-consistency on the database grid.
"""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.abs_gen import (cal_solar_kurudz, cal_xsec_no2_burrows,
                                  cal_xsec_o3_molina, cal_xsec_o4_greenblatt,
                                  gen_abs_16g_h5)
from er3t_tpu.pre.abs_16g_db import abs_16g_from_h5


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    fn = tmp_path_factory.mktemp('absdb') / 'abs_16g_gen.h5'
    gen_abs_16g_h5(str(fn), [500.0, 650.0, 770.0])
    return str(fn)


def test_xsec_functions_physical():
    """Cross-sections are positive, O3 Chappuis peaks near 600 nm, NO2
    falls steeply into the red, Kurucz fallback matches the composite
    solar spectrum."""
    assert cal_xsec_o3_molina(602.0, 250.0) > cal_xsec_o3_molina(450.0, 250.0)
    assert cal_xsec_no2_burrows(430.0) > 10 * cal_xsec_no2_burrows(650.0)
    assert cal_xsec_o4_greenblatt(577.0) > cal_xsec_o4_greenblatt(550.0)
    assert 1.0 < cal_solar_kurudz(500.0) < 2.2


def test_xsec_reference_table_format(tmp_path):
    """The reference .dat formats load when supplied (util.py:48-98):
    O3 Molina carries quadratic temperature coefficients."""
    fn = tmp_path / 'crs_o3.dat'
    np.savetxt(fn, np.array([[500.0, 1.0, 0.01, 0.0], [700.0, 3.0, 0.01, 0.0]]))
    s_cold = cal_xsec_o3_molina(600.0, 243.13, fname=str(fn))
    s_warm = cal_xsec_o3_molina(600.0, 293.13, fname=str(fn))
    assert s_warm > s_cold > 0
    np.testing.assert_allclose(s_warm - s_cold, 1e-20 * 0.01 * 50, rtol=1e-6)


def test_db_roundtrip_matches_synthetic(db):
    """Transmittance through the generated database (trilinear p/T/wv
    interpolation) matches the direct synthetic evaluation to <1.5% in
    column transmittance at every band; solar factors agree exactly.
    Residuals are the grid-interpolation error plus region-table
    differences (the DB path carries only the reference's per-region
    absorber set, e.g. no NO2), which bounds the abs_synthetic ansatz
    against an independently-coded path."""
    atm = atm_atmmod(np.linspace(0, 20, 21))
    for w in (500.0, 650.0, 770.0):
        a_s = abs_synthetic(w, atm)
        a_d = abs_16g_from_h5(w, atm, db)
        assert not a_d.synthetic
        for mu in (1.0, 0.5, 0.25):
            ts = np.sum(a_s.weight * np.exp(-a_s.abso_coef.sum(axis=0) / mu))
            td = np.sum(a_d.weight * np.exp(-a_d.abso_coef.sum(axis=0) / mu))
            assert td == pytest.approx(ts, rel=0.015), (w, mu)
        np.testing.assert_allclose(a_d.solar, a_s.solar, rtol=1e-3)
        np.testing.assert_allclose(a_d.weight, a_s.weight)


def test_db_solver_flux_matches_synthetic(db):
    """Domain-average flux driven by the generated DB matches the
    abs_synthetic-driven run within MC noise (solver-level closure)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    atm = atm_atmmod(np.linspace(0, 20, 21))
    outs = {}
    for tag, ab in (('syn', abs_synthetic(650.0, atm)),
                    ('db', abs_16g_from_h5(650.0, atm, db))):
        scn, st = build_scene(atm, ab, surface=0.2, solar_zenith_angle=30.0)
        cfg = SolverConfig(target='flux', batch=1 << 11, n_scat_max=200)
        t = run_transport_flight(scn, st, cfg, 40000, seed=8,
                                 rng_impl='threefry2x32')
        f = np.asarray(t.flux)[0, 0] @ ab.weight / int(t.n_launched)
        outs[tag] = f
    # TOA down-direct deterministic in both
    assert outs['syn'][-1, 0] == pytest.approx(1.0, rel=1e-5)
    assert outs['db'][-1, 0] == pytest.approx(1.0, rel=1e-5)
    # surface down and TOA up agree within MC noise + spectroscopy delta
    s_dn = outs['syn'][0, 0] + outs['syn'][0, 1]
    d_dn = outs['db'][0, 0] + outs['db'][0, 1]
    assert d_dn == pytest.approx(s_dn, rel=0.03)
    assert outs['db'][-1, 2] == pytest.approx(outs['syn'][-1, 2], rel=0.05)
