"""RRTMG-SW loader against a synthetic database file.

The upstream ``abs_rrtmg_sw`` is a non-functional stub (abs_crk.py:1908
``sys.exit()``); this tests the completed implementation's interpolation
chain exactly by writing constant coefficient tables.
"""

import h5py
import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs_rrtmg import abs_rrtmg_sw, RRTMG_SW_WEIGHTS

NG = 4
K_LOW = 3.0e-26    # cm^2/molec, key species lower atmos
K_UPP = 5.0e-27    # cm^2/molec, key species upper atmos


def _make_rrtmg_nc(fname):
    with h5py.File(fname, 'w') as f:
        f['BandWavenumberLowerLimit'] = np.linspace(2600., 29000., 14)
        f['BandWavenumberUpperLimit'] = np.linspace(3250., 38000., 14)
        ngp = np.zeros((2, 14), np.int32)
        ngp[0] = NG
        f['NumGPoints'] = ngp
        gases = ['h2o', 'co2', 'o3', 'o2', 'ch4', 'no2'] + [''] * 6
        f['AbsorberNames'] = np.array([g.ljust(5).encode() for g in gases],
                                      dtype='S5')
        key_low = np.zeros((2, 14, 1), dtype='S8')
        key_low[0, :, 0] = b'h2o'
        key_low[1, :, 0] = b'co2'
        key_upp = np.zeros((2, 14, 1), dtype='S8')
        key_upp[0, :, 0] = b'o3'
        f['KeySpeciesNamesLowerAtmos'] = key_low
        f['KeySpeciesNamesUpperAtmos'] = key_upp
        f['KeySpeciesAbsorptionCoefficientsLowerAtmos'] = \
            np.full((2, 14, NG, 13, 5, 9), K_LOW)
        f['KeySpeciesAbsorptionCoefficientsUpperAtmos'] = \
            np.full((2, 14, NG, 47, 5, 5), K_UPP)
        f['AbsorptionCoefficientsLowerAtmos'] = np.zeros((2, 14, 12, NG, 19, 9))
        f['AbsorptionCoefficientsUpperAtmos'] = np.zeros((2, 14, 12, NG, 19, 5))
        f['H2OSelfAbsorptionCoefficients'] = np.zeros((2, 14, NG, 10))
        f['H2OForeignAbsorptionCoefficientsLowerAtmos'] = np.zeros((2, 14, NG, 3))
        f['PressureLowerAtmos'] = np.linspace(1050.0, 96.0, 13)
        f['PressureUpperAtmos'] = np.linspace(96.0, 0.01, 47)
        f['Temperature'] = np.linspace(180.0, 320.0, 19)
        f['TemperatureDiffFromMLS'] = np.array([-30., -15., 0., 15., 30.])
        f['TemperatureH2OSelf'] = np.linspace(160.0, 340.0, 10)
        sol = np.zeros((2, 14, 9, 16))
        sol[0, :, :, :NG] = 1.25
        f['SolarSourceFunctionLowerAtmos'] = sol
        f['Pressure'] = np.logspace(np.log10(0.01), np.log10(1050.0), 59)
        f['ReferenceTemperature'] = np.linspace(200.0, 290.0, 59)


@pytest.fixture(scope='module')
def db(tmp_path_factory):
    fn = tmp_path_factory.mktemp('rrtmg') / 'rrtmg_sw.nc'
    _make_rrtmg_nc(str(fn))
    return str(fn)


def test_rrtmg_band_selection(db):
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_rrtmg_sw(iband=9, atm_obj=atm, fname=db)
    wn = 0.5 * (np.linspace(2600., 29000., 14)[9]
                + np.linspace(3250., 38000., 14)[9])
    assert ab.wavelength == pytest.approx(1.0e7 / wn, rel=1e-6)
    assert ab.ng == NG
    np.testing.assert_allclose(ab.weight.sum(), 1.0)
    np.testing.assert_allclose(ab.weight,
                               RRTMG_SW_WEIGHTS[:NG] / RRTMG_SW_WEIGHTS[:NG].sum())
    np.testing.assert_allclose(ab.solar, 1.25)


def test_rrtmg_constant_tables_reproduce_columns(db):
    """With constant key tables and zero minors/continuum, the per-layer OD
    must be exactly k * (key-species column)."""
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_rrtmg_sw(iband=0, atm_obj=atm, fname=db)
    dz_cm = atm.lay.thickness * 1e5
    p = atm.lay.pressure
    col_low = (atm.lay.h2o + atm.lay.co2) * dz_cm
    col_upp = atm.lay.o3 * dz_cm
    expect = np.where(p >= 96.0, K_LOW * col_low, K_UPP * col_upp)
    np.testing.assert_allclose(ab.abso_coef[:, 0], expect, rtol=1e-6)
    # all g identical for constant tables
    np.testing.assert_allclose(ab.abso_coef, np.broadcast_to(
        ab.abso_coef[:, :1], ab.abso_coef.shape), rtol=1e-6, atol=1e-12)


def test_rrtmg_drives_the_solver(db):
    """The loader output plugs into build_scene + flux solve."""
    import jax
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig, run_transport

    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_rrtmg_sw(iband=0, atm_obj=atm, fname=db)
    scene, st = build_scene(atm, ab, surface=0.2, solar_zenith_angle=30.0)
    cfg = SolverConfig(target='flux', batch=1 << 12)
    t = run_transport(scene, st, cfg, 20000, seed=3)
    f_dn = np.asarray(t.flux)[0, 0, 0, 0] @ ab.weight / int(t.n_launched)
    assert 0.0 < f_dn <= 1.0
