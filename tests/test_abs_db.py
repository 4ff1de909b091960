"""Database-loader tests with synthetic miniature databases.

The real SSFR 16-g and REPTRAN databases are not redistributable; these
tests build tiny files in the same layouts and verify the loaders produce
physically consistent AbsCoef structures.
"""

import os

import h5py
import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_16g, abs_synthetic, G16_WEIGHTS
from er3t_tpu.pre.abs_16g_db import abs_16g_from_h5, interpolation_factors


@pytest.fixture(scope='module')
def atm():
    return atm_atmmod(np.linspace(0, 20, 21))


def test_interpolation_factors_normalized(atm):
    h2o_mix = atm.lay.h2o / atm.lay.factor
    fac = interpolation_factors(atm.lay.pressure, atm.lay.temperature, h2o_mix)
    np.testing.assert_allclose(fac['fac_tp'].sum(axis=(1, 2)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(fac['fac_vtp'].sum(axis=(1, 2, 3)), 1.0, rtol=1e-6)
    assert fac['jpd'].min() >= 0 and fac['jpu'].max() <= 58


def _make_mini_db(fname, wvl=650, kval=1e-4):
    """Minimal abs_16g.h5 with constant k for the 650nm region absorbers."""
    ng = 16
    with h5py.File(fname, 'w') as f:
        # k tables for every (gas, pressure, temperature) the profile touches
        for gas, kname in (('H2O', 'kgh2o'), ('O3', 'kgo3'), ('O2_cont5', 'kgo2')):
            for jp in range(1, 60):
                for jt in range(1, 5):
                    d = np.zeros((ng, 4))
                    d[:, 2] = kval            # k
                    d[:, 3] = 1.0             # slit
                    f[f'/{gas}/pressure.{jp}/temperature.{jt}/{kname}.{wvl}'] = d
        g = f.create_group(f'/solar_v1.3/solar_k/solar_taug.{wvl}')
        v1, v2 = 1.0e7 / (wvl + 5.0), 1.0e7 / (wvl - 5.0)
        g['params'] = np.array([v1, v2, 0.01, 100, 0, 2, 1.6])
        data = np.zeros((ng, 4))
        # loader converts with cv = (v2-v1)/(l2-l1); invert so solar = 1.55
        data[:, -1] = 1.55 * 10.0 / (v2 - v1)
        g['data'] = data


def test_abs_16g_db_loader(tmp_path, atm):
    fname = os.path.join(tmp_path, 'abs_16g.h5')
    _make_mini_db(fname)
    coef = abs_16g(650.0, atm, fname_h5=fname)
    assert not coef.synthetic
    assert coef.abso_coef.shape == (20, 16)
    np.testing.assert_allclose(coef.weight, G16_WEIGHTS)
    # constant k=1e-4 per unit column: od = k * (col_h2o+col_o3+col_o2)*1e-20*1e5*dz
    col = (atm.lay.h2o + atm.lay.o3 + atm.lay.o2) * 1e-20 * 1e5 * atm.lay.thickness
    np.testing.assert_allclose(coef.abso_coef[:, 0], 1e-4 * col, rtol=1e-6)
    assert coef.solar[0] == pytest.approx(1.55, rel=1e-6)
    assert np.all(coef.slit_func == 1.0)


def test_synthetic_spectral_shape(atm):
    """Synthetic k: strong O2 A-band, weak 650nm, strong 1380nm H2O."""
    od = {}
    for wvl in (650.0, 762.0, 1380.0):
        coef = abs_synthetic(wvl, atm)
        od[wvl] = (coef.abso_coef * coef.weight[None, :]).sum()
    assert od[762.0] > 10 * od[650.0]
    assert od[1380.0] > 10 * od[650.0]


def _make_mini_txt_db(fdir, wvl=650, kval=1e-4):
    """Legacy text-tree twin of _make_mini_db (reference abs_16g_txt layout:
    {fdir}/{GAS}/pressure.{jp}/temperature.{jt}/{kg}.{wvl} text tables +
    solar_v1.3/solar_k/solar_taug.{wvl} with a header line)."""
    ng = 16
    for gas, kname in (('H2O', 'kgh2o'), ('O3', 'kgo3'), ('O2_cont5', 'kgo2')):
        for jp in range(1, 60):
            for jt in range(1, 5):
                d = np.zeros((ng, 4))
                d[:, 2] = kval
                d[:, 3] = 1.0
                p = os.path.join(fdir, gas, f'pressure.{jp}',
                                 f'temperature.{jt}')
                os.makedirs(p, exist_ok=True)
                np.savetxt(os.path.join(p, f'{kname}.{wvl}'), d)
    sdir = os.path.join(fdir, 'solar_v1.3', 'solar_k')
    os.makedirs(sdir, exist_ok=True)
    v1, v2 = 1.0e7 / (wvl + 5.0), 1.0e7 / (wvl - 5.0)
    data = np.zeros((ng, 4))
    data[:, -1] = 1.55 * 10.0 / (v2 - v1)
    with open(os.path.join(sdir, f'solar_taug.{wvl}'), 'w') as f:
        f.write(f'{v1} {v2} 0.01 100 0 2 1.6\n')
        np.savetxt(f, data)


def test_abs_16g_txt_loader(tmp_path, atm):
    """The legacy text-database path produces identical coefficients to the
    HDF5 path on equivalent databases (abs_crk.py:710-1378 role)."""
    from er3t_tpu.pre.abs_16g_db import abs_16g_from_txt
    fdir = str(tmp_path / 'txtdb')
    _make_mini_txt_db(fdir)
    coef = abs_16g_from_txt(650.0, atm, fdir_k=fdir)
    col = (atm.lay.h2o + atm.lay.o3 + atm.lay.o2) * 1e-20 * 1e5 * atm.lay.thickness
    np.testing.assert_allclose(coef.abso_coef[:, 0], 1e-4 * col, rtol=1e-6)
    assert coef.solar[0] == pytest.approx(1.55, rel=1e-6)
    assert np.all(coef.slit_func == 1.0)
    # missing directory raises a clear error
    with pytest.raises(FileNotFoundError, match='ER3T_ABS16G_TXT_DIR'):
        abs_16g_from_txt(650.0, atm, fdir_k=str(tmp_path / 'nope'))
