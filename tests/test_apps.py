"""Application-layer tests: reflectance LUTs and bispectral retrieval."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.apps.lut import (func_ref_vs_cot, gen_bispectral_lookup_table,
                               retrieve_cot_cer)


@pytest.fixture(scope='module')
def atm():
    return atm_atmmod(np.linspace(0, 20, 21))


@pytest.mark.slow
def test_ref_vs_cot_monotone(atm):
    cot = np.array([0.0, 1.0, 5.0, 20.0, 80.0])
    c = func_ref_vs_cot(atm, cot_grid=cot, photons=100000,
                        solar_zenith_angle=30.0)
    assert c.ref.shape == (5,)
    # reflectance grows with COT and tracks the two-stream curve loosely
    assert np.all(np.diff(c.ref) > 0)
    assert c.ref[-1] > 0.5
    assert abs(c.ref[3] - c.ref_2s[3]) < 0.25
    # inversion round-trip
    cot_hat = c.get_cot_from_ref(c.ref[2])
    assert cot_hat[0] == pytest.approx(5.0, rel=0.25)


@pytest.mark.slow
def test_bispectral_lut_and_retrieval(atm):
    cot = np.array([0.0, 2.0, 8.0, 30.0])
    cer = np.array([6.0, 12.0, 20.0])
    lut = gen_bispectral_lookup_table(atm, cot_grid=cot, cer_grid=cer,
                                      photons=80000, wvl_nir=1600.0)
    assert lut['ref_vis'].shape == (4, 3)
    assert np.all(np.isfinite(lut['ref_vis']))
    # vis reflectance increases with COT at fixed CER
    assert np.all(np.diff(lut['ref_vis'], axis=0) > -0.02)
    cot_hat, cer_hat = retrieve_cot_cer(lut, lut['ref_vis'][2, 1],
                                        lut['ref_nir'][2, 1])
    assert cot_hat[0] == pytest.approx(8.0)
    assert cer_hat[0] == pytest.approx(12.0)


@pytest.mark.slow
def test_ref_vs_cot_multi_pixel(atm):
    """Per-pixel retrieval-curve variant (reference mca/util.py:218):
    Nrun statistics per node, rt + 2s inversion modes, cubic round-trip."""
    from er3t_tpu.apps.lut import func_ref_vs_cot_multi_pixel
    cot = np.array([0.0, 2.0, 8.0, 30.0])
    c = func_ref_vs_cot_multi_pixel(cot, atm=atm, photons=6e4, n_run=2,
                                    solar_zenith_angle=30.0, seed=5)
    assert c.ref.shape == c.ref_std.shape == (4,)
    assert np.all(np.diff(c.ref) > 0)          # monotone in COT
    assert np.all(c.ref_std[1:] > 0)           # run statistics populated
    assert np.all(c.ref_std < 0.2 * (c.ref + 0.05))
    # rt-mode cubic round-trip
    cot_hat = c.get_cot_from_ref(c.get_ref_from_cot(8.0))
    assert float(cot_hat[0]) == pytest.approx(8.0, rel=0.15)
    # 2s mode uses the closed-form curve exactly
    r2 = c.get_ref_from_cot(2.0, mode='2s')
    assert float(r2[0]) == pytest.approx(float(c.ref_2s[1]), rel=1e-6)
    # slant geometry accepted
    c2 = func_ref_vs_cot_multi_pixel(np.array([0.0, 8.0]), atm=atm,
                                     photons=3e4, n_run=1,
                                     sensor_zenith_angle=30.0,
                                     sensor_azimuth_angle=45.0, seed=6)
    assert c2.ref[1] > c2.ref[0]
