"""Per-constituent 1D aerosol optics + LES/LASSO aerosol ingestion.

Reference roles: add_mca_1d_atm gives every added 1D constituent its own
ssa/apf with z-windowing (er3t/rtm/mca/mca_atm.py:105-139);
er3t/pre/aer/aer_les.py ingests LES fields as a 3D aerosol constituent."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.aer import Aerosol1D, Aerosol3D, aer_gen, aer_les, aer_lasso
from er3t_tpu.rtm import solver
from er3t_tpu.rtm.scene import build_scene


@pytest.fixture(scope='module')
def atm():
    return atm_atmmod(np.linspace(0, 20, 21))


def test_scene_keeps_constituents_distinct(atm):
    ab = abs_synthetic(650.0, atm, ng=4)
    a1 = Aerosol1D(aod=0.4, ssa=0.5, asy=0.5, z_bottom=0.0, z_top=2.0)
    a2 = Aerosol1D(aod=0.2, ssa=1.0, asy=0.8, z_bottom=3.0, z_top=6.0)
    scn, st = build_scene(atm, ab, aer_1ds=[a1, a2], surface=0.1)
    assert scn.sig_aer.shape == (st.nz, 2)
    np.testing.assert_allclose(np.asarray(scn.aer_ssa), [0.5, 1.0])
    # each constituent occupies its own z window
    assert np.asarray(scn.sig_aer)[:2, 0].min() > 0
    assert np.asarray(scn.sig_aer)[3:6, 1].min() > 0
    assert np.asarray(scn.sig_aer)[3:6, 0].max() == 0
    # distinct phase rows
    r1, r2 = np.asarray(scn.aer_apf)
    assert r1 != r2
    # and the rows carry the distinct HG asymmetries (sampled mean mu = asy)
    mu1 = np.asarray(scn.pt_mu)[r1].mean()
    mu2 = np.asarray(scn.pt_mu)[r2].mean()
    assert mu1 == pytest.approx(0.5, abs=0.05)
    assert mu2 == pytest.approx(0.8, abs=0.05)


def test_distinct_ssa_distinct_flux(atm):
    """Two aerosol layers with different ssa must produce different flux
    profiles (round-1 collapsed all constituents to mean ssa — and applied
    none of it in the 1D channel)."""
    ab = abs_synthetic(650.0, atm, ng=4)
    kw = dict(atm=atm, abs_coef=ab, surface=0.2, target='flux',
              solar_zenith_angle=30.0, photons=80000, n_run=1,
              batch=1 << 12, flux_per_column=False)
    absorbing = Aerosol1D(aod=0.8, ssa=0.4, asy=0.7, z_bottom=0.0, z_top=2.0)
    conserv = Aerosol1D(aod=0.8, ssa=1.0, asy=0.7, z_bottom=0.0, z_top=2.0)
    high = Aerosol1D(aod=0.3, ssa=1.0, asy=0.7, z_bottom=3.0, z_top=6.0)
    f_abs = solver.solve(aer_1ds=[absorbing, high], seed=3, **kw)
    f_con = solver.solve(aer_1ds=[conserv, high], seed=4, **kw)
    sfc_abs = float(f_abs['f_down'][0, 0, 0])
    sfc_con = float(f_con['f_down'][0, 0, 0])
    assert sfc_abs < 0.85 * sfc_con
    # marching engine agrees with the flight engine per constituent
    f_mar = solver.solve(aer_1ds=[absorbing, high], seed=5,
                         flux_engine='marching', **kw)
    assert sfc_abs == pytest.approx(float(f_mar['f_down'][0, 0, 0]), rel=0.06)


def _make_les_nc(fname, nx=6, ny=4, nz=5):
    import h5py
    rng = np.random.RandomState(2)
    with h5py.File(fname, 'w') as f:
        f['time'] = np.array([0.0])
        f['x'] = np.arange(nx) * 100.0
        f['y'] = np.arange(ny) * 100.0
        f['z'] = np.arange(nz) * 300.0 + 150.0
        f['p'] = np.linspace(1000.0, 900.0, nz)
        qc = np.zeros((1, nz, ny, nx))
        qc[0, 1:3] = rng.uniform(0.1, 0.4, (2, ny, nx))
        f['QC'] = qc
        f['QR'] = np.zeros_like(qc)
        f['QV'] = np.full((1, nz, ny, nx), 8.0)
        rel = np.zeros((1, nz, ny, nx))
        rel[0, 1:3] = 10.0
        f['REL'] = rel
        nc_ = np.zeros((1, nz, ny, nx))
        nc_[0, 1:3] = 50.0
        f['NC'] = nc_
        f['TABS'] = np.full((1, nz, ny, nx), 285.0)


def test_aer_les_ingestion(tmp_path):
    fn = str(tmp_path / 'les.nc')
    _make_les_nc(fn)
    a = aer_les(fn, ssa=0.85, asy=0.65, ext_scale=0.1)
    assert isinstance(a, Aerosol3D)
    assert a.ssa == 0.85 and a.asy == 0.65
    assert a.extinction.ndim == 3 and a.extinction.max() > 0
    b = aer_lasso(fn, ssa=0.85, asy=0.65, ext_scale=0.1)
    np.testing.assert_allclose(b.extinction, a.extinction)


def test_aer_les_through_solver(atm, tmp_path):
    """A 3D aerosol constituent from LES ingestion transports end-to-end."""
    from er3t_tpu.pre.cld import cld_les
    fn = str(tmp_path / 'les.nc')
    _make_les_nc(fn)
    ab = abs_synthetic(650.0, atm, ng=4)
    atm_f = atm_atmmod(np.concatenate([np.arange(0, 3.0, 0.3),
                                       np.arange(3.0, 20.1, 1.0)]))
    ab_f = abs_synthetic(650.0, atm_f, ng=4)
    cld = cld_les(fn)
    aer = aer_les(fn, ssa=0.7, asy=0.6, ext_scale=0.3)
    res = solver.solve(atm=atm_f, abs_coef=ab_f, cld=cld, aer_3ds=[aer],
                       surface=0.1, target='radiance', photons=20000,
                       n_run=1, batch=1 << 12, seed=6)
    assert np.all(np.isfinite(res['rad'])) and res['rad'].mean() > 0
