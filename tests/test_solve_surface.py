"""The solve() front door exposes the full capability surface (the
reference's single namelist entry point, mcarats.py:62-231): camera sensors,
partial-3D, collision forcing, pathlength statistics, flux engines, tile
majorants, weight windows, and mesh routing to the dist layer."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.cld import cld_gen_hom
from er3t_tpu.rtm import solver
from er3t_tpu.dist.mesh import make_mesh


@pytest.fixture(scope='module')
def base():
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_synthetic(650.0, atm, ng=4)
    cld = cld_gen_hom(nx=8, ny=8, nz=2, dx=0.5, dy=0.5, cot0=6.0, cer0=10.0,
                      cloud_base=1.0, cloud_top=3.0)
    cld.extinction[4:] = 0.0
    return dict(atm=atm, abs_coef=ab, cld=cld, surface=0.1,
                solar_zenith_angle=30.0, photons=30000, n_run=1,
                batch=1 << 12, seed=3)


def test_solve_camera(base):
    res = solver.solve(sensor_type='camera',
                       camera=dict(zloc=0.0, the=0.0, qmax=80.0, npix=16),
                       **base)
    rad = res['rad']
    assert rad.shape == (16, 16)
    inside = np.isfinite(rad)
    assert inside.sum() > 100 and np.all(rad[inside] >= 0)


@pytest.mark.slow
def test_solve_p3d_limits(base):
    """Partial-3D column pinning: a pinning order no photon reaches is
    EXACTLY full 3D; low orders give a columnar approximation of the same
    magnitude (the approximation is scene-dependent — scatters concentrate
    in cloudy columns, so low-order pinning brightens broken-cloud scenes)."""
    kw = {**base, 'photons': 60000, 'target': 'radiance'}
    r3d = solver.solve(solver='3d', **kw)
    rhi = solver.solve(solver='p3d', p3d_order=500, **kw)
    rp1 = solver.solve(solver='p3d', p3d_order=1, **{**kw, 'seed': 5})
    m3, mh, mp = (float(r['rad'].mean()) for r in (r3d, rhi, rp1))
    assert mh == pytest.approx(m3, rel=0.03)
    assert 0.6 * m3 < mp < 1.6 * m3
    assert np.all(np.isfinite(rp1['rad']))


def test_solve_pathlength(base):
    res = solver.solve(pathlength=True, **base)
    plen = res['plen']
    assert plen.shape == res['rad'].shape
    # detected photons travelled at least the TOA->surface->TOA span scale
    assert 2.0e4 < np.median(plen[plen > 0]) < 3.0e5


def test_solve_forcing_tile_and_split(base):
    r0 = solver.solve(**base)
    r1 = solver.solve(cf_dtau=1.0, tile_size=4, split_wmax=0.5,
                      **{**base, 'seed': 9})
    assert float(r1['rad'].mean()) == pytest.approx(
        float(r0['rad'].mean()), rel=0.08)


def test_solve_flux_engines(base):
    kw = {**base, 'target': 'flux', 'flux_per_column': False,
          'photons': 60000}
    rf = solver.solve(flux_engine='flight', **kw)
    rm = solver.solve(flux_engine='marching', **{**kw, 'seed': 11})
    assert float(rf['f_down'][0, 0, 0]) == pytest.approx(
        float(rm['f_down'][0, 0, 0]), rel=0.06)


@pytest.mark.slow
def test_solve_mesh_routing(base):
    """mesh= routes to the dist layer: photon-parallel ('x'=1) and x-slab
    domain decomposition ('x'>1) both reproduce the single-device result."""
    r1 = solver.solve(**base)
    mesh_b = make_mesh(8, decomp=1)
    rb = solver.solve(mesh=mesh_b, **{**base, 'seed': 21})
    mesh_x = make_mesh(4, decomp=4)
    rx = solver.solve(mesh=mesh_x, **{**base, 'seed': 22})
    m1 = float(r1['rad'].mean())
    assert float(rb['rad'].mean()) == pytest.approx(m1, rel=0.07)
    assert float(rx['rad'].mean()) == pytest.approx(m1, rel=0.07)


@pytest.mark.slow
def test_solve_mesh_flux_decomp(base):
    """Flux + heating rate through the decomposed path via solve()."""
    mesh_x = make_mesh(4, decomp=4)
    kw = {**base, 'target': 'heating_rate', 'photons': 60000,
          'flux_per_column': False}
    r1 = solver.solve(**kw)
    rx = solver.solve(mesh=mesh_x, **{**kw, 'seed': 31})
    np.testing.assert_allclose(rx['f_down'][0, 0, -1], r1['f_down'][0, 0, -1],
                               rtol=0.03)
    assert rx['hr'].shape == r1['hr'].shape
    # cloud layers absorb: heating rate peaks inside the cloud (layers 1-2)
    assert np.all(np.isfinite(rx['hr']))
