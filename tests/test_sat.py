"""Satellite-layer tests with synthetic granules.

Real DAAC granules require network access (zero-egress here); these tests
exercise the reader machinery against small synthetic files in the product
formats (HDF5 for VIIRS/OCO-2) plus the offline geoMeta search, and run a
full satellite-driven pipeline: reader -> cld_sat -> 3D radiance sim (the
shape of projects/01-02 in the reference).
"""

import datetime
import os

import h5py
import numpy as np
import pytest

from er3t_tpu.sat import daac
from er3t_tpu.sat.oco2 import oco2_std, photon_to_radiance
from er3t_tpu.sat.viirs import viirs_cldprop_l2
from er3t_tpu.pre.cld import cld_sat
from er3t_tpu.util.ncio import read_var


@pytest.fixture()
def viirs_file(tmp_path):
    fname = os.path.join(tmp_path, 'CLDPROP_L2_VIIRS.nc')
    ny, nx = 40, 30
    lon, lat = np.meshgrid(np.linspace(-60.5, -59.5, nx),
                           np.linspace(14.5, 15.5, ny))
    cot = np.zeros((ny, nx), np.int16)
    cot[10:20, 5:15] = 1500   # scaled by 0.01 -> COT 15
    cer = np.full((ny, nx), 1200, np.int16)  # 0.01 -> 12 um
    with h5py.File(fname, 'w') as f:
        g = f.create_group('geolocation_data')
        g.create_dataset('longitude', data=lon.astype(np.float32))
        g.create_dataset('latitude', data=lat.astype(np.float32))
        gp = f.create_group('geophysical_data')
        for name, arr in (('Cloud_Optical_Thickness', cot),
                          ('Cloud_Effective_Radius', cer)):
            d = gp.create_dataset(name, data=arr)
            d.attrs['scale_factor'] = 0.01
            d.attrs['add_offset'] = 0.0
            d.attrs['_FillValue'] = np.int16(-999)
    return fname


def test_viirs_reader_and_gridding(viirs_file):
    obj = viirs_cldprop_l2([viirs_file], extent=(-60.5, -59.5, 14.5, 15.5),
                           nx=30, ny=40)
    assert obj.data['cot_2d']['data'].shape == (30, 40)
    assert obj.data['cot_2d']['data'].max() == pytest.approx(15.0, rel=0.01)
    assert obj.data['cer_2d']['data'].max() == pytest.approx(12.0, rel=0.01)


def test_satellite_pipeline_radiance(viirs_file):
    """reader -> cld_sat -> 3D nadir radiance (projects/02 shape)."""
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm import solver

    obj = viirs_cldprop_l2([viirs_file], extent=(-60.5, -59.5, 14.5, 15.5),
                           nx=16, ny=16)
    cld = cld_sat(obj, dx=0.25, dy=0.25, cth=2.0, cgt=1.0, dz=0.5)
    assert cld.cot_2d.max() > 10.0
    atm = atm_atmmod(np.concatenate([np.arange(0, 3.0, 0.5),
                                     np.arange(3.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm)
    pha = pha_mie_wc(650.0, n_quad=16)
    res = solver.solve(atm=atm, abs_coef=ab, cld=cld, pha=pha, surface=0.03,
                       target='radiance', photons=60000, n_run=1,
                       batch=1 << 12, forward_trunc_deg=5.0)
    rad = res['rad']
    assert rad.shape == (16, 16)
    assert np.isfinite(rad).all()
    # cloudy pixels brighter than clear ones
    cloudy = cld.cloud_mask_2d
    assert rad[cloudy].mean() > 2.0 * rad[~cloudy].mean()


def test_oco2_reader(tmp_path):
    fname = os.path.join(tmp_path, 'oco2_std.h5')
    with h5py.File(fname, 'w') as f:
        f['RetrievalGeometry/retrieval_longitude'] = np.array([-60.1, -60.2])
        f['RetrievalGeometry/retrieval_latitude'] = np.array([15.0, 15.1])
        f['RetrievalResults/xco2'] = np.array([405e-6, 406e-6])
    obj = oco2_std([fname])
    assert obj.data['xco2']['data'] == pytest.approx([405.0, 406.0])


def test_photon_radiance_conversion():
    # 1e18 ph/s/m2/sr/um at 765 nm: E_ph = 2.60e-19 J -> 0.26 W/m2/sr/um
    # = 2.60e-4 W/m2/sr/nm
    v = photon_to_radiance(1e18, 765.0)
    assert v == pytest.approx(2.6e-4, rel=0.01)


def test_geometa_search_offline():
    text = (
        '# GranuleID,StartDateTime,ArchiveSet,OrbitNumber,DayNightFlag,'
        'EastBoundingCoord,NorthBoundingCoord,SouthBoundingCoord,'
        'WestBoundingCoord,GRingLongitude1,GRingLongitude2,GRingLongitude3,'
        'GRingLongitude4,GRingLatitude1,GRingLatitude2,GRingLatitude3,'
        'GRingLatitude4\n'
        'MYD03.A2019237.1755.061.h5,2019-08-25 17:55,61,1,D,'
        '-55,20,10,-65,-65,-55,-55,-65,10,10,20,20\n'
        'MYD03.A2019237.1800.061.h5,2019-08-25 18:00,61,1,D,'
        '0,60,50,-10,-10,0,0,-10,50,50,60,60\n')
    hits = daac.find_granules('MYD03', datetime.date(2019, 8, 25),
                              lon=-60.0, lat=15.0, geometa_text=text)
    assert len(hits) == 1
    assert hits[0]['granule'].endswith('1755.061.h5')


def test_granule_and_worldview_urls():
    url = daac.granule_url('MOD06_L2', datetime.date(2019, 8, 25), 'g.hdf')
    assert '/61/MOD06_L2/2019/237/g.hdf' in url
    wv = daac.worldview_image_url(datetime.date(2019, 8, 25),
                                  (-61, -59, 14, 16))
    assert 'GetSnapshot' in wv and '2019-08-25' in wv


def test_ncio_scaling(tmp_path):
    fname = os.path.join(tmp_path, 'scaled.h5')
    with h5py.File(fname, 'w') as f:
        d = f.create_dataset('v', data=np.array([100, 200, -999], np.int16))
        d.attrs['scale_factor'] = 0.1
        d.attrs['_FillValue'] = np.int16(-999)
    v = read_var(fname, 'v')
    assert v[0] == pytest.approx(10.0)
    assert np.isnan(v[2])
