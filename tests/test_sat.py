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


@pytest.fixture()
def viirs_file_full(tmp_path):
    """Full-SDS CLDPROP granule: COP + PCL + uncertainties + Cloud_Mask +
    Quality_Assurance bytes (synthetic; exercises the reference read_cop/
    read_mask paths, viirs.py:476-919)."""
    fname = os.path.join(tmp_path, 'CLDPROP_L2_VIIRS_full.nc')
    ny, nx = 20, 16
    lon, lat = np.meshgrid(np.linspace(-60.5, -59.5, nx),
                           np.linspace(14.5, 15.5, ny))
    i16 = lambda a: np.asarray(a, np.int16)
    cot = np.zeros((ny, nx)); cot[4:10, 4:10] = 15.0
    cer = np.where(cot > 0, 12.0, 0.0)
    cwp = np.where(cot > 0, 120.0, 0.0)
    # PCL-only pixel at (2, 2)
    cot_p = np.zeros((ny, nx)); cot_p[2, 2] = 5.0
    cer_p = np.zeros((ny, nx)); cer_p[2, 2] = 9.0
    cwp_p = np.zeros((ny, nx)); cwp_p[2, 2] = 30.0
    ctp = np.where(cot + cot_p > 0, 2, 1).astype(np.int16)   # water cloud
    cth = np.where(cot + cot_p > 0, 2500.0, 0.0)             # meters
    # cloud-mask byte 0 (MSB first): land_water(2) snow(1) glint(1)
    # day(1) fov(2) determined(1)
    b0 = np.full((ny, nx), 0b11001101, np.uint8)   # land, day, cloudy, det.
    qa0 = np.full((ny, nx), 0b01011110, np.uint8)
    qa1 = np.full((ny, nx), 0b10010011, np.uint8)
    with h5py.File(fname, 'w') as f:
        g = f.create_group('geolocation_data')
        g.create_dataset('longitude', data=lon.astype(np.float32))
        g.create_dataset('latitude', data=lat.astype(np.float32))
        gp = f.create_group('geophysical_data')
        for name, arr, sf in (
                ('Cloud_Optical_Thickness', i16(cot * 100), 0.01),
                ('Cloud_Effective_Radius', i16(cer * 100), 0.01),
                ('Cloud_Water_Path', i16(cwp), 1.0),
                ('Cloud_Optical_Thickness_PCL', i16(cot_p * 100), 0.01),
                ('Cloud_Effective_Radius_PCL', i16(cer_p * 100), 0.01),
                ('Cloud_Water_Path_PCL', i16(cwp_p), 1.0),
                ('Cloud_Optical_Thickness_Uncertainty', i16(cot * 100), 0.1),
                ('Cloud_Effective_Radius_Uncertainty', i16(cer * 100), 0.1),
                ('Cloud_Water_Path_Uncertainty', i16(cwp), 0.1),
                ('Cloud_Phase_Optical_Properties', ctp, 1.0),
                ('Cloud_Top_Height', i16(cth), 1.0)):
            d = gp.create_dataset(name, data=arr)
            d.attrs['scale_factor'] = sf
            d.attrs['add_offset'] = 0.0
            d.attrs['_FillValue'] = np.int16(-999)
        gp.create_dataset('Cloud_Mask', data=b0[..., None])
        gp.create_dataset('Quality_Assurance',
                          data=np.stack([qa0, qa1], axis=-1))
    return fname


@pytest.fixture()
def viirs03_file(tmp_path):
    """Synthetic VNP03MOD granule paired (same time pattern) with a CLDPROP
    one, for the f03-mask-reuse path (reference viirs.py:530-545)."""
    fname = os.path.join(tmp_path, 'VNP03MOD.A2019241.0942.nc')
    ny, nx = 20, 16
    lon, lat = np.meshgrid(np.linspace(-60.5, -59.5, nx),
                           np.linspace(14.5, 15.5, ny))
    with h5py.File(fname, 'w') as f:
        g = f.create_group('geolocation_data')
        g.create_dataset('longitude', data=lon.astype(np.float32))
        g.create_dataset('latitude', data=lat.astype(np.float32))
        for name, val in (('solar_zenith', 3000), ('solar_azimuth', 4500),
                          ('sensor_zenith', 1000), ('sensor_azimuth', -9000)):
            d = g.create_dataset(name, data=np.full((ny, nx), val, np.int16))
            d.attrs['scale_factor'] = 0.01
            d.attrs['add_offset'] = 0.0
        g.create_dataset('land_water_mask',
                         data=np.full((ny, nx), 3, np.uint8))
        d = g.create_dataset('height', data=np.full((ny, nx), 120, np.int16))
        d.attrs['scale_factor'] = 1.0
        d.attrs['add_offset'] = 0.0
    return fname


def test_viirs_03_reader(viirs03_file):
    """viirs_03: angle set, land/water mask, vnames extras, keep_dims
    retention + stored extent mask (reference viirs.py:96-271)."""
    from er3t_tpu.sat.viirs import viirs_03, get_fname_pattern

    ext = (-60.5, -60.0, 14.5, 15.5)     # left half of the granule
    obj = viirs_03([viirs03_file], extent=ext, vnames=('height',))
    assert obj.data['sza']['data'].shape[0] < 20 * 16   # masked to extent
    assert np.allclose(obj.data['sza']['data'], 30.0)
    assert np.allclose(obj.data['vaa']['data'], -90.0)
    assert np.all(obj.data['land_water_mask']['data'] == 3)
    assert np.allclose(obj.data['height']['data'], 120.0)

    obj2 = viirs_03([viirs03_file], extent=ext, keep_dims=True)
    assert obj2.data['lon']['data'].shape == (20, 16)   # 2-D retained
    mask = obj2.logic[get_fname_pattern(viirs03_file)]['mask']
    assert mask.shape == (20, 16)
    assert mask.sum() == obj.data['lon']['data'].size


def test_viirs_cldprop_f03_and_keep_dims(viirs03_file, tmp_path,
                                         viirs_file_full):
    """cldprop reuses the viirs_03 mask of the same granule pattern and
    keep_dims retains 2-D fields."""
    import shutil

    from er3t_tpu.sat.viirs import viirs_03

    # pair the full CLDPROP fixture under the same A2019241.0942 pattern
    l2 = os.path.join(tmp_path, 'CLDPROP_L2_VIIRS.A2019241.0942.nc')
    shutil.copy(viirs_file_full, l2)
    ext = (-60.5, -60.0, 14.5, 15.5)
    f03 = viirs_03([viirs03_file], extent=ext)
    obj = viirs_cldprop_l2([l2], f03=f03)          # no extent of its own
    n_sel = int(f03.logic['A2019241.0942']['mask'].sum())
    assert obj.data['cot']['data'].shape == (n_sel,)

    obj2 = viirs_cldprop_l2([l2], keep_dims=True)
    assert obj2.data['cot']['data'].shape == (20, 16)
    assert obj2.data['cwp']['data'].max() == pytest.approx(120.0, rel=0.01)
    obj3 = viirs_cldprop_l2([l2], maskvars=True, quality_assurance=2,
                            keep_dims=True)
    assert obj3.data['land_water_cat']['data'].shape == (20, 16)
    assert obj3.qa['bowtie_qa']['data'].shape == (20, 16)


def test_viirs_l1b_f03_alignment(viirs03_file, tmp_path):
    """viirs_l1b applies the paired viirs_03 extent mask to every band
    field so ref/rad stay aligned with the copied lon/lat (reference
    viirs.py:417-421)."""
    from er3t_tpu.sat.viirs import viirs_03, viirs_l1b

    ny, nx = 20, 16
    fn = os.path.join(tmp_path, 'VNP02MOD.A2019241.0942.nc')
    counts = np.arange(ny * nx, dtype=np.uint16).reshape(ny, nx)
    with h5py.File(fn, 'w') as f:
        g = f.create_group('observation_data')
        d = g.create_dataset('M05', data=counts)
        d.attrs['scale_factor'] = 1e-4
        d.attrs['add_offset'] = 0.0
        d.attrs['_FillValue'] = np.uint16(65535)
        d.attrs['radiance_scale_factor'] = 2e-4
        d.attrs['radiance_add_offset'] = 0.0
    ext = (-60.5, -60.0, 14.5, 15.5)
    f03 = viirs_03([viirs03_file], extent=ext)
    o = viirs_l1b([fn], f03=f03)
    n_sel = f03.data['lon']['data'].size
    assert o.data['ref']['data'].shape == (n_sel,)     # masked like lon/lat
    assert o.data['rad']['data'].shape == (n_sel,)
    assert o.data['lon']['data'].size == n_sel
    # values correspond to the masked pixels, in mask order
    mask = f03.logic['A2019241.0942']['mask']
    np.testing.assert_allclose(o.data['ref']['data'],
                               counts[mask] * 1e-4, rtol=1e-6)
    # keep_dims retains the full 2-D granule
    o2 = viirs_l1b([fn], f03=f03, keep_dims=True)
    assert o2.data['ref']['data'].shape == (ny * nx,) \
        or o2.data['ref']['data'].size == ny * nx


def test_viirs_cldprop_full_sds(viirs_file_full):
    """Full COP depth: cth/cwp/uncertainties + PCL fill-in flagged."""
    obj = viirs_cldprop_l2([viirs_file_full])
    d = obj.data
    assert d['cwp']['data'].max() == pytest.approx(120.0, rel=0.01)
    assert d['cth']['data'].max() == pytest.approx(2.5, rel=0.01)   # km
    # PCL pixel filled in and flagged
    pcl = d['pcl']['data']
    assert pcl.sum() == 1
    assert d['cot']['data'][pcl == 1] == pytest.approx(5.0, rel=0.01)
    assert d['cwp']['data'][pcl == 1] == pytest.approx(30.0, rel=0.01)
    # uncertainties are absolute (value * percent / 100)
    cu = d['cot_uct']['data']
    assert cu.max() == pytest.approx(15.0 * (15.0 * 10) / 100.0, rel=0.02)


def test_viirs_cldprop_mask_and_qa(viirs_file_full):
    """Cloud_Mask byte-0 decode + QA byte 0/1 decode (reference
    extract_data / quality_assurance_byte0/1, viirs.py:549-620)."""
    obj = viirs_cldprop_l2([viirs_file_full], maskvars=True,
                           quality_assurance=2)
    d = obj.data
    # 0b11001101: land_water=3, snow=0, glint=0, day=1, fov=2, det=1
    assert np.all(d['land_water_cat']['data'] == 3)
    assert np.all(d['snow_ice_flag']['data'] == 0)
    assert np.all(d['sunglint_flag']['data'] == 0)
    assert np.all(d['day_night_flag']['data'] == 1)
    assert np.all(d['fov_qa_cat']['data'] == 2)
    assert np.all(d['cloud_mask_flag']['data'] == 1)
    # qa0 = 0b01011110: ret_1621=0, conf=2, data=1, ret_std=1, conf=3, dat=0
    assert np.all(obj.qa['ret_1621_qa']['data'] == 0)
    assert np.all(obj.qa['ret_1621_conf_qa']['data'] == 2)
    assert np.all(obj.qa['ret_1621_data_qa']['data'] == 1)
    assert np.all(obj.qa['ret_std_qa']['data'] == 1)
    assert np.all(obj.qa['ret_std_conf_qa']['data'] == 3)
    assert np.all(obj.qa['ret_std_data_qa']['data'] == 0)
    # qa1 = 0b10010011: bowtie=1, cot_oob=0, bands=0b01=1, rayleigh=0,
    # cld_type=0b011=3
    assert np.all(obj.qa['bowtie_qa']['data'] == 1)
    assert np.all(obj.qa['cot_oob_qa']['data'] == 0)
    assert np.all(obj.qa['cot_bands_qa']['data'] == 1)
    assert np.all(obj.qa['rayleigh_qa']['data'] == 0)
    assert np.all(obj.qa['cld_type_qa']['data'] == 3)


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


def test_sinusoidal_grid_tags():
    """Known tile lookups: Boulder CO is in h09v04; 0N0E is h18v08/h17v08
    boundary region (reference get_sinusoidal_grid_tag, modis.py:2998)."""
    from er3t_tpu.sat.modis import get_sinusoidal_grid_tag, cal_sinusoidal_grid
    assert get_sinusoidal_grid_tag([-105.2], [40.1]) == ['h09v04']
    tags = get_sinusoidal_grid_tag([0.1], [0.1])
    assert 'h18v08' in tags
    gx, gy = cal_sinusoidal_grid()
    assert gx.size == 37 and gy.size == 19 and gy[0] > gy[-1]


def test_upscale_modis_lonlat():
    """5km->1km geolocation upscaling preserves a linear field and extends
    by the documented offsets."""
    import numpy as np
    from er3t_tpu.sat.modis import upscale_modis_lonlat
    ny, nx = 8, 10
    lat0, lon0 = np.meshgrid(np.linspace(10, 11.4, ny),
                             np.linspace(-40, -38.2, nx), indexing='ij')
    lon, lat = upscale_modis_lonlat(lon0.copy(), lat0, scale=5,
                                    extra_grid=True)
    # the MOD05/06 extension is +4 ALONG-SCAN columns, never rows
    # (reference XX = np.arange(x+4)): (406, 270) 5-km geolocation must
    # upscale to the (2030, 1354) 1-km grid
    assert lon.shape == (ny * 5, nx * 5 + 4)
    # linear field: interior values match analytic expectation
    # output row 7 maps exactly onto input row 1 ((7 - 2)/5 = 1), and
    # output column 7 onto input column 1 (along-scan offset is also 2)
    assert lat[7, 0] == pytest.approx(lat0[1, 0], abs=1e-9)
    assert lon[0, 7] == pytest.approx(lon0[0, 1], abs=1e-9)
    assert np.all(np.diff(lat[:, 0]) > 0)
    assert np.all(np.diff(lon[0, :]) > 0)


def test_daac_url_builders():
    """LANCE / NSIDC / OCO-2 archive URL construction (offline)."""
    import datetime
    from er3t_tpu.sat.daac import lance_url, nsidc_url, oco2_url
    d = datetime.date(2019, 9, 2)
    u = lance_url(d, '61/MYD06_L2', 'MYD06_L2.A2019245.0400.061.nrt.hdf')
    assert u == ('https://nrt3.modaps.eosdis.nasa.gov/archives/allData/'
                 '61/MYD06_L2/2019/245/MYD06_L2.A2019245.0400.061.nrt.hdf')
    u = nsidc_url(d, 'MYD29', '61', 'MYD29.A2019245.0400.061.h5')
    assert '/MOSA/MYD29.061/2019.09.02/' in u
    u = oco2_url(datetime.datetime(2019, 9, 2, 4), 'OCO2_L2_Standard.11r',
                 'oco2_L2StdND_27502a.h5')
    assert u.endswith('/OCO2_DATA/OCO2_L2_Standard.11r/2019/245/'
                      'oco2_L2StdND_27502a.h5')


def test_final_file_check(tmp_path):
    import h5py
    import numpy as np
    from er3t_tpu.sat.daac import final_file_check
    good = tmp_path / 'good.h5'
    with h5py.File(good, 'w') as f:
        f['x'] = np.arange(3)
    assert final_file_check(str(good))
    bad = tmp_path / 'bad.h5'
    bad.write_bytes(b'not an hdf5 file')
    assert not final_file_check(str(bad))
    assert not final_file_check(str(tmp_path / 'missing.h5'))


def test_modis_07_reader(tmp_path):
    """MOD07 profile reader on a synthetic HDF5 granule."""
    import h5py
    import numpy as np
    from er3t_tpu.sat.modis import modis_07
    fn = tmp_path / 'MYD07_L2.A2019245.h5'
    ny, nx, nlev = 6, 5, 20
    with h5py.File(fn, 'w') as f:
        f['Longitude'] = np.full((ny, nx), -59.9)
        f['Latitude'] = np.full((ny, nx), 15.1)
        f['Pressure_Levels'] = np.linspace(5, 1000, nlev)
        f['Retrieved_Temperature_Profile'] = \
            np.linspace(200, 290, nlev)[:, None, None] * np.ones((1, ny, nx))
        f['Surface_Pressure'] = np.full((ny, nx), 1013.0)
        f['Solar_Zenith'] = np.full((ny, nx), 30.0)
    obj = modis_07(fnames=[str(fn)], extent=(-60.5, -59.5, 14.5, 15.5))
    assert obj.data['T_level_retrieved']['data'].shape == (ny * nx, nlev)
    assert obj.data['p_level']['data'].size == nlev
    assert obj.data['p_sfc']['data'][0] == 1013.0


def test_geodesic_vincenty():
    """WGS84 Vincenty vs published values (Flinders Peak - Buninyong) and
    direct/inverse roundtrip."""
    import numpy as np
    from er3t_tpu.util.geo import cal_geodesic_dist, cal_geodesic_lonlat
    d = cal_geodesic_dist([144.424868], [-37.951033],
                          [143.926496], [-37.652821])
    assert d[0] == pytest.approx(54972.2, abs=1.0)
    assert cal_geodesic_dist([0], [0], [0], [1])[0] == \
        pytest.approx(110574.39, abs=0.1)
    lon1, lat1 = cal_geodesic_lonlat([12.3], [45.6], [250000], [37.0])
    back = cal_geodesic_dist([12.3], [45.6], lon1, lat1)
    assert back[0] == pytest.approx(250000.0, abs=0.01)


def test_viirs_tile_products(tmp_path):
    """VNP09A1 / 43MA3 / 43MA4 tile readers on synthetic granules with
    analytic sinusoidal-tile geolocation."""
    import h5py
    import numpy as np
    from er3t_tpu.sat.viirs import (viirs_09a1, viirs_43ma3, viirs_43ma4,
                                    get_fname_pattern)
    n = 24
    f1 = tmp_path / 'VNP09A1.A2019241.h09v05.002.h5'
    with h5py.File(f1, 'w') as f:
        f['SurfReflect_M4'] = np.full((n, n), 0.23)
    o = viirs_09a1([str(f1)], band='M4')
    assert o.data['ref']['data'].shape == (n, n)
    np.testing.assert_allclose(o.data['ref']['data'], 0.23)
    # h09v05: lon in [-100.8.., -70..], lat in [30, 40)
    assert 29.5 <= o.data['lat']['data'].min() <= 30.5
    assert o.data['lat']['data'].max() < 40.01
    # orientation: HDF-EOS tiles are (YDim, XDim) — lat varies along
    # axis 0 (descending, rows run N->S), lon along axis 1 (ascending)
    lat2, lon2 = o.data['lat']['data'], o.data['lon']['data']
    assert np.all(np.diff(lat2[:, 0]) < 0)
    assert np.allclose(lat2[0, :], lat2[0, 0])
    assert np.all(np.diff(lon2[0, :]) > 0)

    f2 = tmp_path / 'VNP43MA3.A2019241.h09v05.002.h5'
    with h5py.File(f2, 'w') as f:
        f['Albedo_BSA_M4'] = np.full((n, n), 0.11)
        f['Albedo_WSA_M4'] = np.full((n, n), 0.14)
    o = viirs_43ma3([str(f2)], channels=('M4',))
    np.testing.assert_allclose(o.data['wsa']['data'][..., 0], 0.14)
    np.testing.assert_allclose(o.data['alb_2d']['data'], 0.14)

    f3 = tmp_path / 'VNP43MA4.A2019241.h09v05.002.h5'
    with h5py.File(f3, 'w') as f:
        f['Nadir_Reflectance_M4'] = np.full((n, n), 0.19)
    o = viirs_43ma4([str(f3)], channels=('M4',))
    np.testing.assert_allclose(o.data['ref']['data'][..., 0], 0.19)

    assert get_fname_pattern('x/VNP09A1.A2019241.h09v05.002.h5') == \
        'A2019241.h09v05'


def test_calipso_vfm_machinery(tmp_path):
    """VFM block decode layout, type extraction, regrid, and reader on a
    synthetic granule."""
    import datetime
    import h5py
    import numpy as np
    from er3t_tpu.sat.calipso import (cmr_vfm_search_url, vfm_row2block,
                                      vfm_altitude, extract_type,
                                      read_calipso_vfm)
    url = cmr_vfm_search_url(datetime.date(2019, 8, 1), (-60, -59, 14, 15))
    assert 'C2667982867-LARC_ASDC' in url and 'boundingBox=-60.00' in url

    row = np.arange(5515, dtype=np.uint16)
    blk = vfm_row2block(row)
    assert blk.shape == (545, 15)
    # high-altitude profile 0 replicated across the first 5 columns
    assert np.all(blk[:55, 0] == blk[:55, 4])
    assert np.all(blk[:55, 0] == row[:55])
    # low-altitude block at native resolution
    off = 3 * 55 + 5 * 200
    assert np.all(blk[255:, 3] == row[off + 3 * 290: off + 4 * 290])
    alt = vfm_altitude()
    assert alt.size == 545 and alt[0] > 29.9 and alt[-1] < -0.4
    assert extract_type(np.array([2 + 8, 5 + 64])).tolist() == [2, 5]

    fn = tmp_path / 'CAL_LID_L2_VFM.h5'
    nrec = 4
    with h5py.File(fn, 'w') as f:
        f['Longitude'] = np.linspace(-59.9, -59.1, nrec)[:, None]
        f['Latitude'] = np.linspace(14.1, 14.9, nrec)[:, None]
        fcf = np.ones((nrec, 5515), np.uint16) * 2   # all cloud
        f['Feature_Classification_Flags'] = fcf
    out = read_calipso_vfm(str(fn), extent=(-60, -59, 14, 15))
    assert out['feature_type']['data'].shape[1] == nrec * 15
    assert np.all(out['feature_type']['data'] == 2)


# ---------------------------------------------------------------------------
# DAAC depth (round 2): full catalog, dateline-safe swath search, swath
# grids, retry/validation, worldview time-stamping
# ---------------------------------------------------------------------------

GEOMETA = """# GranuleID,StartDateTime,ArchiveSet,OrbitNumber,DayNightFlag,EastBoundingCoord,NorthBoundingCoord,SouthBoundingCoord,WestBoundingCoord,GRingLongitude1,GRingLongitude2,GRingLongitude3,GRingLongitude4,GRingLatitude1,GRingLatitude2,GRingLatitude3,GRingLatitude4
MYD06_L2.A2019237.1830.061.x.hdf,2019-08-25 18:30,61,1,D,-55,20,10,-65,-65,-55,-56,-66,12,10,20,18
MYD06_L2.A2019237.1835.061.x.hdf,2019-08-25 18:35,61,1,N,-55,40,30,-65,-65,-55,-56,-66,32,30,40,38
MYD06_L2.A2019237.0200.061.x.hdf,2019-08-25 02:00,61,1,D,-170,10,-10,175,175,-170,-168,173,-5,-8,8,5
"""


def test_daac_catalog_breadth():
    from er3t_tpu.sat import daac
    assert len(daac.SAT_TAGS) >= 44
    for tag, meta in daac.SAT_TAGS.items():
        for key in ('dataset_tag', 'dict_key', 'description', 'satellite',
                    'instrument', 'website', 'daac', 'archive', 'sat'):
            assert key in meta, (tag, key)
    # reference parity spot checks (er3t/common.py catalog)
    assert daac.SAT_TAGS['VNP_CLDPROP_L2']['dataset_tag'] == \
        '5111/CLDPROP_L2_VIIRS_SNPP'
    assert daac.SAT_TAGS['MYD_CLDMSK_L2']['dataset_tag'] == \
        '5110/CLDMSK_L2_MODIS_Aqua'
    assert daac.SAT_TAGS['oco2_L2StdND']['daac'] == 'gesdisc'


def test_daac_find_granules_offline():
    from er3t_tpu.sat import daac
    import datetime
    d = datetime.date(2019, 8, 25)
    hits = daac.find_granules('MYD06_L2', d, -60.0, 15.0,
                              geometa_text=GEOMETA)
    assert [h['granule'] for h in hits] == ['MYD06_L2.A2019237.1830.061.x.hdf']
    # night granule excluded by default, included with day_only=False
    hits_n = daac.find_granules('MYD06_L2', d, -60.0, 35.0,
                                geometa_text=GEOMETA, day_only=False)
    assert len(hits_n) == 1 and hits_n[0]['day_night'] == 'N'


def test_daac_dateline_swath():
    """Swath straddling +-180: both sides of the dateline match."""
    from er3t_tpu.sat import daac
    import datetime
    d = datetime.date(2019, 8, 25)
    for lon in (178.0, -178.0):
        hits = daac.find_granules('MYD06_L2', d, lon, 0.0,
                                  geometa_text=GEOMETA)
        assert len(hits) == 1, lon
    assert not daac.find_granules('MYD06_L2', d, 150.0, 0.0,
                                  geometa_text=GEOMETA)


def test_daac_granules_over_extent():
    from er3t_tpu.sat import daac
    import datetime
    d = datetime.date(2019, 8, 25)
    recs = daac.granules_over_extent('MYD06_L2', d, (-62, -58, 12, 16),
                                     geometa_text=GEOMETA)
    assert len(recs) == 1 and recs[0]['coverage'] > 0.5
    recs2 = daac.granules_over_extent('MYD06_L2', d, (-62, -58, 17.5, 21),
                                      geometa_text=GEOMETA)
    assert recs2 and 0.0 < recs2[0]['coverage'] < 1.0


def test_daac_swath_lonlat_utc():
    from er3t_tpu.sat import daac
    import datetime
    rec = daac.find_granules('MYD06_L2', datetime.date(2019, 8, 25),
                             -60.0, 15.0, geometa_text=GEOMETA)[0]
    lon, lat, utc = daac.swath_lonlat_utc(rec, nx=16, ny=16)
    assert lon.shape == lat.shape == utc.shape == (16, 16)
    assert lon.min() >= -66 and lon.max() <= -55
    assert 10 <= lat.min() and lat.max() <= 20
    np.testing.assert_allclose(utc[:, 0], 18.5)          # StartDateTime
    assert np.all(np.diff(utc[0]) > 0)                   # advances along track


def test_download_retry_and_validation(tmp_path):
    """Flaky-server download succeeds on a later attempt; a persistently
    short payload raises after the retry budget."""
    from er3t_tpu.sat import daac
    calls = {'n': 0}

    def flaky(url, headers):
        calls['n'] += 1
        if calls['n'] < 3:
            raise IOError('connection reset')
        return [b'x' * 4096]

    out = daac.download_url('https://example.invalid/fake.bin',
                            str(tmp_path), min_size=1024, retries=3,
                            backoff=0.0, _get=flaky)
    assert calls['n'] == 3 and out.endswith('fake.bin')

    def short(url, headers):
        return [b'tiny']

    with pytest.raises(IOError, match='after 2 attempts'):
        daac.download_url('https://example.invalid/fake2.bin',
                          str(tmp_path), min_size=1024, retries=2,
                          backoff=0.0, _get=short)


def test_worldview_stamped_download(tmp_path):
    from er3t_tpu.sat import daac
    import datetime
    dt = datetime.datetime(2019, 8, 25, 18, 30)
    url, fname = daac.download_worldview_image(
        dt, (-61.0, -59.0, 14.0, 16.0), product='MYDRGB',
        fdir_out=str(tmp_path), run=False)
    assert 'MODIS_Aqua_CorrectedReflectance' in url and '2019-08-25' in url
    assert 'MYDRGB_2019-08-25-1830Z_' in fname
    url2, fname2 = daac.download_worldview_image(
        dt, (-61.0, -59.0, 14.0, 16.0), product='MYDRGB',
        fdir_out=str(tmp_path), _get=lambda u, h: [b'p' * 256])
    import os
    assert os.path.isfile(fname2) and os.path.getsize(fname2) == 256


def _make_ahi_nc(fname, nx=12, ny=10):
    import h5py
    with h5py.File(fname, 'w') as f:
        f['longitude'] = np.linspace(120.0, 125.0, nx)
        f['latitude'] = np.linspace(10.0, 14.0, ny)
        cot = np.zeros((ny, nx))
        cot[3:6, 4:8] = 12.0
        f['CLOT'] = cot
        f['CLER_23'] = np.where(cot > 0, 11.0, 0.0)
        f['CLTH'] = np.where(cot > 0, 2.5, 0.0)


def test_ahi_reader_synthetic(tmp_path):
    """AHI reader against a synthetic granule (the reference's project 03
    flux-along-track driver consumes this contract, er3t/util/ahi.py)."""
    from er3t_tpu.sat.ahi import ahi_l2
    fn = str(tmp_path / 'ahi.nc')
    _make_ahi_nc(fn)
    a = ahi_l2([fn], extent=(121.0, 124.0, 10.5, 13.5), nx=8, ny=8)
    assert a.data['cot']['data'].max() == 12.0
    assert a.data['cot_2d']['data'].shape == (8, 8)
    assert a.data['cot_2d']['data'].max() > 0
    # extra variables through read_vars (reference ahi.py:155-170)
    a.read_vars(['CLTH'])
    assert 'clth' in a.data and a.data['clth']['data'].max() == 2.5
    # and the gridded cloud feeds cld_sat end-to-end
    from er3t_tpu.pre.cld import cld_sat
    cld = cld_sat(a, cth=2.5, cgt=1.0)
    assert cld.extinction.max() > 0


# ---------------- MODIS L1B (QKM/HKM/1KM band logic) ----------------

def _write_l1b_1km(fname):
    """Synthetic MYD021KM-like granule (HDF5 stands in for HDF4; the reader
    dispatches on content via ncio.open_any)."""
    ny, nx = 8, 10
    with h5py.File(fname, 'w') as f:
        f.create_dataset('Band_250M', data=np.array([1, 2]))
        f.create_dataset('Band_500M', data=np.array([3, 4, 5, 6, 7]))
        f.create_dataset('Band_1KM_RefSB',
                         data=np.array([8, 9, 10, 11, 12, 13, 14, 15, 16,
                                        17, 18, 19, 26]))
        f.create_dataset('Band_1KM_Emissive',
                         data=np.array([20, 21, 22, 23, 24, 25, 27, 28, 29,
                                        30, 31, 32, 33, 34, 35, 36]))

        def ev(name, nb, base):
            raw = np.full((nb, ny, nx), 1000.0) + \
                np.arange(nb)[:, None, None] * 100.0
            raw[:, 0, 0] = 65534.0          # a fill pixel
            d = f.create_dataset(name, data=raw)
            d.attrs['radiance_scales'] = np.full(nb, 0.01) * base
            d.attrs['radiance_offsets'] = np.full(nb, 100.0)
            d.attrs['reflectance_scales'] = np.full(nb, 1e-5) * base
            d.attrs['reflectance_offsets'] = np.full(nb, 50.0)
            d.attrs['corrected_counts_scales'] = np.full(nb, 1.0)
            d.attrs['corrected_counts_offsets'] = np.full(nb, 0.0)
            u = f.create_dataset(name + '_Uncert_Indexes',
                                 data=np.full((nb, ny, nx), 5.0))
            u.attrs['specified_uncertainty'] = np.full(nb, 1.5)
            u.attrs['scaling_factor'] = np.full(nb, 7.0)

        ev('EV_250_Aggr1km_RefSB', 2, 1.0)
        ev('EV_500_Aggr1km_RefSB', 5, 1.0)
        ev('EV_1KM_RefSB', 13, 1.0)
        ev('EV_1KM_Emissive', 16, 2.0)
    return fname


def test_modis_l1b_1km_emissive(tmp_path):
    """modis_l1b(band=31) returns radiance on a synthetic 1KM granule
    (emissive bands: radiance only, reflectance NaN) with uncertainties."""
    from er3t_tpu.sat.modis import modis_l1b
    fn = _write_l1b_1km(str(tmp_path / 'MYD021KM.A2019226.h5'))
    obj = modis_l1b([fn], band=31)
    # band 31 is index 10 of the emissive group: raw 1000 + 10*100 = 2000
    rad = obj.data['rad']['data'].reshape(8, 10)
    assert rad[1, 1] == pytest.approx((2000.0 - 100.0) * 0.02 / 1000.0)
    assert np.isnan(rad[0, 0])                    # fill pixel
    assert np.isnan(obj.data['ref']['data']).all()   # emissive: no ref
    uct = obj.data['uct']['data'].reshape(8, 10)
    assert uct[1, 1] == pytest.approx(1.5 * np.exp(5.0 / 7.0))
    assert obj.data['wvl']['data'] == 11030.0


def test_modis_l1b_multiband_mixed(tmp_path):
    """Multiple bands across aggregation groups stack in request order."""
    from er3t_tpu.sat.modis import modis_l1b
    fn = _write_l1b_1km(str(tmp_path / 'MYD021KM.A2019226.h5'))
    obj = modis_l1b([fn], bands=[1, 6, 26, 31])
    rad = obj.data['rad']['data']
    assert rad.shape == (4, 80)
    # band 1: group idx 0 raw 1000; band 6: 500-group idx 3 raw 1300;
    # band 26: RefSB idx 12 raw 2200; band 31: emissive idx 10 raw 2000 x2
    assert rad[0, 11] == pytest.approx((1000 - 100) * 0.01 / 1000)
    assert rad[1, 11] == pytest.approx((1300 - 100) * 0.01 / 1000)
    assert rad[2, 11] == pytest.approx((2200 - 100) * 0.01 / 1000)
    assert rad[3, 11] == pytest.approx((2000 - 100) * 0.02 / 1000)
    # reflective bands carry reflectance and corrected counts
    assert np.isfinite(obj.data['ref']['data'][0, 11])
    assert obj.data['cnt']['data'][0, 11] == pytest.approx(1000.0)
    assert np.isnan(obj.data['ref']['data'][3, 11])
    np.testing.assert_allclose(obj.data['wvl']['data'],
                               [650.0, 1640.0, 1380.0, 11030.0])


def test_modis_l1b_band_validation(tmp_path):
    from er3t_tpu.sat.modis import modis_l1b
    fn = _write_l1b_1km(str(tmp_path / 'MYD02QKM.A2019226.h5'))
    with pytest.raises(KeyError):
        modis_l1b([fn], band=31)      # emissive not in the QKM product
    with pytest.raises(ValueError):
        modis_l1b([str(tmp_path / 'MYD02XYZ.A2019226.h5')], band=1)


def test_modis_l2_qa_phase_pcl(tmp_path):
    """modis_l2 QA depth (reference modis.py:582-855): phase-0/negative
    retrievals reset to clear, PCL fill-in tags pixels, uncertainties
    converted from relative to absolute."""
    from er3t_tpu.sat.modis import modis_l2

    fname = str(tmp_path / 'MOD06_L2.synthetic.h5')
    n = 10
    lon = np.linspace(-60.0, -59.0, n)[None, :].repeat(n, axis=0)
    lat = np.linspace(10.0, 11.0, n)[:, None].repeat(n, axis=1)
    cot = np.full((n, n), 8.0)
    cer = np.full((n, n), 12.0)
    cwp = np.full((n, n), 50.0)
    ctp = np.full((n, n), 2, np.int16)          # liquid
    cot[0, 0] = -1.0                            # invalid -> clear
    ctp[0, 1] = 0                               # undetermined -> clear
    cot[1, 0] = 0.0; cer[1, 0] = 0.0; cwp[1, 0] = 0.0; ctp[1, 0] = 1  # clear
    # a PCL-fill pixel: standard clear, PCL cloudy
    cot[2, 2] = 0.0; cer[2, 2] = 0.0; cwp[2, 2] = 0.0
    cot_pcl = np.zeros((n, n)); cer_pcl = np.zeros((n, n))
    cwp_pcl = np.zeros((n, n))
    cot_pcl[2, 2] = 5.0; cer_pcl[2, 2] = 9.0; cwp_pcl[2, 2] = 30.0
    with h5py.File(fname, 'w') as f:
        f['Longitude'] = lon
        f['Latitude'] = lat
        f['Cloud_Optical_Thickness'] = cot
        f['Cloud_Effective_Radius'] = cer
        f['Cloud_Water_Path'] = cwp
        f['Cloud_Top_Height'] = np.full((n, n), 2000.0)
        f['Cloud_Phase_Optical_Properties'] = ctp
        f['Cloud_Optical_Thickness_PCL'] = cot_pcl
        f['Cloud_Effective_Radius_PCL'] = cer_pcl
        f['Cloud_Water_Path_PCL'] = cwp_pcl
        f['Cloud_Optical_Thickness_Uncertainty'] = np.full((n, n), 10.0)
        f['Cloud_Effective_Radius_Uncertainty'] = np.full((n, n), 5.0)
        f['Cloud_Water_Path_Uncertainty'] = np.full((n, n), 20.0)
        f['Extra_QA'] = np.arange(n * n, dtype=np.float32).reshape(n, n)
    m = modis_l2(fname, vnames=('Extra_QA',))
    d = {k: m.data[k]['data'].reshape(n, n) for k in
         ('cot', 'cer', 'cwp', 'pcl', 'cot_err', 'cer_err')}
    assert d['cot'][0, 0] == 0.0 and d['cer'][0, 0] == 0.0   # invalid reset
    assert d['cot'][0, 1] == 0.0                             # phase 0 reset
    assert d['cot'][1, 0] == 0.0 and d['pcl'][1, 0] == 0     # clear stays
    assert d['pcl'][2, 2] == 1                               # PCL fill-in
    assert d['cot'][2, 2] == 5.0 and d['cer'][2, 2] == 9.0
    assert d['cwp'][2, 2] == 30.0
    # absolute uncertainties: cot*err/100
    assert d['cot_err'][5, 5] == pytest.approx(8.0 * 10.0 / 100.0)
    assert d['cer_err'][5, 5] == pytest.approx(12.0 * 5.0 / 100.0)
    assert 'extra_qa' in m.data and m.data['extra_qa']['data'].size == n * n


def test_nsidc_oco2_downloaders_offline():
    """Full NSIDC/OCO-2 downloader logic (reference daac.py:1514,1629)
    driven offline through injected index pages: directory layout, tag /
    format / time-window filtering."""
    from er3t_tpu.sat.daac import (download_nsidc_https, download_oco2_https,
                                   list_remote_dir)

    html = '''<html><a href="../">up</a>
    <a href="MOD29.A2019237.0355.061.h5">x</a>
    <a href="MOD29.A2019237.0400.061.h5">x</a>
    <a href="MOD29.A2019237.0400.061.h5">dup</a>
    <a href="MOD29.A2019237.1200.061.h5">x</a>
    <a href="MOD29.A2019237.0400.061.h5.xml">meta</a>
    <a href="browse/">dir</a></html>'''
    names = list_remote_dir('http://x/', html_text=html)
    assert names == ['MOD29.A2019237.0355.061.h5',
                     'MOD29.A2019237.0400.061.h5',
                     'MOD29.A2019237.1200.061.h5',
                     'MOD29.A2019237.0400.061.h5.xml']

    d = datetime.date(2019, 8, 25)
    urls = download_nsidc_https(
        d, product_dict={'short_name': 'MOD29', 'version': '61'},
        filename_tags='A2019237', data_format='h5', run=False,
        start_dt_hhmm=datetime.datetime(2019, 8, 25, 3, 0),
        end_dt_hhmm=datetime.datetime(2019, 8, 25, 5, 0), html_text=html)
    assert len(urls) == 2                      # 0355 + 0400; 1200 excluded
    assert urls[0].startswith(
        'https://n5eil01u.ecs.nsidc.org/MOST/MOD29.061/2019.08.25/')

    html_oco = '''<a href="oco2_L2StdND_26301a_190806_B10004r.h5">x</a>
    <a href="oco2_L2StdND_26301a_190806_B10004r.h5.xml">m</a>'''
    dt = datetime.datetime(2019, 8, 6, 4, 0)
    u = download_oco2_https(dt, 'OCO2_L2_Standard.11r', run=False,
                            data_format='h5', html_text=html_oco)
    assert u == ['https://oco2.gesdisc.eosdis.nasa.gov/data/OCO2_DATA/'
                 'OCO2_L2_Standard.11r/2019/218/'
                 'oco2_L2StdND_26301a_190806_B10004r.h5']
    # Lite products: year-level directory
    u2 = download_oco2_https(dt, 'OCO2_L2_Lite_FP.11.1r', run=False,
                             html_text=html_oco)
    assert '/OCO2_L2_Lite_FP.11.1r/2019/oco2' in u2[0]
    with pytest.raises(ValueError, match='unsupported'):
        download_oco2_https(dt, 'OCO2_Bogus.1r', run=False, html_text=html_oco)


def test_modis_03_vnames_keepdims(tmp_path):
    """modis_03 read_vars + keep_dims conveniences (reference
    modis.py:91-250): extra SDSes land in self.data under lower-cased
    keys; keep_dims retains the 2-D granule with the mask on
    self.logic."""
    from er3t_tpu.sat.modis import modis_03
    fname = os.path.join(tmp_path, 'MOD03.h5')
    ny, nx = 10, 8
    lon, lat = np.meshgrid(np.linspace(-60.4, -59.6, nx),
                           np.linspace(14.6, 15.4, ny))
    with h5py.File(fname, 'w') as f:
        f.create_dataset('Longitude', data=lon.astype(np.float32))
        f.create_dataset('Latitude', data=lat.astype(np.float32))
        for k in ('SolarZenith', 'SolarAzimuth', 'SensorZenith',
                  'SensorAzimuth'):
            d = f.create_dataset(k, data=np.full((ny, nx), 3000, np.int16))
            d.attrs['scale_factor'] = 0.01
        f.create_dataset('Height', data=np.full((ny, nx), 123.0, np.float32))
    obj = modis_03([fname], extent=(-61, -59, 14, 16), vnames=['Height'])
    assert obj.data['height']['data'].shape == (ny * nx,)
    assert obj.data['height']['data'][0] == pytest.approx(123.0)
    assert obj.data['vza']['data'][0] == pytest.approx(30.0)
    obj2 = modis_03([fname], extent=(-61, -59, 14, 16), keep_dims=True)
    assert obj2.data['lon']['data'].shape == (ny, nx)
    assert obj2.logic[fname]['1km'].shape == (ny, nx)


def test_modis_l2_5km_geolocation_upscale(tmp_path):
    """MOD06-shape granule: 5-km geolocation with 1-km retrievals whose
    1-km grid is 4 ALONG-SCAN columns wider than 5x the 5-km grid
    ((406, 270) -> (2030, 1354) on real granules; scaled-down here).
    Regression for the upscale extending the wrong axis, which made every
    real MOD06 granule crash on the boolean-mask shape mismatch."""
    from er3t_tpu.sat.modis import modis_l2

    ny5, nx5 = 8, 10
    ny1, nx1 = ny5 * 5, nx5 * 5 + 4              # 40 x 54
    lat5, lon5 = np.meshgrid(np.linspace(10, 11.4, ny5),
                             np.linspace(-40, -38.2, nx5), indexing='ij')
    cot = np.full((ny1, nx1), 8.0)
    fname = str(tmp_path / 'MOD06_L2.5km.h5')
    with h5py.File(fname, 'w') as f:
        f['Longitude'] = lon5
        f['Latitude'] = lat5
        f['Cloud_Optical_Thickness'] = cot
        f['Cloud_Effective_Radius'] = np.full((ny1, nx1), 12.0)
        f['Cloud_Phase_Optical_Properties'] = np.full((ny1, nx1), 2,
                                                      np.int16)
    m = modis_l2(fname)
    assert m.data['cot']['data'].size == ny1 * nx1   # no crop mismatch
    assert m.data['lon']['data'].size == ny1 * nx1
    # upscaled geolocation stays near the 5-km envelope (the +4-column
    # extension extrapolates ~1.2 input cells = 0.24 deg past the edge)
    lon = m.data['lon']['data']
    assert lon.min() >= lon5.min() - 0.3 and lon.max() <= lon5.max() + 0.3


def test_download_modis_rgb_offline():
    """download_modis_rgb (reference modis.py:2650) builds the GIBS
    corrected-reflectance layer URL per satellite and honors run=False."""
    import datetime

    from er3t_tpu.sat.modis import download_modis_rgb

    fetched = {}

    def fake_get(url, headers):
        fetched['url'] = url
        yield b'x' * 256

    d = datetime.date(2019, 8, 25)
    ext = (-61.0, -59.0, 14.0, 16.0)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        fn = download_modis_rgb(d, ext, which='aqua', fdir=td, _get=fake_get)
        assert os.path.exists(fn) and 'aqua_rgb_2019-08-25' in fn
        assert 'MODIS_Aqua_CorrectedReflectance_TrueColor' in fetched['url']
        assert '2019-08-25' in fetched['url']
        fn2 = download_modis_rgb(d, ext, fdir=td, run=False)
        assert fn2.endswith('.png') and not os.path.exists(fn2)
    with pytest.raises(ValueError):
        download_modis_rgb(d, ext, which='suomi', run=False)


def test_ncio_cf_packing_convention(tmp_path):
    """netCDF/HDF5 variables are CF-packed (raw*scale + offset); HDF4
    uses (raw - offset)*scale.  A 150-offset temperature must come back
    as ~270 K, not -1.4 (regression: one convention was applied to all
    backends)."""
    from er3t_tpu.util.ncio import apply_scaling, open_any

    fn = os.path.join(tmp_path, 'cf.nc')
    with h5py.File(fn, 'w') as f:
        d = f.create_dataset('ctt', data=np.array([12000], np.int16))
        d.attrs['scale_factor'] = 0.01
        d.attrs['add_offset'] = 150.0
    f = open_any(fn)
    try:
        raw, attrs = f.var('ctt')
        val = apply_scaling(raw, attrs)
    finally:
        f.close()
    assert val[0] == pytest.approx(270.0)
    # untagged attrs keep the HDF4/MODIS convention
    assert apply_scaling(np.array([1000.0]),
                         {'scale_factor': 0.01, 'add_offset': 100.0}
                         )[0] == pytest.approx(9.0)
