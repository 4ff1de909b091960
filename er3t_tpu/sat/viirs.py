"""VIIRS granule readers (netCDF4/HDF5 — readable with h5py).

Capability parity with er3t/util/viirs.py: geolocation (VNP03),
L1B radiance (VNP02), cloud properties (CLDPROP_L2), surface reflectance
(VNP09).  Same ``data[key] = {'data', 'name', 'units'}`` contract as the
MODIS readers.
"""

from __future__ import annotations

import numpy as np

from ..util.grid import grid_by_extent
from ..util.ncio import apply_scaling, open_any

__all__ = ['viirs_03', 'viirs_l1b', 'viirs_cldprop_l2', 'viirs_09',
           'viirs_09a1', 'viirs_43ma3', 'viirs_43ma4',
           'viirs_mvcm_cldmsk_l2', 'get_fname_pattern']


def _entry(data, name, units='N/A'):
    return {'data': data, 'name': name, 'units': units}


def _subset(lon, lat, extent):
    if extent is None:
        return np.ones(lon.shape, dtype=bool)
    return ((lon >= extent[0]) & (lon <= extent[1]) &
            (lat >= extent[2]) & (lat <= extent[3]))


class viirs_03:
    """VNP03MOD / VNP03IMG geolocation."""

    ID = 'VIIRS Geolocation'

    def __init__(self, fnames, extent=None):
        lons, lats, szas, saas = [], [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('geolocation_data/longitude')
                lat, _ = f.var('geolocation_data/latitude')
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel]); lats.append(lat[sel])
                for tgt, nm in ((szas, 'geolocation_data/solar_zenith'),
                                (saas, 'geolocation_data/solar_azimuth')):
                    d, a = f.var(nm)
                    tgt.append(apply_scaling(d, a)[sel])
            finally:
                f.close()
        self.data = {
            'lon': _entry(np.concatenate(lons), 'Longitude', 'deg'),
            'lat': _entry(np.concatenate(lats), 'Latitude', 'deg'),
            'sza': _entry(np.concatenate(szas), 'Solar zenith', 'deg'),
            'saa': _entry(np.concatenate(saas), 'Solar azimuth', 'deg'),
        }


class viirs_l1b:
    """VNP02 L1B calibrated reflectance/radiance for one M-band."""

    ID = 'VIIRS L1B'

    def __init__(self, fnames, f03=None, band='M05', extent=None):
        rads, refs = [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                raw, attrs = f.var(f'observation_data/{band}')
                arr = np.asarray(raw, dtype=np.float64)
                fill = attrs.get('_FillValue', 65535)
                bad = arr >= np.float64(np.squeeze(fill))
                ref = (arr - np.float64(np.squeeze(attrs.get('add_offset', 0.0)))) \
                    * np.float64(np.squeeze(attrs.get('scale_factor', 1.0)))
                ref[bad] = np.nan
                refs.append(ref)
                try:
                    lut, _ = f.var(f'observation_data/{band}_brightness_temperature_lut')
                    rads.append(lut)
                except Exception:
                    pass
            finally:
                f.close()
        self.data = {
            'ref': _entry(np.concatenate([r.ravel() for r in refs]),
                          'Reflectance (TOA)'),
        }
        if f03 is not None:
            self.data['lon'] = f03.data['lon']
            self.data['lat'] = f03.data['lat']


class viirs_cldprop_l2:
    """CLDPROP_L2_VIIRS cloud optical properties -> gridded cot/cer."""

    ID = 'VIIRS Cloud Properties'

    def __init__(self, fnames, extent=None, nx=None, ny=None):
        lons, lats, cots, cers = [], [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('geolocation_data/longitude')
                lat, _ = f.var('geolocation_data/latitude')
                cot, a1 = f.var('geophysical_data/Cloud_Optical_Thickness')
                cer, a2 = f.var('geophysical_data/Cloud_Effective_Radius')
                cot = apply_scaling(cot, a1)
                cer = apply_scaling(cer, a2)
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel]); lats.append(lat[sel])
                cots.append(cot[sel]); cers.append(cer[sel])
            finally:
                f.close()
        lon = np.concatenate(lons); lat = np.concatenate(lats)
        cot = np.nan_to_num(np.concatenate(cots), nan=0.0)
        cer = np.nan_to_num(np.concatenate(cers), nan=0.0)
        self.data = {
            'lon': _entry(lon, 'Longitude', 'deg'),
            'lat': _entry(lat, 'Latitude', 'deg'),
            'cot': _entry(cot, 'Cloud optical thickness'),
            'cer': _entry(cer, 'Cloud effective radius', 'um'),
        }
        if extent is not None:
            lon2, lat2, cot2 = grid_by_extent(lon, lat, cot, extent, nx=nx, ny=ny)
            _, _, cer2 = grid_by_extent(lon, lat, cer, extent, nx=nx, ny=ny)
            self.data['lon_2d'] = _entry(lon2, 'Gridded longitude', 'deg')
            self.data['lat_2d'] = _entry(lat2, 'Gridded latitude', 'deg')
            self.data['cot_2d'] = _entry(np.nan_to_num(cot2), 'Gridded COT')
            self.data['cer_2d'] = _entry(np.nan_to_num(cer2), 'Gridded CER', 'um')


class viirs_09:
    """VNP09 surface reflectance -> alb_2d."""

    ID = 'VIIRS Surface Reflectance'

    def __init__(self, fnames, f03=None, band='M5', extent=None,
                 nx=None, ny=None):
        refs = []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                for cand in (f'{band} Surface Reflectance',
                             f'SurfReflect_{band}', band):
                    try:
                        r, a = f.var(cand)
                        refs.append(apply_scaling(r, a))
                        break
                    except Exception:
                        continue
            finally:
                f.close()
        ref = np.clip(np.nan_to_num(np.concatenate([r.ravel() for r in refs])),
                      0.0, 1.0)
        self.data = {'ref': _entry(ref, 'Surface reflectance')}
        if f03 is not None and extent is not None:
            lon = f03.data['lon']['data']
            lat = f03.data['lat']['data']
            lon2, lat2, alb2 = grid_by_extent(lon, lat, ref, extent, nx=nx, ny=ny)
            self.data['lon_2d'] = _entry(lon2, 'Gridded longitude', 'deg')
            self.data['lat_2d'] = _entry(lat2, 'Gridded latitude', 'deg')
            self.data['alb_2d'] = _entry(np.nan_to_num(alb2), 'Gridded albedo')


class viirs_mvcm_cldmsk_l2:
    """CLDMSK_L2 VIIRS continuity cloud mask (reference viirs.py:921):
    Integer_Cloud_Mask 0=cloudy .. 3=confident clear."""

    ID = 'VIIRS MVCM Continuity Cloud Mask 6-Min Swath 750 m'

    def __init__(self, fname, extent=None):
        f = open_any(fname)
        try:
            lon, _ = f.var('geolocation_data/longitude')
            lat, _ = f.var('geolocation_data/latitude')
            msk, _ = f.var('geophysical_data/Integer_Cloud_Mask')
            sel = _subset(np.asarray(lon), np.asarray(lat), extent)
            self.data = {
                'lon': _entry(np.asarray(lon)[sel], 'Longitude', 'deg'),
                'lat': _entry(np.asarray(lat)[sel], 'Latitude', 'deg'),
                'cld_msk': _entry(np.asarray(msk)[sel],
                                  'Integer Cloud Mask '
                                  '(0=cloudy 1=prob.cloudy 2=prob.clear 3=clear)'),
            }
        finally:
            f.close()


def _tile_lonlat(fname, nx, ny):
    """Approximate lon/lat of a sinusoidal-tile product from its hXXvYY tag
    (reference derives them from the projection; analytic inverse here)."""
    import re
    from .modis import cal_sinusoidal_grid, _R_SINU
    m = re.search(r'h(\d\d)v(\d\d)', fname)
    if not m:
        return None, None, None, None
    ih, iv = int(m.group(1)), int(m.group(2))
    gx, gy = cal_sinusoidal_grid()
    x = np.linspace(gx[ih], gx[ih + 1], nx, endpoint=False)
    y = np.linspace(gy[iv], gy[iv + 1], ny, endpoint=False)
    xx, yy = np.meshgrid(x, y, indexing='ij')
    lat = np.rad2deg(yy / _R_SINU)
    with np.errstate(invalid='ignore', divide='ignore'):
        lon = np.rad2deg(xx / (_R_SINU * np.cos(np.deg2rad(lat))))
    return lon, lat, xx, yy


class _viirs_tile_product:
    """Shared machinery for VNP09A1/43MA3/43MA4 sinusoidal-tile products."""

    _PATH = 'HDFEOS/GRIDS/{grid}/Data Fields/{var}'

    def _read_var(self, f, names):
        for n in names:
            try:
                d, a = f.var(n)
                return apply_scaling(d, a)
            except Exception:
                continue
        raise KeyError(f'none of {names} found')


class viirs_09a1(_viirs_tile_product):
    """VNP09A1 8-day surface reflectance on the sinusoidal tile grid
    (reference viirs.py:1393): data keys ref/lon/lat/x/y."""

    ID = 'VIIRS surface reflectance (1 km, 8 day)'

    def __init__(self, fnames, band='M4', extent=None):
        band = band.upper().replace('M0', 'M')
        refs = lon = lat = x = y = None
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                ref = self._read_var(
                    f, [f'SurfReflect_{band}', f'SurfReflect_{band}_1',
                        self._PATH.format(grid='VNP_Grid_1km_L3_2d',
                                          var=f'SurfReflect_{band}_1')])
            finally:
                f.close()
            refs = ref if refs is None else np.nanmean([refs, ref], axis=0)
            if lon is None:
                lon, lat, x, y = _tile_lonlat(fname, *ref.shape)
        refs = np.where((refs >= -0.1) & (refs <= 1.6), refs, np.nan)
        self.data = {'ref': _entry(np.nan_to_num(refs), 'Surface reflectance'),
                     'alb_2d': _entry(np.nan_to_num(refs), 'Surface albedo')}
        if lon is not None:
            self.data.update(lon=_entry(lon, 'Longitude', 'deg'),
                             lat=_entry(lat, 'Latitude', 'deg'),
                             x=_entry(x, 'Sinusoidal x', 'm'),
                             y=_entry(y, 'Sinusoidal y', 'm'))


class viirs_43ma3(_viirs_tile_product):
    """VNP43MA3 black/white-sky albedo on the sinusoidal tile grid
    (reference viirs.py:1515): data keys bsa/wsa/lon/lat/x/y."""

    ID = 'VIIRS surface albedo (1 km)'

    def __init__(self, fnames, channels=('M4',), extent=None):
        bsa, wsa = {}, {}
        lon = lat = x = y = None
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                for ch in channels:
                    bsa[ch] = self._read_var(
                        f, [f'Albedo_BSA_{ch}',
                            self._PATH.format(grid='VIIRS_Grid_BRDF',
                                              var=f'Albedo_BSA_{ch}')])
                    wsa[ch] = self._read_var(
                        f, [f'Albedo_WSA_{ch}',
                            self._PATH.format(grid='VIIRS_Grid_BRDF',
                                              var=f'Albedo_WSA_{ch}')])
            finally:
                f.close()
            if lon is None:
                lon, lat, x, y = _tile_lonlat(fname, *bsa[channels[0]].shape)
        b = np.stack([bsa[c] for c in channels], axis=-1)
        w = np.stack([wsa[c] for c in channels], axis=-1)
        self.data = {'bsa': _entry(np.nan_to_num(b), 'Black-sky albedo'),
                     'wsa': _entry(np.nan_to_num(w), 'White-sky albedo'),
                     'alb_2d': _entry(np.nan_to_num(w[..., 0]),
                                      'Surface albedo')}
        if lon is not None:
            self.data.update(lon=_entry(lon, 'Longitude', 'deg'),
                             lat=_entry(lat, 'Latitude', 'deg'),
                             x=_entry(x, 'Sinusoidal x', 'm'),
                             y=_entry(y, 'Sinusoidal y', 'm'))


class viirs_43ma4(_viirs_tile_product):
    """VNP43MA4 nadir BRDF-adjusted reflectance (reference viirs.py:1657)."""

    ID = 'VIIRS surface reflectance (1 km)'

    def __init__(self, fnames, channels=('M4',), extent=None):
        ref = {}
        lon = lat = x = y = None
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                for ch in channels:
                    ref[ch] = self._read_var(
                        f, [f'Nadir_Reflectance_{ch}',
                            self._PATH.format(grid='VIIRS_Grid_BRDF',
                                              var=f'Nadir_Reflectance_{ch}')])
            finally:
                f.close()
            if lon is None:
                lon, lat, x, y = _tile_lonlat(fname, *ref[channels[0]].shape)
        r = np.stack([ref[c] for c in channels], axis=-1)
        self.data = {'ref': _entry(np.nan_to_num(r),
                                   'Nadir BRDF-adjusted reflectance'),
                     'alb_2d': _entry(np.nan_to_num(r[..., 0]),
                                      'Surface albedo')}
        if lon is not None:
            self.data.update(lon=_entry(lon, 'Longitude', 'deg'),
                             lat=_entry(lat, 'Latitude', 'deg'),
                             x=_entry(x, 'Sinusoidal x', 'm'),
                             y=_entry(y, 'Sinusoidal y', 'm'))


def get_fname_pattern(fname, index_s=1, index_e=2):
    """'VNP09A1.A2019241.h10v05...' -> 'A2019241.h10v05'
    (reference viirs.py:1791)."""
    import os
    return '.'.join(os.path.basename(fname).split('.')[index_s:index_e + 1])
