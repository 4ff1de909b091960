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

__all__ = ['viirs_03', 'viirs_l1b', 'viirs_cldprop_l2', 'viirs_09']


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
