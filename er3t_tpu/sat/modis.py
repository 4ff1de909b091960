"""MODIS granule readers.

Capability parity with er3t/util/modis.py (reference): geolocation (MOD03),
calibrated radiance (MOD02), cloud properties (MOD06_L2), cloud mask
(MOD35_L2), aerosol (MOD04), surface reflectance (MOD09), BRDF/albedo
(MCD43A1/A3).  Readers emit the reference's data contract:
``self.data[key] = {'data', 'name', 'units'}`` with the key names the
preprocessing layer consumes (lon_2d/lat_2d/cot_2d/cer_2d/alb_2d ...,
cf. er3t/pre/cld/cld_sat.py:140-142, er3t/pre/sfc/sfc_sat.py:100-101).

MODIS collection-6 granules are HDF4; reading requires pyhdf
(er3t_tpu.util.ncio raises a clear error otherwise).
"""

from __future__ import annotations

import numpy as np

from ..util.grid import grid_by_extent
from ..util.ncio import apply_scaling, open_any

__all__ = ['modis_03', 'modis_l1b', 'modis_l2', 'modis_35_l2', 'modis_04',
           'modis_09', 'modis_43a3', 'modis_43a1']

# MODIS band center wavelengths [nm] for the L1B logic
# (reference: er3t/util/modis.py:257-331)
BAND_WVL = {1: 650.0, 2: 860.0, 3: 470.0, 4: 555.0, 5: 1240.0, 6: 1640.0,
            7: 2130.0, 26: 1380.0}


def _entry(data, name, units='N/A'):
    return {'data': data, 'name': name, 'units': units}


def _subset(lon, lat, extent):
    if extent is None:
        return np.ones(lon.shape, dtype=bool)
    return ((lon >= extent[0]) & (lon <= extent[1]) &
            (lat >= extent[2]) & (lat <= extent[3]))


class modis_03:
    """MOD03/MYD03 geolocation."""

    ID = 'MODIS Geolocation'

    def __init__(self, fnames, extent=None):
        self.extent = extent
        lons, lats, szas, saas, vzas, vaas = [], [], [], [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('Longitude')
                lat, _ = f.var('Latitude')
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel])
                lats.append(lat[sel])
                for tgt, name in ((szas, 'SolarZenith'), (saas, 'SolarAzimuth'),
                                  (vzas, 'SensorZenith'), (vaas, 'SensorAzimuth')):
                    d, a = f.var(name)
                    tgt.append(apply_scaling(d, a)[sel])
            finally:
                f.close()
        self.data = {
            'lon': _entry(np.concatenate(lons), 'Longitude', 'deg'),
            'lat': _entry(np.concatenate(lats), 'Latitude', 'deg'),
            'sza': _entry(np.concatenate(szas), 'Solar zenith', 'deg'),
            'saa': _entry(np.concatenate(saas), 'Solar azimuth', 'deg'),
            'vza': _entry(np.concatenate(vzas), 'Sensor zenith', 'deg'),
            'vaa': _entry(np.concatenate(vaas), 'Sensor azimuth', 'deg'),
        }


class modis_l1b:
    """MOD02/MYD02 L1B calibrated radiance for one band."""

    ID = 'MODIS L1B'

    _DSETS = {
        'qkm': 'EV_250_RefSB', 'hkm': 'EV_500_RefSB', '1km': 'EV_1KM_RefSB',
    }
    _BAND_INDEX = {'qkm': {1: 0, 2: 1},
                   'hkm': {3: 0, 4: 1, 5: 2, 6: 3, 7: 4}}

    def __init__(self, fnames, f03=None, band=1, resolution='qkm',
                 extent=None):
        self.band = band
        ds_name = self._DSETS[resolution]
        idx = self._BAND_INDEX.get(resolution, {}).get(band, 0)
        rads, refs = [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                raw, attrs = f.var(ds_name)
                raw = np.asarray(raw[idx], dtype=np.float64)
                r_sc = np.atleast_1d(attrs.get('radiance_scales', [1.0]))[idx]
                r_of = np.atleast_1d(attrs.get('radiance_offsets', [0.0]))[idx]
                f_sc = np.atleast_1d(attrs.get('reflectance_scales', [1.0]))[idx]
                f_of = np.atleast_1d(attrs.get('reflectance_offsets', [0.0]))[idx]
                bad = raw > 32767
                rad = (raw - r_of) * r_sc / 1000.0  # W/m2/nm/sr
                ref = (raw - f_of) * f_sc
                rad[bad] = np.nan
                ref[bad] = np.nan
                rads.append(rad)
                refs.append(ref)
            finally:
                f.close()
        self.data = {
            'rad': _entry(np.concatenate([r.ravel() for r in rads]),
                          'Radiance', 'W/m^2/nm/sr'),
            'ref': _entry(np.concatenate([r.ravel() for r in refs]),
                          'Reflectance (TOA)'),
            'wvl': _entry(BAND_WVL.get(band, np.nan), 'Band wavelength', 'nm'),
        }
        if f03 is not None:
            self.data['lon'] = f03.data['lon']
            self.data['lat'] = f03.data['lat']


class modis_l2:
    """MOD06_L2 cloud optical properties -> gridded cot/cer maps."""

    ID = 'MODIS L2 Cloud'

    def __init__(self, fnames, extent=None, nx=None, ny=None):
        lons, lats, cots, cers, cths = [], [], [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('Longitude')
                lat, _ = f.var('Latitude')
                cot, a1 = f.var('Cloud_Optical_Thickness')
                cer, a2 = f.var('Cloud_Effective_Radius')
                cth, a3 = f.var('Cloud_Top_Height')
                cot = apply_scaling(cot, a1)
                cer = apply_scaling(cer, a2)
                cth = apply_scaling(cth, a3) / 1000.0
                # COT/CER are 1km; lon/lat in MOD06 are 5km — upsample
                from ..util.grid import upscale_2d
                if lon.shape != cot.shape:
                    fy = int(round(cot.shape[0] / lon.shape[0]))
                    fx = int(round(cot.shape[1] / lon.shape[1]))
                    lon = upscale_2d(lon, (fy, fx))[:cot.shape[0], :cot.shape[1]]
                    lat = upscale_2d(lat, (fy, fx))[:cot.shape[0], :cot.shape[1]]
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel]); lats.append(lat[sel])
                cots.append(cot[sel]); cers.append(cer[sel]); cths.append(cth[sel])
            finally:
                f.close()
        lon = np.concatenate(lons); lat = np.concatenate(lats)
        cot = np.nan_to_num(np.concatenate(cots), nan=0.0)
        cer = np.nan_to_num(np.concatenate(cers), nan=0.0)
        cth = np.nan_to_num(np.concatenate(cths), nan=0.0)
        self.data = {
            'lon': _entry(lon, 'Longitude', 'deg'),
            'lat': _entry(lat, 'Latitude', 'deg'),
            'cot': _entry(cot, 'Cloud optical thickness'),
            'cer': _entry(cer, 'Cloud effective radius', 'um'),
            'cth': _entry(cth, 'Cloud top height', 'km'),
        }
        if extent is not None:
            lon2, lat2, cot2 = grid_by_extent(lon, lat, cot, extent, nx=nx, ny=ny)
            _, _, cer2 = grid_by_extent(lon, lat, cer, extent, nx=nx, ny=ny)
            _, _, cth2 = grid_by_extent(lon, lat, cth, extent, nx=nx, ny=ny)
            self.data['lon_2d'] = _entry(lon2, 'Gridded longitude', 'deg')
            self.data['lat_2d'] = _entry(lat2, 'Gridded latitude', 'deg')
            self.data['cot_2d'] = _entry(np.nan_to_num(cot2), 'Gridded COT')
            self.data['cer_2d'] = _entry(np.nan_to_num(cer2), 'Gridded CER', 'um')
            self.data['cth_2d'] = _entry(np.nan_to_num(cth2), 'Gridded CTH', 'km')


class modis_35_l2:
    """MOD35_L2 cloud mask (unobstructed-FOV quality flag)."""

    ID = 'MODIS Cloud Mask'

    def __init__(self, fnames, extent=None):
        masks = []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                cm, _ = f.var('Cloud_Mask')
                b0 = np.asarray(cm)[0].astype(np.uint8)
                determined = (b0 & 0x01) > 0
                conf = (b0 >> 1) & 0x03  # 0 cloudy .. 3 confident clear
                mask = np.where(determined, conf, 255).astype(np.uint8)
                masks.append(mask)
            finally:
                f.close()
        self.data = {
            'cloud_mask': _entry(np.concatenate([m.ravel() for m in masks]),
                                 'Cloud mask (0 cloudy..3 clear)'),
        }


class modis_04:
    """MOD04 aerosol optical depth."""

    ID = 'MODIS Aerosol'

    def __init__(self, fnames, extent=None):
        lons, lats, aods = [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('Longitude')
                lat, _ = f.var('Latitude')
                aod, a = f.var('AOD_550_Dark_Target_Deep_Blue_Combined')
                aod = apply_scaling(aod, a)
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel]); lats.append(lat[sel]); aods.append(aod[sel])
            finally:
                f.close()
        self.data = {
            'lon': _entry(np.concatenate(lons), 'Longitude', 'deg'),
            'lat': _entry(np.concatenate(lats), 'Latitude', 'deg'),
            'aod': _entry(np.concatenate(aods), 'AOD 550nm'),
        }


class modis_09:
    """MOD09 atmospherically-corrected surface reflectance -> alb_2d."""

    ID = 'MODIS Surface Reflectance'

    def __init__(self, fnames, extent=None, band=1, nx=None, ny=None):
        lons, lats, refs = [], [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                lon, _ = f.var('Longitude')
                lat, _ = f.var('Latitude')
                ref, a = f.var(f'1km Surface Reflectance Band {band}')
                ref = apply_scaling(ref, a)
                sel = _subset(lon, lat, extent)
                lons.append(lon[sel]); lats.append(lat[sel]); refs.append(ref[sel])
            finally:
                f.close()
        lon = np.concatenate(lons); lat = np.concatenate(lats)
        ref = np.clip(np.nan_to_num(np.concatenate(refs)), 0.0, 1.0)
        self.data = {
            'lon': _entry(lon, 'Longitude', 'deg'),
            'lat': _entry(lat, 'Latitude', 'deg'),
            'ref': _entry(ref, 'Surface reflectance'),
        }
        if extent is not None:
            lon2, lat2, alb2 = grid_by_extent(lon, lat, ref, extent, nx=nx, ny=ny)
            self.data['lon_2d'] = _entry(lon2, 'Gridded longitude', 'deg')
            self.data['lat_2d'] = _entry(lat2, 'Gridded latitude', 'deg')
            self.data['alb_2d'] = _entry(np.nan_to_num(alb2), 'Gridded albedo')


class modis_43a3:
    """MCD43A3 white/black-sky albedo."""

    ID = 'MODIS BRDF Albedo'

    def __init__(self, fnames, band=1):
        wsas, bsas = [], []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                wsa, a1 = f.var(f'Albedo_WSA_Band{band}')
                bsa, a2 = f.var(f'Albedo_BSA_Band{band}')
                wsas.append(apply_scaling(wsa, a1))
                bsas.append(apply_scaling(bsa, a2))
            finally:
                f.close()
        self.data = {
            'wsa': _entry(np.stack(wsas).squeeze(), 'White-sky albedo'),
            'bsa': _entry(np.stack(bsas).squeeze(), 'Black-sky albedo'),
        }


class modis_43a1:
    """MCD43A1 BRDF kernel weights (f_iso, f_vol, f_geo) -> LSRT surface."""

    ID = 'MODIS BRDF Parameters'

    def __init__(self, fnames, band=1):
        pars = []
        for fname in np.atleast_1d(fnames):
            f = open_any(fname)
            try:
                p, a = f.var(f'BRDF_Albedo_Parameters_Band{band}')
                pars.append(apply_scaling(p, a))
            finally:
                f.close()
        p = np.stack(pars).squeeze()
        self.data = {
            'f_iso': _entry(p[..., 0], 'Isotropic kernel weight'),
            'f_vol': _entry(p[..., 1], 'RossThick kernel weight'),
            'f_geo': _entry(p[..., 2], 'LiSparseR kernel weight'),
        }

    def lsrt_2d(self):
        """(Nx, Ny, 3) array for er3t_tpu.pre.sfc.sfc_2d_gen."""
        return np.stack([np.nan_to_num(self.data['f_iso']['data']),
                         np.nan_to_num(self.data['f_geo']['data']),
                         np.nan_to_num(self.data['f_vol']['data'])], axis=-1)
