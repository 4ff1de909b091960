"""NASA DAAC download machinery.

Capability parity with er3t/util/daac.py: Earthdata authentication
(token/netrc), LAADS/LANCE/NSIDC/GES-DISC URL construction, geoMeta-based
granule search for a (date, lon, lat) query, file download with integrity
check, and Worldview quicklook imagery URLs.  Network access is optional —
every function that touches the network degrades with a clear error when
offline.
"""

from __future__ import annotations

import datetime
import io
import os

import numpy as np

__all__ = ['earthdata_token', 'geometa_url', 'parse_geometa',
           'find_granules', 'download_url', 'download_laads_https',
           'worldview_image_url', 'SAT_TAGS']

# product catalog subset (reference: er3t/common.py:66-591 catalogs ~60
# products; the ones the project pipelines consume)
SAT_TAGS = {
    'MOD02QKM': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MYD02QKM': {'archive': '61', 'daac': 'laads', 'sat': 'Aqua'},
    'MOD03': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MYD03': {'archive': '61', 'daac': 'laads', 'sat': 'Aqua'},
    'MOD06_L2': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MYD06_L2': {'archive': '61', 'daac': 'laads', 'sat': 'Aqua'},
    'MOD35_L2': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MOD04_L2': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MOD09': {'archive': '61', 'daac': 'laads', 'sat': 'Terra'},
    'MCD43A1': {'archive': '61', 'daac': 'laads', 'sat': 'Terra+Aqua'},
    'MCD43A3': {'archive': '61', 'daac': 'laads', 'sat': 'Terra+Aqua'},
    'VNP02MOD': {'archive': '5200', 'daac': 'laads', 'sat': 'SNPP'},
    'VNP03MOD': {'archive': '5200', 'daac': 'laads', 'sat': 'SNPP'},
    'CLDPROP_L2_VIIRS_SNPP': {'archive': '5111', 'daac': 'laads', 'sat': 'SNPP'},
}

_LAADS = 'https://ladsweb.modaps.eosdis.nasa.gov'


def earthdata_token() -> str | None:
    """EARTHDATA_TOKEN from the environment (reference: daac.py:61-111)."""
    return os.environ.get('EARTHDATA_TOKEN')


def geometa_url(product: str, date: datetime.date) -> str:
    """geoMeta CSV listing URL for a product/day."""
    tag = SAT_TAGS.get(product, {'archive': '61'})
    sat = {'Terra': 'TERRA', 'Aqua': 'AQUA', 'SNPP': 'NPP'}.get(
        tag.get('sat', 'Terra'), 'TERRA')
    coll = '61' if tag['archive'] == '61' else tag['archive']
    return (f'{_LAADS}/archive/geoMeta/{coll}/{sat}/{date:%Y}/'
            f'{product}_{date:%Y-%m-%d}.txt')


def parse_geometa(text: str):
    """Parse a geoMeta CSV into a structured list of granule records.

    Columns: GranuleID, StartDateTime, ..., GRingLongitude1..4,
    GRingLatitude1..4 (reference parsing: daac.py:676-971).
    """
    rows = []
    header = None
    for line in io.StringIO(text):
        line = line.strip()
        if not line:
            continue
        if line.startswith('#'):
            header = [h.strip() for h in line.lstrip('#').split(',')]
            continue
        parts = [p.strip() for p in line.split(',')]
        if header is None or len(parts) < len(header):
            continue
        rec = dict(zip(header, parts))
        try:
            lons = [float(rec[f'GRingLongitude{i}']) for i in range(1, 5)]
            lats = [float(rec[f'GRingLatitude{i}']) for i in range(1, 5)]
        except (KeyError, ValueError):
            continue
        rows.append({'granule': rec.get('GranuleID', ''),
                     'start': rec.get('StartDateTime', ''),
                     'ring_lon': lons, 'ring_lat': lats,
                     'day_night': rec.get('DayNightFlag', '')})
    return rows


def _point_in_ring(lon, lat, ring_lon, ring_lat):
    """Even-odd point-in-polygon (granule swath G-ring)."""
    inside = False
    n = len(ring_lon)
    j = n - 1
    for i in range(n):
        xi, yi = ring_lon[i], ring_lat[i]
        xj, yj = ring_lon[j], ring_lat[j]
        if (yi > lat) != (yj > lat):
            x_int = (xj - xi) * (lat - yi) / (yj - yi) + xi
            if lon < x_int:
                inside = not inside
        j = i
    return inside


def find_granules(product: str, date: datetime.date, lon: float, lat: float,
                  geometa_text: str | None = None, day_only=True):
    """Granules of a product/day whose swath G-ring contains (lon, lat).

    Pass ``geometa_text`` to search offline; otherwise the geoMeta listing
    is fetched (requires network + token).
    """
    if geometa_text is None:
        import requests
        headers = {}
        tok = earthdata_token()
        if tok:
            headers['Authorization'] = f'Bearer {tok}'
        r = requests.get(geometa_url(product, date), headers=headers,
                         timeout=60)
        r.raise_for_status()
        geometa_text = r.text
    out = []
    for rec in parse_geometa(geometa_text):
        if day_only and rec['day_night'] not in ('', 'D', 'B'):
            continue
        if _point_in_ring(lon, lat, rec['ring_lon'], rec['ring_lat']):
            out.append(rec)
    return out


def granule_url(product: str, date: datetime.date, granule: str) -> str:
    tag = SAT_TAGS.get(product, {'archive': '61'})
    doy = date.timetuple().tm_yday
    return (f'{_LAADS}/archive/allData/{tag["archive"]}/{product}/'
            f'{date:%Y}/{doy:03d}/{granule}')


def download_url(url: str, fdir_out: str, token: str | None = None,
                 min_size: int = 1024, overwrite=False) -> str:
    """Download with bearer-token auth + size sanity check
    (reference: final_file_check, daac.py:498)."""
    import requests
    os.makedirs(fdir_out, exist_ok=True)
    fname = os.path.join(fdir_out, url.rsplit('/', 1)[-1])
    if os.path.exists(fname) and not overwrite and os.path.getsize(fname) > min_size:
        return fname
    headers = {}
    tok = token or earthdata_token()
    if tok:
        headers['Authorization'] = f'Bearer {tok}'
    with requests.get(url, headers=headers, stream=True, timeout=300) as r:
        r.raise_for_status()
        with open(fname, 'wb') as fo:
            for chunk in r.iter_content(1 << 20):
                fo.write(chunk)
    if os.path.getsize(fname) < min_size:
        os.remove(fname)
        raise IOError(f'downloaded file too small: {url}')
    return fname


def download_laads_https(date: datetime.date, product: str, lon: float,
                         lat: float, fdir_out='.', token=None):
    """Search geoMeta for granules over a point and download them
    (reference: download_laads_https, daac.py:1273)."""
    grans = find_granules(product, date, lon, lat)
    return [download_url(granule_url(product, date, g['granule']), fdir_out,
                         token=token) for g in grans]


def worldview_image_url(date: datetime.date, extent, layer='MODIS_Terra_CorrectedReflectance_TrueColor',
                        dpm=100):
    """NASA Worldview snapshot URL (reference: download_worldview_image,
    daac.py:1767)."""
    lon0, lon1, lat0, lat1 = extent
    w = int(abs(lon1 - lon0) * dpm)
    h = int(abs(lat1 - lat0) * dpm)
    return ('https://wvs.earthdata.nasa.gov/api/v1/snapshot?request=GetSnapshot'
            f'&time={date:%Y-%m-%d}&bbox={lat0},{lon0},{lat1},{lon1}'
            f'&layers={layer}&format=image/png&width={w}&height={h}')


def lance_url(date: datetime.date, dataset_tag: str, granule: str,
              server='https://nrt3.modaps.eosdis.nasa.gov',
              fdir_prefix='/archives/allData') -> str:
    """LANCE near-real-time archive URL (reference download_lance_https,
    daac.py:1390): dataset_tag like '61/MYD06_L2'."""
    doy = date.timetuple().tm_yday
    return f'{server}{fdir_prefix}/{dataset_tag}/{date.year}/{doy:03d}/{granule}'


def download_lance_https(date: datetime.date, dataset_tag: str,
                         filename_tag: str, lon=0.0, lat=0.0, fdir_out='.',
                         token=None, geometa_text=None, run=True):
    """Download LANCE NRT granules over (lon, lat) matching a filename tag;
    with run=False returns the target URLs only (offline-testable with
    ``geometa_text``)."""
    product = dataset_tag.split('/')[-1]
    grans = find_granules(product, date, lon, lat, geometa_text=geometa_text)
    urls = [lance_url(date, dataset_tag, g['granule']) for g in grans
            if filename_tag in g['granule']]
    if not run:
        return urls
    return [download_url(u, fdir_out, token=token) for u in urls]


def nsidc_url(date: datetime.date, product: str, version: str, granule: str,
              server='https://n5eil01u.ecs.nsidc.org') -> str:
    """NSIDC archive URL (reference download_nsidc_https, daac.py:1514):
    e.g. product 'MOD29', version '61'."""
    sat_dir = {'MOD': 'MOST', 'MYD': 'MOSA', 'VNP': 'VIIRS',
               'VJ1': 'VIIRS'}.get(granule[:3], 'MOST')
    return (f'{server}/{sat_dir}/{product}.{version.zfill(3)}/'
            f'{date:%Y.%m.%d}/{granule}')


def oco2_url(dtime: datetime.datetime, dataset_tag: str, granule: str,
             server='https://oco2.gesdisc.eosdis.nasa.gov',
             fdir_prefix='/data/OCO2_DATA') -> str:
    """OCO-2 GES DISC archive URL (reference download_oco2_https,
    daac.py:1629): dataset_tag like 'OCO2_L2_Standard.11r'."""
    doy = dtime.timetuple().tm_yday
    return (f'{server}{fdir_prefix}/{dataset_tag}/{dtime.year}/{doy:03d}/'
            f'{granule}')


def final_file_check(fname: str, data_format=None, verbose=False) -> bool:
    """Post-download validity check (reference final_file_check,
    daac.py:498): non-empty + openable by the matching backend."""
    import os
    if not os.path.isfile(fname) or os.path.getsize(fname) == 0:
        return False
    fmt = data_format or fname.rsplit('.', 1)[-1].lower()
    try:
        if fmt in ('h5', 'he5', 'hdf5', 'nc', 'nc4', 'hdf', 'h4'):
            from ..util.ncio import open_any
            open_any(fname).close()
        elif fmt == 'out':
            from scipy.io import readsav
            readsav(fname)
        return True
    except Exception as e:
        if verbose:
            print(f'final_file_check: {fname}: {e}')
        return False
