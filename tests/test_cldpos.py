"""Cloud-map position corrections (apps/cldpos.py): synthetic offset-cloud
re-registration (VERDICT r4 item 5; reference para_corr/wind_corr,
projects/01_oco2_rad-sim.py:786-826, cdata_cld_ipa :912-1100)."""

import numpy as np

from er3t_tpu.apps.cldpos import (correct_cloud_map, move_correlate,
                                  parallax_shift, shift_fields, wind_shift)


def _blob(nx, i0, j0, r, value):
    f = np.zeros((nx, nx))
    ii, jj = np.meshgrid(np.arange(nx), np.arange(nx), indexing='ij')
    f[(ii - i0) ** 2 + (jj - j0) ** 2 <= r * r] = value
    return f


def test_move_correlate_recovers_offset():
    a = _blob(48, 20, 24, 5, 1.0) > 0
    b = np.roll(np.roll(a, -3, axis=0), 5, axis=1)   # b displaced
    di, dj = move_correlate(a, b)
    assert (di, dj) == (3, -5)                       # shift b back onto a
    assert move_correlate(a, np.zeros_like(a)) == (0, 0)


def test_parallax_shift_geometry():
    # cloud at 4 km over sea level, VZA 45 deg -> displacement 4 km;
    # sensor due east (vaa=90): correction is pure +x
    di, dj = parallax_shift(4.0, 0.0, 45.0, 90.0, dx_km=0.5, dy_km=0.5)
    assert np.isclose(di, 8.0) and np.isclose(dj, 0.0, atol=1e-9)
    # due north (vaa=0): pure +y
    di, dj = parallax_shift(4.0, 0.0, 45.0, 0.0, dx_km=0.5, dy_km=0.5)
    assert np.isclose(dj, 8.0) and np.isclose(di, 0.0, atol=1e-9)
    # clear pixel (cth == sfc): no shift
    di, dj = parallax_shift(0.0, 0.0, 45.0, 90.0, dx_km=0.5, dy_km=0.5)
    assert di == 0.0 and dj == 0.0


def test_wind_shift():
    di, dj = wind_shift(10.0, -5.0, 600.0, dx_km=0.5, dy_km=0.5)
    assert np.isclose(di, 12.0) and np.isclose(dj, -6.0)


def test_offset_cloud_reregistered():
    """End-to-end: a cloud whose apparent position is displaced by
    parallax + wind drift is moved back onto its true position."""
    nx, dx = 64, 0.25
    true = _blob(nx, 30, 30, 6, 18.0)
    cth = np.where(true > 0, 3.0, 0.0)
    # apparent displacement: parallax AWAY from a sensor at vaa=90
    # (east), vza such that 3 km -> 12 cells; wind drift -4 cells in y
    dip, djp = parallax_shift(cth, 0.0, 45.0, 90.0, dx, dx)   # = 12 cells x
    diw, djw = wind_shift(-5.0 / 3, 0.0, 600.0, dx, dx)       # ~ -4 cells x
    # construct the APPARENT map by shifting the true map the other way
    (cot_app, cth_app), _ = shift_fields([true, cth], -(dip + diw),
                                         -(djp + djw))
    cer_app = np.where(cot_app > 0, 12.0, 0.0)
    # apply the correction chain to the apparent map
    cot_c, cer_c, cth_c, msk = correct_cloud_map(
        cot_app, cer_app, cth_app, sfh_km=0.0, vza_deg=45.0, vaa_deg=90.0,
        u10=-5.0 / 3, v10=0.0, dt_s=600.0, dx_km=dx, dy_km=dx, mode='3d')
    # re-registration: corrected field overlaps the true one (boundary
    # rounding can differ by a cell ring)
    inter = ((cot_c > 0) & (true > 0)).sum()
    union = ((cot_c > 0) | (true > 0)).sum()
    assert inter / union > 0.9
    assert np.isclose(cot_c[cot_c > 0].mean(), 18.0)
    assert np.isclose(cth_c[cot_c > 0].mean(), 3.0)
    # IPA branch: wind only — parallax is NOT undone
    cot_i, _, _, _ = correct_cloud_map(
        cot_app, cer_app, cth_app, vza_deg=45.0, vaa_deg=90.0,
        u10=-5.0 / 3, v10=0.0, dt_s=600.0, dx_km=dx, dy_km=dx, mode='ipa')
    ci = np.argwhere(cot_i > 0).mean(axis=0)
    ct = np.argwhere(true > 0).mean(axis=0)
    assert abs(ci[0] - (ct[0] - 12.0)) < 1.5      # still parallax-displaced
