"""Volume-rendered quasi-radiance target (MCARaTS Wld_mtarget=3,
mca_inp.py:23-26,404-407): deterministic camera-ray rendering of the
single-scattered solar source, cross-checked against the MC camera
restricted to single scattering."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.cld import cld_gen_hom
from er3t_tpu.rtm.scene import build_scene
from er3t_tpu.rtm.mc import SolverConfig
from er3t_tpu.rtm.mc_flight import run_transport_flight
from er3t_tpu.rtm.quasi import quasi_radiance


@pytest.fixture(scope='module')
def scene():
    atm = atm_atmmod(np.concatenate([np.arange(0, 5.0, 0.5),
                                     np.arange(5.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm, ng=1)
    cld = cld_gen_hom(nx=8, ny=8, nz=2, dx=0.5, dy=0.5, cot0=2.0, cer0=10.0,
                      cloud_base=1.0, cloud_top=2.0)
    cld.extinction[4:] = 0.0     # broken cloud: half the sky
    return build_scene(atm, ab, cld=cld, surface=0.0,
                       solar_zenith_angle=40.0, solar_azimuth_angle=0.0)


def test_quasi_finite_and_structured(scene):
    scn, st = scene
    cfg = SolverConfig(sensor_type='camera', cam_npix=32, cam_zloc=0.0,
                       cam_qmax=80.0)
    img = np.asarray(quasi_radiance(scn, st, cfg, n_steps=160))
    assert img.shape == (32, 32, st.ng)
    inside = np.isfinite(img[..., 0])
    assert inside.sum() > 500
    vals = img[..., 0][inside]
    assert np.all(vals >= 0) and vals.max() > 0
    # the cloudy half of the sky is brighter than the clear half
    assert img[:16][np.isfinite(img[:16, :, 0])].mean() != pytest.approx(
        img[16:][np.isfinite(img[16:, :, 0])].mean(), rel=0.05)


def test_quasi_matches_mc_single_scatter():
    """Quasi-radiance IS deterministic single scattering: for a horizontally
    homogeneous scene (where quasi's vertical-column solar attenuation is
    exact) the MC camera with n_scat_max=1 must agree quantitatively.
    (In broken clouds quasi stays an approximation — like MCARaTS's own
    mtarget=3 — because the direct beam is attenuated through the local
    column, not the true slant path.)"""
    atm = atm_atmmod(np.concatenate([np.arange(0, 5.0, 0.5),
                                     np.arange(5.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm, ng=1)
    cld = cld_gen_hom(nx=4, ny=4, nz=2, dx=1.0, dy=1.0, cot0=1.5, cer0=10.0,
                      cloud_base=1.0, cloud_top=2.0)
    scn, st = build_scene(atm, ab, cld=cld, surface=0.0,
                          solar_zenith_angle=40.0)
    cfg = SolverConfig(target='radiance', sensor_type='camera', cam_npix=16,
                       cam_zloc=0.0, cam_qmax=70.0, batch=1 << 12,
                       n_scat_max=1, cam_rmin=1.0)
    img_q = np.asarray(quasi_radiance(scn, st, cfg, n_steps=256))[..., 0]

    n = 400_000
    tal = run_transport_flight(scn, st, cfg, n, seed=5)
    from er3t_tpu.rtm.out import reduce_camera_radiance

    class _Ab:
        weight = np.ones(1)
        slit_func = np.ones((st.nz, 1))
        solar = np.ones(1)

    area = (st.nx * st.dx) * (st.ny * st.dy)
    red = reduce_camera_radiance(np.asarray(tal.rad), int(tal.n_launched),
                                 _Ab(), float(np.asarray(scn.mu0)),
                                 domain_area_m2=area, qmax_deg=cfg.cam_qmax)
    img_m = np.asarray(red['rad']) / red['toa']
    # compare only view angles where a single periodic replica contains the
    # whole line of sight: the MC point estimator wraps events to the
    # NEAREST replica, so near-horizon pixels (slant paths through distant
    # replicas) are unreachable for it, while quasi marches through the
    # periodic medium — quasi is the more faithful one there
    i = (np.arange(16) + 0.5) / 16 * 2 - 1
    px, py = np.meshgrid(i, i, indexing='ij')
    pr = np.hypot(px, py)
    sel = np.isfinite(img_q) & np.isfinite(img_m) & (img_m > 0) & (pr < 0.6)
    ratio = img_q[sel].mean() / img_m[sel].mean()
    assert ratio == pytest.approx(1.0, abs=0.08)
    np.testing.assert_allclose(img_q[sel], img_m[sel], rtol=0.25)


def test_quasi_slant_shadow_displacement():
    """Oblique sun: the cloud shadow in the surface term falls at
    z_cloud tan(SZA) downwind, not straight below the cloud (the sun path
    is marched through the 3D deck along its true slant)."""
    atm = atm_atmmod(np.concatenate([np.arange(0, 5.0, 0.5),
                                     np.arange(5.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm, ng=1)
    # 16-column domain, opaque cloud ribbon in x in [4, 8), dx = 0.5 km
    cld = cld_gen_hom(nx=16, ny=4, dx=0.5, dy=0.5, nz=2, cot0=40.0,
                      cer0=10.0, cloud_base=2.0, cloud_top=3.0)
    cld.extinction[:4] = 0.0
    cld.extinction[8:] = 0.0
    # solar azimuth 270 deg -> photons travel toward +x; SZA 45
    scn, st = build_scene(atm, ab, cld=cld, surface=0.3,
                          solar_zenith_angle=45.0, solar_azimuth_angle=270.0)
    # down-looking camera above the deck sees the surface
    cfg = SolverConfig(sensor_type='camera', cam_npix=48, cam_zloc=19000.0,
                       cam_the=180.0, cam_qmax=12.0)
    img = np.asarray(quasi_radiance(scn, st, cfg, n_steps=400))[..., 0]
    # profile across x (camera px maps to -x at the=180 via Ry(pi))
    prof = np.nanmean(img, axis=1)
    xpix = np.isfinite(prof)
    assert xpix.sum() > 20
    # darkest stretch of the surface = the shadow; cloud ribbon center is
    # x = 3.0 km of the 8 km domain; at SZA 45 the shadow center shifts by
    # z_mid tan(45) = 2.5 km downwind (+x), i.e. to x = 5.5 km
    lx = st.nx * st.dx / 1000.0
    # pixel -> ground x: equidistant fisheye around nadir, the=180 flips x
    npx = cfg.cam_npix
    ip = np.arange(npx)
    ang = ((ip + 0.5) / npx * 2 - 1) * np.deg2rad(cfg.cam_qmax)
    xg = ((0.5 * lx * 1000.0 - np.tan(ang) * cfg.cam_zloc)
          % (lx * 1000.0)) / 1000.0
    # the cloud ribbon spans x in [2, 4] km at z in [2, 3] km; its slant
    # shadow falls on x in [4, 7] km (umbra [5, 6]); the band [4.5, 6.5] is
    # NOT under the cloud, so a vertical-column sun path would leave it
    # fully sunlit — with the slant march it must be dark
    shadow = xpix & (xg > 4.5) & (xg < 6.5)
    sunlit = xpix & ((xg > 7.2) | (xg < 1.6))
    assert shadow.sum() > 5 and sunlit.sum() > 5
    assert np.nanmean(prof[shadow]) < 0.3 * np.nanmean(prof[sunlit]), \
        (np.nanmean(prof[shadow]), np.nanmean(prof[sunlit]))
