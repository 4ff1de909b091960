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
