"""All-sky (ground fisheye) camera sensor tests."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.rtm.scene import build_scene
from er3t_tpu.rtm.mc import SolverConfig
from er3t_tpu.rtm.mc_flight import run_transport_flight
from er3t_tpu.rtm.out import reduce_camera_radiance


def test_camera_clear_sky_radiance():
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_synthetic(650.0, atm)
    ab.abso_coef[:] = 0.0
    sza = 40.0
    scn, st = build_scene(atm, ab, surface=0.1, solar_zenith_angle=sza)
    cfg = SolverConfig(target='radiance', batch=1 << 12,
                       sensor_type='camera', cam_npix=16, cam_qmax=85.0)
    tal = run_transport_flight(scn, st, cfg, 150000, seed=21)
    out = reduce_camera_radiance(np.asarray(tal.rad), int(tal.n_launched),
                                 ab, np.cos(np.deg2rad(sza)),
                                 st.nx * st.dx * st.ny * st.dy, 85.0)
    rad = out['rad']
    assert rad.shape == (16, 16)
    # zenith Rayleigh sky brightness: order S * P/(4pi) * tau ~ 3e-3..1e-2
    zen = rad[8, 8]
    assert 1e-3 < zen < 2e-2
    # corners (outside the fisheye circle) are masked
    assert np.isnan(rad[0, 0])
    assert np.isfinite(rad[np.isfinite(rad)]).all()
