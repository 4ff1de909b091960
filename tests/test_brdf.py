"""Surface BRDF tests: LSRT and Cox-Munk typed surfaces in the kernel."""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.sfc import sfc_2d_gen, sfc_lambertian, sfc_ocean
from er3t_tpu.rtm import brdf
from er3t_tpu.rtm.scene import build_scene
from er3t_tpu.rtm.mc import SolverConfig
from er3t_tpu.rtm.mc_flight import run_transport_flight


@pytest.fixture(scope='module')
def atm_ab():
    atm = atm_atmmod(np.linspace(0, 20, 21))
    ab = abs_synthetic(650.0, atm)
    ab.abso_coef[:] = 0.0
    return atm, ab


def _rad(atm, ab, surface, sza=30.0, n=120000, seed=13):
    scn, st = build_scene(atm, ab, surface=surface, solar_zenith_angle=sza)
    cfg = SolverConfig(target='radiance', batch=1 << 13)
    tal = run_transport_flight(scn, st, cfg, n, seed=seed)
    return float(np.asarray(tal.rad)[0, 0] @ ab.weight) / int(tal.n_launched)


def test_lsrt_reduces_to_lambertian(atm_ab):
    atm, ab = atm_ab
    r_lam = _rad(atm, ab, sfc_lambertian(0.3), seed=13)
    lsrt = sfc_2d_gen(np.array([[[0.3, 0.0, 0.0]]]))
    r_lsrt = _rad(atm, ab, lsrt, seed=14)
    assert r_lsrt == pytest.approx(r_lam, rel=0.03)


def test_lsrt_kernels_finite_and_shaped():
    import jax.numpy as jnp
    mu = jnp.linspace(0.05, 1.0, 20)
    brf = brdf.lsrt_brf(0.2, 0.05, 0.05, mu, 0.9, jnp.cos(jnp.deg2rad(90.0)))
    assert np.all(np.isfinite(np.asarray(brf)))
    assert np.all(np.asarray(brf) >= 0)


def test_fresnel_limits():
    import jax.numpy as jnp
    r0 = float(brdf.fresnel_unpolarized(jnp.asarray(1.0), 1.33))
    assert r0 == pytest.approx(((1.33 - 1) / (1.33 + 1)) ** 2, rel=1e-3)
    r_graze = float(brdf.fresnel_unpolarized(jnp.asarray(0.01), 1.33))
    assert r_graze > 0.9


def test_coxmunk_glint_geometry(atm_ab):
    """Glint BRDF peaks at the specular geometry."""
    import jax.numpy as jnp
    sza = np.deg2rad(30.0)
    wi = (np.sin(sza), 0.0, -np.cos(sza))
    p = np.array([[0.0, 0.0, 1.34, 0.0, 0.02]])  # calm sea, no whitecaps
    js = jnp.asarray([2])
    pp = jnp.asarray(p)
    args = lambda ws: (js, pp, jnp.asarray([wi[0]]), jnp.asarray([wi[1]]),
                       jnp.asarray([wi[2]]), jnp.asarray([ws[0]]),
                       jnp.asarray([ws[1]]), jnp.asarray([ws[2]]))
    spec = (np.sin(sza), 0.0, np.cos(sza))      # specular direction
    off = (0.0, 0.0, 1.0)                        # nadir-up
    r_spec = float(brdf.brdf_eval(*args(spec))[0])
    r_off = float(brdf.brdf_eval(*args(off))[0])
    assert r_spec > 10 * r_off
    assert np.isfinite(r_spec)


def test_ocean_scene_radiance(atm_ab):
    """Full sim over a Cox-Munk ocean: small but nonzero nadir radiance,
    far below a bright Lambertian surface."""
    atm, ab = atm_ab
    ocean = sfc_ocean(wvl=650.0, u10=5.0)
    r_ocean = _rad(atm, ab, ocean, seed=15)
    r_land = _rad(atm, ab, sfc_lambertian(0.3), seed=16)
    assert 0.0 < r_ocean < 0.5 * r_land
