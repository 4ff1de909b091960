"""Per-constituent 3D optics: overlapping cloud + 3D aerosol each scatter
with their OWN phase function, selected at collision time by extinction
share (reference: per-constituent omg/apf blocks written by add_mca_3d_atm,
er3t/rtm/mca/mca_atm.py:340-370).

The scenes overlap a homogeneous cloud box (HG g=0.85 via the default
phase table) with a 3D aerosol of very different asymmetry (g=0.0 —
isotropic) so nadir backscatter radiance is dominated by the aerosol's
phase: a winner-takes-all "dominant phase" merge is off by a large factor.
"""

import numpy as np
import pytest

from er3t_tpu.pre.atm import atm_atmmod
from er3t_tpu.pre.abs import abs_synthetic
from er3t_tpu.pre.aer import Aerosol3D
from er3t_tpu.pre.cld import cld_gen_hom
from er3t_tpu.rtm import mc
from er3t_tpu.rtm.scene import build_scene
from er3t_tpu.rtm.mc import SolverConfig
from er3t_tpu.rtm.mc_flight import run_transport_flight


def _overlap_scene(g_aer=0.0, ssa_aer=1.0, ext_ratio=1.0, cot=0.5,
                   sza=30.0):
    atm = atm_atmmod(np.concatenate([np.arange(0, 5.0, 0.5),
                                     np.arange(5.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm, ng=2)
    cld = cld_gen_hom(nx=4, ny=4, nz=2, dx=1.0, dy=1.0, cot0=cot,
                      cer0=10.0, cloud_base=1.0, cloud_top=2.0)
    aer = Aerosol3D(extinction=np.asarray(cld.extinction) * ext_ratio,
                    ssa=ssa_aer, asy=g_aer)
    scn, st = build_scene(atm, ab, cld=cld, aer_3ds=[aer], surface=0.0,
                          solar_zenith_angle=sza)
    return scn, st, ab


def _mean_rad(tal):
    return float(np.asarray(tal.rad).sum() / int(tal.n_launched))


def test_scene_carries_slots():
    scn, st, _ = _overlap_scene()
    assert st.ns3 == 2
    assert scn.ssa3d.shape[-1] == 2 and scn.cf3d.shape[-1] == 2
    # equal extinction -> the first slot's cumulative fraction is 0.5
    cf = np.asarray(scn.cf3d)
    in_cld = np.asarray(scn.ext3d) > 0
    np.testing.assert_allclose(cf[in_cld][:, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(cf[..., -1], 1.0)


def test_single_scatter_closed_form():
    """Thin overlapping constituents, first scattering order only: nadir
    radiance ~ the single-scatter sum over constituents, which a
    dominant-phase merge misses by >30%."""
    scn, st, ab = _overlap_scene(cot=0.05, ext_ratio=1.0, g_aer=0.0)
    cfg = SolverConfig(target='radiance', batch=1 << 13, n_scat_max=1)
    tal = run_transport_flight(scn, st, cfg, 400_000, seed=3)
    got = _mean_rad(tal) / st.ng

    # first-order integral from the scene profiles (nadir sensor):
    #   I = sum_g/Ng int dz/mu0 sum_j k_j ssa_j P_j(mu_sc)/(4 pi)
    #       exp(-(1/mu0 + 1)(tau_sca + tau_abs_g)(z))
    # evaluated per layer (midpoint attenuation) — exact up to the layer
    # discretization and MC noise
    mu0 = float(np.cos(np.deg2rad(30.0)))
    mu_sc = -mu0                      # travel dir (uz=-mu0) -> upward sensor

    def p_hg(g, mu):
        return (1 - g * g) / (1 + g * g - 2 * g * mu) ** 1.5

    dz = np.diff(np.asarray(scn.z_lev))
    nz = st.nz
    sig_ray = np.asarray(scn.sig_ray)
    kabs = np.asarray(scn.kabs)       # (Nz, Ng)
    cf = np.asarray(scn.cf3d)
    ext = np.asarray(scn.ext3d)
    # scene is horizontally homogeneous: column profiles per constituent
    k_c = np.zeros(nz)
    k_a = np.zeros(nz)
    k_c[st.iz3l:st.iz3l + st.nz3] = (ext * cf[..., 0]).mean((0, 1))
    k_a[st.iz3l:st.iz3l + st.nz3] = (ext * (cf[..., 1] - cf[..., 0])).mean((0, 1))
    k_sca = sig_ray + k_c + k_a
    p_ray = 0.75 * (1 + mu_sc ** 2)

    def first_order(src_per_layer):
        acc = 0.0
        for g in range(st.ng):
            k_tot = k_sca + kabs[:, g]
            # tau above layer midpoints
            cum_top = np.concatenate([np.cumsum((k_tot * dz)[::-1])[::-1][1:],
                                      [0.0]])
            tau_mid = cum_top + 0.5 * k_tot * dz
            att = np.exp(-(1.0 / mu0 + 1.0) * tau_mid)
            acc += float(np.sum(src_per_layer * att * dz)) / mu0
        return acc / st.ng / (4 * np.pi)

    analytic = first_order(sig_ray * p_ray + k_c * p_hg(0.85, mu_sc)
                           + k_a * p_hg(0.0, mu_sc))
    # dominant-phase merge would have scattered the aerosol share with
    # g=0.85 too (equal scattering power -> either winner is wrong)
    wrong = first_order(sig_ray * p_ray
                        + (k_c + k_a) * p_hg(0.85, mu_sc))
    assert got == pytest.approx(analytic, rel=0.04)
    assert abs(got - wrong) > 0.3 * analytic


@pytest.mark.slow
def test_flight_matches_marching():
    """The two independent kernels implement the same per-constituent
    selection (thicker scene, multiple scattering orders)."""
    scn, st, _ = _overlap_scene(cot=4.0, ext_ratio=0.5, g_aer=0.0,
                                ssa_aer=0.9)
    cfg = SolverConfig(target='radiance', batch=1 << 13, n_scat_max=300)
    f = _mean_rad(run_transport_flight(scn, st, cfg, 300_000, seed=5))
    m = _mean_rad(mc.run_transport(scn, st, cfg, 300_000, seed=11))
    assert f == pytest.approx(m, rel=0.05)


def test_quasi_uses_slot_mixture():
    """The deterministic render evaluates the exact per-slot mixture: with
    an isotropic aerosol added, the camera image changes accordingly."""
    from er3t_tpu.rtm.quasi import quasi_radiance
    scn_a, st_a, _ = _overlap_scene(cot=1.0, ext_ratio=1.0, g_aer=0.0)
    cfg = SolverConfig(sensor_type='camera', cam_npix=16, cam_zloc=0.0,
                       cam_qmax=60.0)
    img = np.asarray(quasi_radiance(scn_a, st_a, cfg, n_steps=120))
    assert np.isfinite(img[np.isfinite(img)]).all()
    assert np.nanmax(img) > 0
