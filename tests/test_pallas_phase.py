"""Pallas phase-pair kernel (rtm/pallas_phase.py) vs the XLA LUT gathers.

The kernel replaces the flight loop's two per-event phase-table gathers
with MXU one-hot selections (two-plane bf16) + a 128-lane shuffle — the
values must match the f32 tables to ~1e-5, and the full transport kernel
run with ``use_pallas=True`` must agree statistically with the XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from er3t_tpu.rtm.pallas_phase import pack_phase_tables, phase_pair


def test_phase_pair_matches_tables():
    rng = np.random.default_rng(0)
    NPF, NM, NU = 20, 4096, 8192
    pt_p = (rng.normal(size=(2 * NPF, NM)).astype(np.float32)) * 10
    pt_mu = rng.uniform(-1, 1, size=(NPF, NU)).astype(np.float32)
    packed, meta = pack_phase_tables(pt_p, pt_mu)
    B = 4096
    apf = rng.integers(0, NPF, B).astype(np.int32)
    first = rng.integers(0, 2, B).astype(bool)
    row_e = (apf + np.where(first, NPF, 0)).astype(np.int32)
    mu = rng.uniform(-1, 1, B).astype(np.float32)
    u = rng.uniform(0, 1, B).astype(np.float32)
    pe, mn = phase_pair(jnp.asarray(apf), jnp.asarray(row_e),
                        jnp.asarray(mu), jnp.asarray(u), packed, meta,
                        interpret=jax.default_backend() != 'tpu')
    ib = np.clip(((mu + 1.0) * 0.5 * (NM - 1) + 0.5).astype(np.int32),
                 0, NM - 1)
    iu = np.clip((u * (NU - 1) + 0.5).astype(np.int32), 0, NU - 1)
    ref_pe = pt_p[row_e, ib]
    ref_mn = pt_mu[apf, iu]
    assert np.abs(np.asarray(pe) - ref_pe).max() \
        <= 2e-5 * np.abs(ref_pe).max()
    assert np.abs(np.asarray(mn) - ref_mn).max() <= 2e-5


def test_phase_pair_nonaligned_bins():
    """Tables whose bin count is not a multiple of 128 are padded."""
    rng = np.random.default_rng(1)
    NPF, NM, NU = 3, 300, 500
    pt_p = rng.normal(size=(2 * NPF, NM)).astype(np.float32)
    pt_mu = rng.uniform(-1, 1, size=(NPF, NU)).astype(np.float32)
    packed, meta = pack_phase_tables(pt_p, pt_mu)
    B = 512
    apf = rng.integers(0, NPF, B).astype(np.int32)
    mu = rng.uniform(-1, 1, B).astype(np.float32)
    u = rng.uniform(0, 1, B).astype(np.float32)
    pe, mn = phase_pair(jnp.asarray(apf), jnp.asarray(apf),
                        jnp.asarray(mu), jnp.asarray(u), packed, meta,
                        interpret=jax.default_backend() != 'tpu')
    ib = np.clip(((mu + 1.0) * 0.5 * (NM - 1) + 0.5).astype(np.int32),
                 0, NM - 1)
    iu = np.clip((u * (NU - 1) + 0.5).astype(np.int32), 0, NU - 1)
    assert np.abs(np.asarray(pe) - pt_p[apf, ib]).max() <= 1e-4
    assert np.abs(np.asarray(mn) - pt_mu[apf, iu]).max() <= 2e-5


@pytest.mark.slow
def test_use_pallas_full_kernel_agrees():
    """Transport with use_pallas=True reproduces the XLA kernel's estimates
    (statistical agreement; ~1e-5 table rounding decorrelates individual
    trajectories)."""
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm, ng=4)
    cld = cld_gen_hem(nx=32, ny=32, nz=4, dx=0.2, dy=0.2, dz=0.5,
                      cloud_frac_tgt=0.3, radii=(0.4,), cot_scale=12.0,
                      cloud_base=0.5, seed=3)
    pha = pha_mie_wc(650.0)
    scn, st = build_scene(atm, ab, cld=cld, pha=pha, surface=0.05,
                          solar_zenith_angle=30.0, forward_trunc_deg=20.0)
    kw = dict(target='radiance', batch=1 << 12, n_scat_max=300, tile_size=16)
    a = run_transport_flight(scn, st, SolverConfig(**kw), 60000, seed=2)
    b = run_transport_flight(scn, st, SolverConfig(**kw, use_pallas=True),
                             60000, seed=2)
    ia = float(np.asarray(a.rad).sum() / int(a.n_launched))
    ib = float(np.asarray(b.rad).sum() / int(b.n_launched))
    assert ib == pytest.approx(ia, rel=0.02)
    # flux target runs under use_pallas too (pair kernel, sample side)
    kwf = dict(target='flux', batch=1 << 12, n_scat_max=300, tile_size=16,
               flux_per_column=False)
    fa = run_transport_flight(scn, st, SolverConfig(**kwf), 60000, seed=5)
    fb = run_transport_flight(scn, st, SolverConfig(**kwf, use_pallas=True),
                              60000, seed=5)
    sa = np.asarray(fa.flux)[0, 0, 0, :2].sum() / int(fa.n_launched)
    sb = np.asarray(fb.flux)[0, 0, 0, :2].sum() / int(fb.n_launched)
    assert sb == pytest.approx(sa, rel=0.03)
