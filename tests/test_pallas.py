"""Pallas flight-core kernel vs the pure-JAX reference block (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from er3t_tpu.rtm.pallas_flight import N_UNIFORMS, flight_core


def _reference(z, uz, tau, active, z_lev, sig_maj):
    """The XLA formulation from mc_flight, reproduced for comparison."""
    nz = sig_maj.size
    uz_safe = np.where(np.abs(uz) < 1e-6, np.where(uz >= 0, 1e-6, -1e-6), uz)
    inv = 1.0 / uz_safe
    s_a = (z_lev[None, :-1] - z[:, None]) * inv[:, None]
    s_b = (z_lev[None, 1:] - z[:, None]) * inv[:, None]
    d_in = np.maximum(np.minimum(s_a, s_b), 0.0)
    d_out = np.maximum(np.maximum(s_a, s_b), 0.0)
    seg = np.maximum(d_out - d_in, 0.0)
    od = seg * sig_maj[None, :]
    up = uz > 0
    cum_up = np.cumsum(od, axis=1)
    cum_dn = np.cumsum(od[:, ::-1], axis=1)[:, ::-1]
    cum = np.where(up[:, None], cum_up, cum_dn)
    total = np.where(up, cum_up[:, -1], cum_dn[:, 0])
    collided = active & (tau < total)
    full = cum < tau[:, None]
    n_full = full.sum(axis=1)
    l_col = np.clip(np.where(up, n_full, nz - 1 - n_full), 0, nz - 1)
    sig_m = sig_maj[l_col]
    cum_before = (od * full).sum(axis=1)
    d_before = (seg * full).sum(axis=1)
    s_col = d_before + (tau - cum_before) / sig_m
    s_star = np.where(collided, s_col, seg.sum(axis=1))
    s_star = np.where(active, s_star, 0.0)
    trav = np.clip(np.minimum(d_out, s_star[:, None]) - d_in, 0.0, seg)
    trav = np.where(active[:, None], trav, 0.0)
    return s_star, l_col, collided, trav


def test_flight_core_matches_reference():
    rng = np.random.default_rng(3)
    B, nz = 2048, 21
    z_lev = np.linspace(0.0, 20000.0, nz + 1).astype(np.float32)
    sig_maj = (rng.uniform(1e-6, 1e-2, nz)).astype(np.float32)
    z = rng.uniform(0.0, 20000.0, B).astype(np.float32)
    uz = rng.uniform(-1.0, 1.0, B).astype(np.float32)
    tau = rng.exponential(1.0, B).astype(np.float32)
    active = rng.uniform(0, 1, B) > 0.2

    s_star, l_col, collided, trav, u = flight_core(
        7, jnp.asarray(z), jnp.asarray(uz), jnp.asarray(tau),
        jnp.asarray(active), jnp.asarray(z_lev), jnp.asarray(sig_maj),
        nz=nz, interpret=True)

    rs, rl, rc, rt = _reference(z.astype(np.float64), uz.astype(np.float64),
                                tau.astype(np.float64), active,
                                z_lev.astype(np.float64),
                                sig_maj.astype(np.float64))
    np.testing.assert_allclose(np.asarray(s_star), rs, rtol=2e-4, atol=1e-2)
    same_layer = np.asarray(l_col) == rl
    assert same_layer.mean() > 0.995        # f32 boundary ties may differ
    np.testing.assert_array_equal(np.asarray(collided)[same_layer] > 0,
                                  rc[same_layer])
    np.testing.assert_allclose(np.asarray(trav)[same_layer],
                               rt[same_layer], rtol=2e-3, atol=1.0)

    u = np.asarray(u)
    assert u.shape == (B, N_UNIFORMS)  # hardware PRNG exercised on TPU only
