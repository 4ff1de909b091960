"""Pallas TPU kernel: fused free-path inversion for the flight transport.

Fuses the per-iteration flight block of er3t_tpu.rtm.mc_flight — layer
segment lengths, cumulative majorant optical depth in traversal order,
collision-layer search, flight distance, and per-layer traveled paths —
into a single VMEM-resident kernel, including the uniform deviates from the
TPU hardware PRNG (pltpu.prng_random_bits).  One pass over lane state
replaces ~30 separate XLA elementwise ops and the threefry stream.

Used by the flight kernel when ``SolverConfig.use_pallas`` is set; the pure
XLA path remains the default (bitwise reference, CPU-compatible).  Both
paths are cross-checked in tests/test_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['flight_core', 'N_UNIFORMS']

_F = jnp.float32
N_UNIFORMS = 11
_LANE_BLOCK = 1024


def _kernel(seed_ref, z_ref, uz_ref, tau_ref, active_ref,
            z_lev_ref, sig_maj_ref,
            s_star_ref, l_col_ref, collided_ref, trav_ref, u_ref,
            *, nz: int, with_rng: bool):
    if with_rng:
        # hardware PRNG: per-block seed offset keeps streams independent
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits((_LANE_BLOCK, N_UNIFORMS))
        u01 = (pltpu.bitcast(bits, jnp.uint32) >> 8).astype(_F) * (1.0 / (1 << 24))
        u_ref[:] = jnp.clip(u01, 1e-7, 1.0 - 1e-7)
    else:
        # interpret/CPU path: the caller supplies deviates separately
        u_ref[:] = jnp.full((_LANE_BLOCK, N_UNIFORMS), 0.5, _F)

    z = z_ref[:].reshape(_LANE_BLOCK, 1)
    uz = uz_ref[:].reshape(_LANE_BLOCK, 1)
    tau = tau_ref[:].reshape(_LANE_BLOCK, 1)
    active = active_ref[:].reshape(_LANE_BLOCK, 1) > 0.5

    z_lo = z_lev_ref[0, :nz].reshape(1, nz)
    z_hi = z_lev_ref[0, 1:nz + 1].reshape(1, nz)
    sig = sig_maj_ref[0, :nz].reshape(1, nz)

    uz_safe = jnp.where(jnp.abs(uz) < 1e-6,
                        jnp.where(uz >= 0, 1e-6, -1e-6), uz)
    inv = 1.0 / uz_safe
    s_a = (z_lo - z) * inv
    s_b = (z_hi - z) * inv
    d_in = jnp.maximum(jnp.minimum(s_a, s_b), 0.0)
    d_out = jnp.maximum(jnp.maximum(s_a, s_b), 0.0)
    seg = jnp.maximum(d_out - d_in, 0.0)

    od = seg * sig
    going_up = uz > 0.0
    # Mosaic has no cumsum; running sums as small triangular matmuls (MXU)
    row = jax.lax.broadcasted_iota(jnp.int32, (nz, nz), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nz, nz), 1)
    tri_up = (row <= col).astype(_F)      # cum_up[:, j] = sum_{k<=j} od[:, k]
    tri_dn = (row >= col).astype(_F)
    cum_up = jnp.dot(od, tri_up, preferred_element_type=_F)
    cum_dn = jnp.dot(od, tri_dn, preferred_element_type=_F)
    cum = jnp.where(going_up, cum_up, cum_dn)
    total = jnp.where(going_up, cum_up[:, nz - 1:nz], cum_dn[:, 0:1])

    collided = active & (tau < total)
    full = cum < tau
    n_full = jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True)
    l_col = jnp.clip(jnp.where(going_up, n_full, nz - 1 - n_full), 0, nz - 1)
    lane_l = jax.lax.broadcasted_iota(jnp.int32, (_LANE_BLOCK, nz), 1)
    oh = (lane_l == l_col).astype(_F)
    sig_m = jnp.sum(oh * sig, axis=1, keepdims=True)
    cum_before = jnp.sum(od * full.astype(_F), axis=1, keepdims=True)
    d_before = jnp.sum(seg * full.astype(_F), axis=1, keepdims=True)
    s_col = d_before + (tau - cum_before) / sig_m
    s_star = jnp.where(collided, s_col, jnp.sum(seg, axis=1, keepdims=True))
    s_star = jnp.where(active, s_star, 0.0)

    trav = jnp.clip(jnp.minimum(d_out, s_star) - d_in, 0.0, seg)
    trav = jnp.where(active, trav, 0.0)

    s_star_ref[:] = s_star[:, 0]
    l_col_ref[:] = l_col[:, 0]
    collided_ref[:] = collided[:, 0].astype(jnp.int32)
    trav_ref[:, :] = trav


@functools.partial(jax.jit, static_argnames=('nz', 'interpret', 'with_rng'))
def flight_core(seed, z, uz, tau, active, z_lev, sig_maj, *, nz: int,
                interpret: bool = False, with_rng: bool = True):
    """Fused flight block.

    Parameters: (B,) lane state + (Nz+1,)/(Nz,) tables; ``seed`` scalar
    int32 (vary per transport iteration).  Returns
    (s_star (B,), l_col (B,) i32, collided (B,) i32, trav (B, Nz),
    uniforms (B, N_UNIFORMS)).
    """
    B = z.shape[0]
    assert B % _LANE_BLOCK == 0, 'batch must be a multiple of 1024'
    grid = (B // _LANE_BLOCK,)
    nz_pad = int(np.ceil((nz + 1) / 128.0) * 128)
    z_lev_p = jnp.zeros((1, nz_pad), _F).at[0, :nz + 1].set(z_lev)
    sig_p = jnp.zeros((1, nz_pad), _F).at[0, :nz].set(sig_maj)
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)

    lane_spec = pl.BlockSpec((_LANE_BLOCK,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec((1, nz_pad), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, nz=nz, with_rng=with_rng and not interpret),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  lane_spec, lane_spec, lane_spec, lane_spec,
                  table_spec, table_spec],
        out_specs=(lane_spec, lane_spec, lane_spec,
                   pl.BlockSpec((_LANE_BLOCK, nz), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((_LANE_BLOCK, N_UNIFORMS), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B,), _F),
                   jax.ShapeDtypeStruct((B,), jnp.int32),
                   jax.ShapeDtypeStruct((B,), jnp.int32),
                   jax.ShapeDtypeStruct((B, nz), _F),
                   jax.ShapeDtypeStruct((B, N_UNIFORMS), _F)),
        interpret=interpret,
    )(seed_arr, z, uz, tau, active.astype(_F), z_lev_p, sig_p)
    return out
