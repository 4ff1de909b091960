"""Pallas TPU kernel: fused phase-LUT pair lookup (eval + sample).

The two per-event phase-table gathers are the flight kernel's largest
per-iteration cost (1.87 ms/step of 4.73 at B=2^17 by ablation,
scripts/tpu_profile_ablate.py).  XLA lowers them to per-lane dynamic
gathers at ~7 ns/lane each; the TPU's MXU can instead *select* table rows
at matmul rate:

  flat index f = row * Nbins + bin  ->  block k = f >> 7, lane = f & 127
  one-hot(B, Krows) @ table(Krows, 128)   [MXU, bf16 x bf16 -> f32]
  take_along_axis(..., lane, axis=1)      [in-register 128-lane shuffle —
                                           the one dynamic-gather form
                                           Mosaic supports]

bf16 rounds the table values (8 mantissa bits), so each table is stored as
TWO bf16 planes (hi = bf16(x), lo = bf16(x - hi)); the one-hot is built
once per table and contracted with both planes — values are recovered to
~1e-5 relative error, preserving the XLA path's physics within test
tolerances (tests/test_pallas_phase.py).

Used by the flight kernel when ``SolverConfig.use_pallas`` is set; tables
are packed once per kernel build by :func:`pack_phase_tables`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ['pack_phase_tables', 'phase_pair', 'PackedPhase']

_F = jnp.float32
_BF = jnp.bfloat16


class PackedPhase(NamedTuple):
    """Two-plane bf16 packing of the eval/sample LUTs (block-major)."""
    pe_hi: jnp.ndarray       # (Ke, 128) eval table hi plane
    pe_lo: jnp.ndarray       # (Ke, 128) eval table lo plane
    ps_hi: jnp.ndarray       # (Ks, 128) sample table hi plane
    ps_lo: jnp.ndarray       # (Ks, 128) sample table lo plane


def _pack_one(tab):
    """(R, N) f32 -> ((R*ceil(N/128), 128) hi, lo) block-major planes.

    Pure-jnp (traceable): runs inside the jitted kernel build; XLA hoists
    the constant-folding when the table is a literal.
    """
    tab = jnp.asarray(tab, _F)
    r, n = tab.shape
    n_pad = int(np.ceil(n / 128.0) * 128)
    t = jnp.pad(tab, ((0, 0), (0, n_pad - n)))
    t = t.reshape(r * (n_pad // 128), 128)
    hi = t.astype(_BF)
    lo = (t - hi.astype(_F)).astype(_BF)
    return hi, lo, n_pad // 128


def pack_phase_tables(pt_p, pt_mu):
    """Pack the (2Npf, Nm) eval and (Npf, Nu) sample LUTs for the kernel.

    Returns (PackedPhase, meta) where meta carries the static dims.
    """
    pe_hi, pe_lo, nbl_e = _pack_one(pt_p)
    ps_hi, ps_lo, nbl_s = _pack_one(pt_mu)
    meta = dict(n_rows_e=int(pt_p.shape[0]), n_m=int(pt_p.shape[1]),
                nbl_e=nbl_e, n_rows_s=int(pt_mu.shape[0]),
                n_u=int(pt_mu.shape[1]), nbl_s=nbl_s)
    return PackedPhase(pe_hi=pe_hi, pe_lo=pe_lo, ps_hi=ps_hi, ps_lo=ps_lo), \
        meta


def _kernel(apf_ref, row_e_ref, mu_ref, u_ref,
            pe_hi_ref, pe_lo_ref, ps_hi_ref, ps_lo_ref,
            pe_out_ref, mu_out_ref, *, lb, n_m, nbl_e, ke, n_u, nbl_s, ks):
    apf = apf_ref[:]
    row_e = row_e_ref[:]
    mu = mu_ref[:]
    u = u_ref[:]

    ib = jnp.clip(((mu + 1.0) * (0.5 * (n_m - 1)) + 0.5).astype(jnp.int32),
                  0, n_m - 1)
    iu = jnp.clip((u * (n_u - 1) + 0.5).astype(jnp.int32), 0, n_u - 1)
    k_e = row_e * nbl_e + (ib >> 7)
    k_s = apf * nbl_s + (iu >> 7)

    def lookup(kk, lo_bits, hi_ref, lo_ref, kdim):
        k2 = kk.reshape(lb, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (lb, kdim), 1)
        oh = (cols == k2).astype(_BF)
        v = (jnp.dot(oh, hi_ref[:], preferred_element_type=_F)
             + jnp.dot(oh, lo_ref[:], preferred_element_type=_F))
        # in-row lane select: take_along_axis(axis=1) with full-shape indices
        # is the dynamic-gather form Mosaic lowers to the in-register
        # 128-lane shuffle (a masked 128-wide sum measured ~2x the VPU work);
        # every output lane selects the same source lane, column 0 is kept
        idx = jnp.broadcast_to((lo_bits & 127).reshape(lb, 1), (lb, 128))
        return jnp.take_along_axis(v, idx, axis=1)[:, 0]

    pe_out_ref[:] = lookup(k_e, ib, pe_hi_ref, pe_lo_ref, ke)
    mu_out_ref[:] = lookup(k_s, iu, ps_hi_ref, ps_lo_ref, ks)


@functools.partial(jax.jit,
                   static_argnames=('meta_t', 'lb', 'interpret'))
def _phase_pair(apf, row_e, mu_sc, u, packed: PackedPhase, *, meta_t,
                lb=2048, interpret=False):
    meta = dict(meta_t)
    B = apf.shape[0]
    ke = packed.pe_hi.shape[0]
    ks = packed.ps_hi.shape[0]
    lane = lambda dt: pl.BlockSpec((lb,), lambda i: (i,),
                                   memory_space=pltpu.VMEM)
    tspec = lambda rows: pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_kernel, lb=lb, n_m=meta['n_m'],
                          nbl_e=meta['nbl_e'], ke=ke,
                          n_u=meta['n_u'], nbl_s=meta['nbl_s'], ks=ks),
        grid=(B // lb,),
        in_specs=[lane(jnp.int32), lane(jnp.int32), lane(_F), lane(_F),
                  tspec(ke), tspec(ke), tspec(ks), tspec(ks)],
        out_specs=(lane(_F), lane(_F)),
        out_shape=(jax.ShapeDtypeStruct((B,), _F),
                   jax.ShapeDtypeStruct((B,), _F)),
        interpret=interpret,
    )
    return fn(apf, row_e, mu_sc, u,
              packed.pe_hi, packed.pe_lo, packed.ps_hi, packed.ps_lo)


def phase_pair(apf, row_e, mu_sc, u, packed: PackedPhase, meta,
               lb=2048, interpret=False):
    """Fused (P_eval, mu_new) lookups.

    ``apf``: (B,) int32 sample-table rows; ``row_e``: (B,) int32 eval-table
    rows (apf + Npf for TMS rows); ``mu_sc``/``u``: (B,) f32.  Rayleigh
    analytic substitution (apf == 0 eval) is the caller's job, as in the
    XLA path.
    """
    meta_t = tuple(sorted(meta.items()))
    lb = min(int(lb), int(apf.shape[0]))
    while apf.shape[0] % lb:      # grid = B // lb must cover every lane
        lb //= 2
    if lb < 256:
        # a small odd factor in B (e.g. 4097) collapses lb toward 1 —
        # thousands of serial (lb, K)@(K, 128) kernel invocations per
        # step, which effectively hangs the run (and long device calls
        # fault the tunnel).  Batch sizes are a user knob; fail loudly.
        raise ValueError(
            f'use_pallas needs batch divisible into >=256-lane blocks; '
            f'batch={int(apf.shape[0])} only divides down to lb={lb}. '
            f'Use a power-of-two batch or set use_pallas=False')
    return _phase_pair(apf, row_e, mu_sc, u, packed, meta_t=meta_t, lb=lb,
                       interpret=interpret)
