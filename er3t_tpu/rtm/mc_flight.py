"""Flight-based radiance transport kernel (the hot path).

TPU performance notes driving this design (measured on v5e):

* Random gathers cost ~6 ns/row regardless of row width — the dominant cost
  of any MC kernel on TPU.  This kernel performs ~3 gathers per iteration:
  one packed voxel fetch (ext, ssa, phase-row, column-cum-ext in one row),
  and two phase-LUT fetches at scattering events.
* Layer-indexed 1D lookups are eliminated: free paths through the layered
  majorant are inverted analytically with (B, Nz) *elementwise* cumulative
  sums (a whole multi-layer flight per iteration, vs one layer/event per
  iteration in the marching kernel) — clear-sky photons complete in ~3
  iterations instead of ~60.
* Per-g gas absorption and the vertical attenuation toward the sensor are
  evaluated in a single (B, 2 Nz) @ (2 Nz, 2 Ng+2) matmul — K and N both pad
  to the MXU's 128 anyway, so the sensor column block rides for free.
* Radiance is accumulated by local estimation at every scattering and
  surface event (cf. MCARaTS Wld_mtarget=2); there are no per-crossing
  tallies in radiance mode, which is what makes the flight formulation
  efficient.

The event-marching kernel in er3t_tpu.rtm.mc remains the flux path (fluxes
need per-crossing tallies) and the bitwise-reproducible reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mc import SolverConfig, Tallies, _sensor_dir
from .scene import SceneArrays, SceneStatic

__all__ = ['transport_flight', 'run_transport_flight']

_F = jnp.float32


def transport_flight(scene: SceneArrays, st: SceneStatic, cfg: SolverConfig,
                     n_photon: int, key: jax.Array) -> Tallies:
    assert cfg.target == 'radiance'
    B = cfg.batch
    nz, ng = st.nz, st.ng
    nxr, nyr = st.nx, st.ny
    lx, ly = st.nx * st.dx, st.ny * st.dy

    z_lev = scene.z_lev                         # (Nz+1,)
    dz_lay = z_lev[1:] - z_lev[:-1]
    sig_1d = scene.sig_ray + scene.sig_aer      # (Nz,)
    sig_maj = scene.sig_maj
    kabs_min = jnp.min(scene.kabs, axis=1)

    sx, sy, mu_s = _sensor_dir(cfg)
    nadir = abs(cfg.sensor_zenith) < 1e-3

    # ---- packed voxel table: [ext, ssa, apf, cum_ext_above_voxel_top] ----
    dz3 = dz_lay[st.iz3l:st.iz3l + st.nz3]
    cum3d_top = jnp.concatenate(
        [jnp.cumsum((scene.ext3d * dz3[None, None, :])[..., ::-1], axis=-1)[..., ::-1][..., 1:],
         jnp.zeros((st.nx, st.ny, 1), _F)], axis=-1)      # above each voxel's top
    vox = jnp.stack([scene.ext3d, scene.ssa3d,
                     scene.apf3d.astype(_F), cum3d_top], axis=-1)
    vox = vox.reshape(-1, 4)                               # (Nvox, 4)

    # ---- absorption/sensor matmul operator ----
    # input (B, 2 Nz): [trav (path per layer), above (vertical path above event)]
    # operator (2 Nz, 2 (Ng+1)): block diag of [kabs | kabs_min] twice
    kext = jnp.concatenate([scene.kabs, kabs_min[:, None]], axis=1)  # (Nz, Ng+1)
    sens_cols = jnp.concatenate([scene.kabs, sig_1d[:, None]], axis=1)
    zero = jnp.zeros_like(kext)
    kop = jnp.concatenate(
        [jnp.concatenate([kext, zero], axis=1),
         jnp.concatenate([jnp.zeros_like(sens_cols), sens_cols], axis=1)], axis=0)
    # columns: [0:Ng] labs-per-g, [Ng] labs-min, [Ng+1:2Ng+1] sensor abs, [2Ng+1] sensor sig

    n_u = scene.pt_mu.shape[1]
    n_m = scene.pt_p.shape[1]
    n_pf = scene.pt_mu.shape[0]
    pt_mu_flat = scene.pt_mu.reshape(-1)
    pt_p_flat = scene.pt_p.reshape(-1)

    sin0 = jnp.sqrt(jnp.maximum(1.0 - scene.mu0 ** 2, 0.0))
    u0x = sin0 * jnp.cos(scene.phi0)
    u0y = sin0 * jnp.sin(scene.phi0)
    u0z = -scene.mu0
    z_top = z_lev[-1]

    uniform_sfc = (st.nxs == 1 and st.nys == 1)
    psfc_flat = scene.psfc.reshape(-1, 5)

    if cfg.max_events:
        max_steps = cfg.max_events
    else:
        max_steps = int(np.ceil(n_photon / B + 1) * 400)

    def col_index(x, y, ix0, iy0):
        if st.ipa:
            return ix0, iy0
        ix = jnp.floor(x / st.dx).astype(jnp.int32) % st.nx
        iy = jnp.floor(y / st.dy).astype(jnp.int32) % st.ny
        return ix, iy

    def phase_eval(apf, mu):
        # nearest-bin lookup: one gather (gathers dominate TPU kernel cost;
        # the n_m-point grid keeps the quantization error ~1e-3)
        i0 = jnp.clip((((mu + 1.0) * 0.5 * (n_m - 1)) + 0.5).astype(jnp.int32),
                      0, n_m - 1)
        p_tab = jnp.take(pt_p_flat, apf * n_m + i0)
        return jnp.where(apf == 0, 0.75 * (1.0 + mu * mu), p_tab)

    def phase_sample(apf, u):
        i0 = jnp.clip((u * (n_u - 1) + 0.5).astype(jnp.int32), 0, n_u - 1)
        return jnp.take(pt_mu_flat, apf * n_u + i0)

    def rotate(ux, uy, uz, mu, psi):
        sin_t = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
        cp, sp = jnp.cos(psi), jnp.sin(psi)
        denom = jnp.sqrt(jnp.maximum(1.0 - uz * uz, 1e-12))
        straight = jnp.abs(uz) > 0.99999
        nx_ = sin_t * (ux * uz * cp - uy * sp) / denom + ux * mu
        ny_ = sin_t * (uy * uz * cp + ux * sp) / denom + uy * mu
        nz_ = -sin_t * cp * denom + uz * mu
        ux_n = jnp.where(straight, sin_t * cp, nx_)
        uy_n = jnp.where(straight, sin_t * sp, ny_)
        uz_n = jnp.where(straight, mu * jnp.sign(uz), nz_)
        norm = jax.lax.rsqrt(ux_n ** 2 + uy_n ** 2 + uz_n ** 2)
        return ux_n * norm, uy_n * norm, uz_n * norm

    def body(carry):
        (x, y, z, ux, uy, uz, wsc, labs, tau, nscat, alive,
         ix0, iy0, launched, step, rad) = carry
        k_iter = jax.random.fold_in(key, step)
        u = jax.random.uniform(k_iter, (B, 8), dtype=_F,
                               minval=1e-7, maxval=1.0 - 1e-7)

        # ---------------- respawn ----------------
        dead = ~alive
        quota = n_photon - launched
        order = jnp.cumsum(dead.astype(jnp.int32))
        spawn = dead & (order <= quota)
        launched = launched + jnp.sum(spawn.astype(jnp.int32))
        x = jnp.where(spawn, u[:, 0] * lx, x)
        y = jnp.where(spawn, u[:, 1] * ly, y)
        z = jnp.where(spawn, z_top, z)
        ux = jnp.where(spawn, u0x, ux)
        uy = jnp.where(spawn, u0y, uy)
        uz = jnp.where(spawn, u0z, uz)
        wsc = jnp.where(spawn, 1.0, wsc)
        labs = jnp.where(spawn[:, None], 0.0, labs)
        tau = jnp.where(spawn, -jnp.log(u[:, 2]), tau)
        nscat = jnp.where(spawn, 0, nscat)
        alive = alive | spawn
        ix0 = jnp.where(spawn, jnp.floor(x / st.dx).astype(jnp.int32) % st.nx, ix0)
        iy0 = jnp.where(spawn, jnp.floor(y / st.dy).astype(jnp.int32) % st.ny, iy0)

        # ---------------- analytic flight through the majorant ----------------
        uz_safe = jnp.where(jnp.abs(uz) < 1e-6, jnp.sign(uz + 1e-30) * 1e-6, uz)
        inv_uz = 1.0 / uz_safe
        s_lo = (z_lev[None, :-1] - z[:, None]) * inv_uz[:, None]   # (B, Nz)
        s_hi = (z_lev[None, 1:] - z[:, None]) * inv_uz[:, None]
        d_in = jnp.maximum(jnp.minimum(s_lo, s_hi), 0.0)
        d_out = jnp.maximum(jnp.maximum(s_lo, s_hi), 0.0)
        seg = jnp.maximum(d_out - d_in, 0.0)                       # (B, Nz)

        od = seg * sig_maj[None, :]
        going_up = uz > 0.0
        cum_up = jnp.cumsum(od, axis=1)
        cum_dn = jnp.cumsum(od[:, ::-1], axis=1)[:, ::-1]
        cum = jnp.where(going_up[:, None], cum_up, cum_dn)         # OD at layer exit
        total_od = jnp.where(going_up, cum_up[:, -1], cum_dn[:, 0])

        collided = alive & (tau < total_od)
        full = cum < tau[:, None]                                  # fully-traversed layers
        n_full = jnp.sum(full.astype(jnp.int32), axis=1)
        l_col = jnp.where(going_up, n_full, nz - 1 - n_full)
        l_col = jnp.clip(l_col, 0, nz - 1)
        oh_col = (jax.lax.broadcasted_iota(jnp.int32, (B, nz), 1)
                  == l_col[:, None]).astype(_F)
        sig_m = jnp.sum(oh_col * sig_maj[None, :], axis=1)
        cum_before = jnp.sum(od * full.astype(_F), axis=1)
        d_before = jnp.sum(seg * full.astype(_F), axis=1)
        s_col = d_before + (tau - cum_before) / sig_m
        s_star = jnp.where(collided, s_col, jnp.sum(seg, axis=1))
        s_star = jnp.where(alive, s_star, 0.0)

        # traveled path per layer (for gas absorption)
        trav = jnp.where(collided[:, None],
                         seg * full.astype(_F) + oh_col * (s_star - d_before)[:, None],
                         seg)

        if not st.ipa:
            x = (x + ux * s_star) % lx
            y = (y + uy * s_star) % ly
        z = jnp.clip(z + uz * s_star, 0.0, z_top)
        hit_sfc = alive & ~collided & ~going_up
        exit_toa = alive & ~collided & going_up
        z = jnp.where(hit_sfc, 0.0, z)

        # vertical path above the event point per layer (sensor attenuation)
        above = jnp.clip(z_lev[None, 1:] - jnp.maximum(z[:, None], z_lev[None, :-1]),
                         0.0, dz_lay[None, :]) / mu_s

        big = jnp.dot(jnp.concatenate([trav, above], axis=1), kop,
                      preferred_element_type=_F)                   # (B, 2Ng+2)
        labs = labs - big[:, :ng + 1]
        tau_sens_abs = big[:, ng + 1:2 * ng + 1]
        tau_sens_sig = big[:, 2 * ng + 1]

        # ---------------- collision: accept / scatter ----------------
        ix, iy = col_index(x, y, ix0, iy0)
        k3 = jnp.clip(l_col - st.iz3l, 0, st.nz3 - 1)
        in3 = (l_col >= st.iz3l) & (l_col < st.iz3l + st.nz3) if st.has_3d \
            else jnp.zeros(B, bool)
        vrow = vox[(ix * st.ny + iy) * st.nz3 + k3]                # (B, 4) one gather
        ext_c = jnp.where(in3, vrow[:, 0], 0.0)
        ssa_c = jnp.where(in3, vrow[:, 1], 1.0)
        apf_c = jnp.where(in3, vrow[:, 2].astype(jnp.int32), 0)
        # 3D extinction above the event along the vertical (nadir exact; for
        # slant sensors the same column is used — the dominant term).
        # Inside the region: cum above voxel top + partial voxel.  Below the
        # region: k3 clips to 0, so the gathered row gives the full column
        # (cum above voxel 0 + the whole of voxel 0).  Above: zero.
        z_hi_col = jnp.sum(oh_col * z_lev[None, 1:], axis=1)
        if st.has_3d:
            below3 = l_col < st.iz3l
            above3 = l_col >= st.iz3l + st.nz3
            tau3_above = jnp.where(
                above3, 0.0,
                jnp.where(below3, vrow[:, 3] + vrow[:, 0] * dz3[0],
                          vrow[:, 3] + vrow[:, 0] * (z_hi_col - z)))
        else:
            tau3_above = jnp.zeros(B, _F)
        tau3_above = tau3_above / mu_s

        sig_r = jnp.sum(oh_col * scene.sig_ray[None, :], axis=1)
        sig_a = jnp.sum(oh_col * scene.sig_aer[None, :], axis=1)
        sig_real = sig_r + sig_a + ext_c
        accept = collided & (u[:, 3] * sig_m < sig_real)

        pick = u[:, 4] * sig_real
        ch_ray = accept & (pick < sig_r)
        ch_aer = accept & ~ch_ray & (pick < sig_r + sig_a)
        ch_cld = accept & ~ch_ray & ~ch_aer
        apf = jnp.where(ch_cld, apf_c, jnp.where(ch_aer, n_pf - 1, 0))
        ssa_ev = jnp.where(ch_cld, ssa_c, 1.0)

        # ---------------- local estimates (volume + surface) ----------------
        mu_sc = ux * sx + uy * sy + uz * mu_s
        pval = phase_eval(apf, mu_sc)
        t_sens = jnp.exp(labs[:, :ng] - tau_sens_abs
                         - (tau_sens_sig + tau3_above)[:, None])
        c_vol = (wsc * ssa_ev * pval / (4.0 * jnp.pi * mu_s))[:, None] * t_sens

        if uniform_sfc:
            alb = psfc_flat[0, 0]
        else:
            sxi = jnp.floor(x / lx * st.nxs).astype(jnp.int32) % st.nxs
            syi = jnp.floor(y / ly * st.nys).astype(jnp.int32) % st.nys
            alb = psfc_flat[sxi * st.nys + syi, 0]
        c_sfc = (wsc * alb / jnp.pi)[:, None] * t_sens
        contrib = jnp.where(accept[:, None], c_vol,
                            jnp.where(hit_sfc[:, None], c_sfc, 0.0))

        if nxr * nyr == 1:
            # single-pixel image: deposit is a plain reduction, not a scatter
            rad = rad + jnp.sum(contrib, axis=0, keepdims=True)
        else:
            if st.ipa:
                pidx = ix0 * nyr + iy0
            else:
                xp = (x - sx / mu_s * z) % lx
                yp = (y - sy / mu_s * z) % ly
                pidx = (jnp.floor(xp / st.dx).astype(jnp.int32) % nxr) * nyr \
                    + jnp.floor(yp / st.dy).astype(jnp.int32) % nyr
            rad = rad.at[pidx].add(contrib)

        # ---------------- direction updates ----------------
        mu_new = phase_sample(apf, u[:, 5])
        psi = u[:, 6] * (2.0 * jnp.pi)
        ux_s, uy_s, uz_s = rotate(ux, uy, uz, mu_new, psi)
        # Lambertian surface reflection
        mu_r = jnp.sqrt(u[:, 5])
        sin_r = jnp.sqrt(jnp.maximum(1.0 - mu_r ** 2, 0.0))
        ux = jnp.where(accept, ux_s, jnp.where(hit_sfc, sin_r * jnp.cos(psi), ux))
        uy = jnp.where(accept, uy_s, jnp.where(hit_sfc, sin_r * jnp.sin(psi), uy))
        uz = jnp.where(accept, uz_s, jnp.where(hit_sfc, mu_r, uz))
        wsc = jnp.where(accept, wsc * ssa_ev, jnp.where(hit_sfc, wsc * alb, wsc))
        nscat = nscat + accept.astype(jnp.int32)
        tau = jnp.where(alive, -jnp.log(u[:, 7]), tau)

        # ---------------- termination / roulette ----------------
        alive = alive & ~exit_toa & (nscat < cfg.n_scat_max) & (wsc > 0.0)
        wmax = wsc * jnp.exp(labs[:, ng])
        need_rr = alive & (wmax < cfg.rr_wmin)
        p_surv = jnp.clip(wmax / cfg.rr_wmin, 0.0, 1.0)
        die = need_rr & (u[:, 3] > p_surv)
        wsc = jnp.where(need_rr & ~die, wsc / jnp.maximum(p_surv, 1e-12), wsc)
        alive = alive & ~die

        return (x, y, z, ux, uy, uz, wsc, labs, tau, nscat, alive,
                ix0, iy0, launched, step + 1, rad)

    def cond(carry):
        alive, launched, step = carry[10], carry[13], carry[14]
        return (jnp.any(alive) | (launched < n_photon)) & (step < max_steps)

    zB = jnp.zeros(B, _F)
    carry0 = (zB, zB, zB, zB, zB, zB, zB,
              jnp.zeros((B, ng + 1), _F), zB,
              jnp.zeros(B, jnp.int32), jnp.zeros(B, bool),
              jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32),
              jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
              jnp.zeros((nxr * nyr, ng), _F))
    out = jax.lax.while_loop(cond, body, carry0)
    return Tallies(rad=out[15].reshape(nxr, nyr, ng),
                   flux=jnp.zeros((1, 1, nz + 1, 3, ng), _F),
                   n_launched=out[13], n_steps=out[14])


def run_transport_flight(scene, static, cfg, n_photon, seed=0, rng_impl='rbg'):
    """Jitted entry point.

    ``rng_impl='rbg'`` uses the TPU's hardware RNG path (much cheaper per
    deviate than threefry inside the hot loop and equally adequate for MC
    sampling); pass 'threefry2x32' for cross-platform bitwise determinism.
    """
    fn = jax.jit(transport_flight, static_argnums=(1, 2, 3))
    try:
        key = jax.random.key(seed, impl=rng_impl)
    except Exception:
        key = jax.random.key(seed)
    return fn(scene, static, cfg, int(n_photon), key)
