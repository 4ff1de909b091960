"""Surface BRDF evaluation and sampling for the transport kernels.

Implements the three surface types of the reference solver chain
(er3t/rtm/mca/mca_sfc.py:89-133):

* type 1 — Lambertian (param0 = albedo)
* type 2 — Cox-Munk "DSM" ocean (params = diffuse_alb, diffuse_frac,
  refrac_r, refrac_i, slope-variance; cf. er3t/pre/sfc/util.py:14-150):
  Gaussian-slope specular glint with Fresnel reflectance + Lambertian
  whitecap fraction
* type 4 — LSRT / RossThick-LiSparseR (params = f_iso, f_geo, f_vol;
  the MODIS MCD43 BRDF model)

Conventions: ``wi`` is the direction of *travel* of the incident photon
(pointing downward, wi_z < 0); ``ws`` the direction toward the sensor
(upward).  ``brdf_eval`` returns the BRDF value rho [1/sr]
(radiance = rho * irradiance); Lambertian rho = albedo / pi.

Sampling uses a cosine-weighted proposal for Lambertian/LSRT (weight
pi*rho(w')) and Gaussian-slope facet sampling with Fresnel weighting for
Cox-Munk.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['fresnel_unpolarized', 'lsrt_brf', 'coxmunk_rho', 'brdf_eval',
           'brdf_sample_dir_weight']

_PI = jnp.pi


def fresnel_unpolarized(cos_i, n_ratio):
    """Unpolarized Fresnel reflectance at cos(incidence) for index ratio n."""
    cos_i = jnp.clip(cos_i, 1e-6, 1.0)
    sin2_t = jnp.clip((1.0 - cos_i ** 2) / n_ratio ** 2, 0.0, 1.0)
    cos_t = jnp.sqrt(1.0 - sin2_t)
    rs = (cos_i - n_ratio * cos_t) / (cos_i + n_ratio * cos_t)
    rp = (n_ratio * cos_i - cos_t) / (n_ratio * cos_i + cos_t)
    return 0.5 * (rs * rs + rp * rp)


def _ross_thick(ci, cv, cphi, si, sv):
    cos_xi = jnp.clip(ci * cv + si * sv * cphi, -1.0, 1.0)
    xi = jnp.arccos(cos_xi)
    return ((0.5 * _PI - xi) * cos_xi + jnp.sin(xi)) / (ci + cv) - 0.25 * _PI


def _li_sparse_r(ci, cv, cphi, si, sv):
    # h/b = 2, b/r = 1 (MODIS MCD43 convention)
    ti = si / jnp.maximum(ci, 1e-6)
    tv = sv / jnp.maximum(cv, 1e-6)
    cos_xi = jnp.clip(ci * cv + si * sv * cphi, -1.0, 1.0)
    sec_i = 1.0 / jnp.maximum(ci, 1e-6)
    sec_v = 1.0 / jnp.maximum(cv, 1e-6)
    d2 = ti * ti + tv * tv - 2.0 * ti * tv * cphi
    sphi2 = jnp.clip(1.0 - cphi * cphi, 0.0, 1.0)
    cos_t = 2.0 * jnp.sqrt(jnp.maximum(d2, 0.0) + ti * ti * tv * tv * sphi2) \
        / (sec_i + sec_v)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    t = jnp.arccos(cos_t)
    big_o = (t - jnp.sin(t) * cos_t) * (sec_i + sec_v) / _PI
    return big_o - sec_i - sec_v + 0.5 * (1.0 + cos_xi) * sec_i * sec_v


def lsrt_brf(f_iso, f_geo, f_vol, mu_i, mu_v, cphi):
    """RossThick-LiSparseR bidirectional reflectance factor (unitless)."""
    mu_i = jnp.clip(mu_i, 1e-4, 1.0)
    mu_v = jnp.clip(mu_v, 1e-4, 1.0)
    si = jnp.sqrt(jnp.maximum(1.0 - mu_i ** 2, 0.0))
    sv = jnp.sqrt(jnp.maximum(1.0 - mu_v ** 2, 0.0))
    brf = f_iso + f_vol * _ross_thick(mu_i, mu_v, cphi, si, sv) \
        + f_geo * _li_sparse_r(mu_i, mu_v, cphi, si, sv)
    return jnp.clip(brf, 0.0, None)


def coxmunk_rho(wix, wiy, wiz, wsx, wsy, wsz, refrac_r, slope_var,
                diffuse_alb, diffuse_frac):
    """Cox-Munk glint BRDF [1/sr] + whitecap Lambertian part.

    rho = P(slopes) R_F / (4 mu_i mu_v cos^4 beta), Gaussian isotropic slope
    distribution with total variance ``slope_var`` (Cox & Munk 1954).
    """
    # facet normal ~ ws - wi (wi is travel direction, pointing down)
    hx, hy, hz = wsx - wix, wsy - wiy, wsz - wiz
    hn = jnp.sqrt(hx * hx + hy * hy + hz * hz)
    hn = jnp.maximum(hn, 1e-9)
    nx_, ny_, nz_ = hx / hn, hy / hn, hz / hn
    nz_ = jnp.maximum(nz_, 1e-4)
    sx = -nx_ / nz_
    sy = -ny_ / nz_
    p_slope = jnp.exp(-(sx * sx + sy * sy) / slope_var) / (_PI * slope_var)
    cos_spec = jnp.clip(-(wix * nx_ + wiy * ny_ + wiz * nz_), 1e-6, 1.0)
    rf = fresnel_unpolarized(cos_spec, refrac_r)
    mu_i = jnp.clip(-wiz, 1e-4, 1.0)
    mu_v = jnp.clip(wsz, 1e-4, 1.0)
    glint = p_slope * rf / (4.0 * mu_i * mu_v * nz_ ** 4)
    wc = diffuse_frac * diffuse_alb / _PI
    return (1.0 - diffuse_frac) * glint + wc


def brdf_eval(jsfc, psfc, wix, wiy, wiz, wsx, wsy, wsz):
    """BRDF value [1/sr] toward the sensor, dispatched on surface type."""
    mu_i = jnp.clip(-wiz, 1e-4, 1.0)
    mu_v = jnp.clip(wsz, 1e-4, 1.0)
    si = jnp.sqrt(jnp.maximum(1.0 - mu_i ** 2, 1e-12))
    sv = jnp.sqrt(jnp.maximum(1.0 - mu_v ** 2, 1e-12))
    # relative azimuth between incident (reversed) and view directions
    cphi = jnp.clip((-wix * wsx - wiy * wsy) / (si * sv), -1.0, 1.0)

    rho_lam = psfc[:, 0] / _PI
    rho_lsrt = lsrt_brf(psfc[:, 0], psfc[:, 1], psfc[:, 2], mu_i, mu_v, cphi) / _PI
    rho_cm = coxmunk_rho(wix, wiy, wiz, wsx, wsy, wsz,
                         psfc[:, 2], jnp.maximum(psfc[:, 4], 1e-4),
                         psfc[:, 0], psfc[:, 1])
    return jnp.where(jsfc == 2, rho_cm,
                     jnp.where(jsfc == 4, rho_lsrt, rho_lam))


def brdf_sample_dir_weight(jsfc, psfc, wix, wiy, wiz, u1, u2, u3, u4):
    """Sample a reflected direction and its weight multiplier.

    Lambertian: cosine direction, weight = albedo.
    LSRT: cosine direction, weight = pi * rho(w') = BRF(w') (unbiased
    importance sampling under the cosine proposal).
    Cox-Munk: with prob diffuse_frac a whitecap Lambertian bounce
    (weight diffuse_alb); else Gaussian-slope facet reflection with Fresnel
    weight; downward reflections are terminated (weight 0).
    """
    # cosine-weighted candidate
    mu_r = jnp.sqrt(u1)
    sin_r = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    psi = u2 * (2.0 * _PI)
    cx, cy, cz = sin_r * jnp.cos(psi), sin_r * jnp.sin(psi), mu_r

    # Cox-Munk: whitecap branch decided by u3, which is then rescaled to
    # stay uniform for the specular slope sampling
    whitecap = u3 < psfc[:, 1]
    u3s = jnp.clip((u3 - psfc[:, 1]) / jnp.maximum(1.0 - psfc[:, 1], 1e-6),
                   1e-9, 1.0)
    slope_var = jnp.maximum(psfc[:, 4], 1e-4)
    r = jnp.sqrt(-jnp.log(u3s) * slope_var)
    th = u4 * (2.0 * _PI)
    sx, sy = r * jnp.cos(th), r * jnp.sin(th)
    inv = 1.0 / jnp.sqrt(1.0 + sx * sx + sy * sy)
    nx_, ny_, nz_ = -sx * inv, -sy * inv, inv
    dot = wix * nx_ + wiy * ny_ + wiz * nz_
    rx = wix - 2.0 * dot * nx_
    ry = wiy - 2.0 * dot * ny_
    rz = wiz - 2.0 * dot * nz_
    cos_spec = jnp.clip(-dot, 1e-6, 1.0)
    rf = fresnel_unpolarized(cos_spec, psfc[:, 2])
    up_ok = rz > 1e-3
    # unbiased weight under Gaussian-slope sampling: the outgoing-direction
    # pdf is P(s)/(4 |wi.n| nz^3) (slope->normal Jacobian nz^3, normal->
    # reflection Jacobian 4|wi.n|), while f*mu_o = P(s) R_F/(4 mu_i nz^4),
    # so w = f*mu_o/pdf = R_F |wi.n| / (mu_i nz) — R_F alone is biased
    # O(10%) at large SZA (sampling must agree with coxmunk_rho eval)
    mu_i_cm = jnp.clip(-wiz, 1e-4, 1.0)
    w_cm_spec = jnp.where(up_ok, rf * cos_spec / (mu_i_cm * nz_), 0.0)
    # whitecap branch uses the cosine candidate
    w_cm = jnp.where(whitecap, psfc[:, 0], w_cm_spec)
    ux_cm = jnp.where(whitecap, cx, rx)
    uy_cm = jnp.where(whitecap, cy, ry)
    uz_cm = jnp.where(whitecap, cz, jnp.where(up_ok, rz, 1.0))

    # LSRT weight under cosine sampling
    mu_i = jnp.clip(-wiz, 1e-4, 1.0)
    si = jnp.sqrt(jnp.maximum(1.0 - mu_i ** 2, 1e-12))
    sv = jnp.sqrt(jnp.maximum(1.0 - mu_r ** 2, 1e-12))
    cphi = jnp.clip((-wix * cx - wiy * cy) / (si * sv), -1.0, 1.0)
    w_lsrt = lsrt_brf(psfc[:, 0], psfc[:, 1], psfc[:, 2], mu_i, mu_r, cphi)

    is_cm = jsfc == 2
    is_lsrt = jsfc == 4
    ux = jnp.where(is_cm, ux_cm, cx)
    uy = jnp.where(is_cm, uy_cm, cy)
    uz = jnp.where(is_cm, uz_cm, cz)
    w = jnp.where(is_cm, w_cm, jnp.where(is_lsrt, w_lsrt, psfc[:, 0]))
    return ux, uy, uz, jnp.clip(w, 0.0, None)
