"""Flight-based radiance transport kernel (the hot path).

TPU performance notes driving this design (measured on v5e):

* Random gathers cost ~6 ns/row regardless of row width — the dominant cost
  of any MC kernel on TPU.  This kernel performs ~4 gathers per iteration:
  a per-tile majorant column, one packed voxel fetch (ext, ssa, phase-row,
  column-cum-ext in one row), and two nearest-bin phase-LUT fetches at
  scattering events — measured ~80% of the gather-throughput roof.
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
* Flux targets tally EVERY level crossing of an analytic flight in one
  iteration: per-crossing per-g weights form a (B, Nz+1, Ng) cumulative-
  absorption tensor contracted onto the tally with an MXU matmul (or a
  scatter-add for per-column tallies) — ~Nz fewer iterations than the
  marching kernel.

The kernel body is built by :func:`make_flight_kernel` so the same physics
drives two execution shapes:

* single chip: ``lax.while_loop`` until the photon budget drains
  (:func:`transport_flight`);
* multi-chip domain decomposition: fixed-K supersteps under ``shard_map``
  with an x-slab restriction — photons leaving the local slab freeze and are
  migrated by the driver in :mod:`er3t_tpu.dist.decomp`.

The event-marching kernel in er3t_tpu.rtm.mc remains as the independent
bitwise-reference flux path (SolverConfig.flux_engine='marching').
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mc import SolverConfig, Tallies, _sensor_dir
from .scene import SceneArrays, SceneStatic

__all__ = ['transport_flight', 'run_transport_flight', 'make_flight_kernel',
           'FlightCarry', 'SlabSpec']

_F = jnp.float32

def _coprime_stride(n: int) -> int:
    """Largest stride <= min(0.618 n, (2^32-1)//n) coprime to ``n``.

    Used as a bijective multiplicative shuffle ``cell = (i % n) * stride % n``
    computable in uint32 without overflow (stride * n < 2^32).
    """
    import math
    s = max(1, min(int(0.618 * n), (2 ** 32 - 1) // max(n, 1)))
    while s > 1 and math.gcd(s, n) != 1:
        s -= 1
    return s


@dataclasses.dataclass(frozen=True)
class SlabSpec:
    """Static description of an x-slab decomposition (None = whole domain)."""
    nx_global: int          # total columns across all devices
    nx_local: int           # columns owned by this device (== st.nx shard)


class FlightCarry(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    ux: jnp.ndarray
    uy: jnp.ndarray
    uz: jnp.ndarray
    wsc: jnp.ndarray
    labs: jnp.ndarray       # (Ng+1, B): per-g log-transmission + best case.
    #                         B lives in the LANE dim framework-wide: (d, B)
    #                         arrays waste no lanes, while (B, d) pads d to
    #                         128 (6-8x the HBM traffic at fusion boundaries)
    tau: jnp.ndarray
    nscat: jnp.ndarray
    alive: jnp.ndarray
    ix0: jnp.ndarray        # pinned column (birth for IPA; last low-order
    iy0: jnp.ndarray        # scatter for partial-3D)
    launched: jnp.ndarray   # () int32
    step: jnp.ndarray       # () int32
    rad: jnp.ndarray        # (Nxr*Nyr, Ng)
    plen: jnp.ndarray       # (B,) geometric pathlength [m]
    rad_pl: jnp.ndarray     # (Nxr*Nyr, Ng) pathlength-weighted deposits
    direct: jnp.ndarray     # (B,) bool — never scattered/reflected
    flux: jnp.ndarray       # (Nxf*Nyf*(Nz+1)*3, Ng) level-crossing tallies
    absorbed: jnp.ndarray   # (Nz, Ng) per-layer absorbed-energy tally
    #                         (direct heating-rate estimator, MCARaTS
    #                         Flx_mhrt role) — (1, 1) when unused


def make_flight_kernel(scene: SceneArrays, st: SceneStatic, cfg: SolverConfig,
                       n_photon: int, key: jax.Array,
                       slab: SlabSpec | None = None, x_off=None,
                       flux_w=None, rad_w=None, spawn_reserve: int = 0):
    """Build (body, cond, carry0) for the flight transport loop.

    With ``slab``: ``scene`` holds this device's x-shard; ``x_off`` is the
    traced global x-origin [m] of the shard; photons spawn inside the slab,
    coordinates stay global, and lanes that leave the slab freeze (the
    migration driver moves them between devices).

    ``flux_w``: optional (Nz+1, Ng) spectral weights (the reference's
    sol_fac*solar*weight*slit/norm factor chain, mca_out.py:311-328).  When
    given with per-column flux targets, crossings are contracted over g
    IN-KERNEL and tallied as scalars into a flat tally — a 5x cheaper
    scatter on TPU than 128-lane packed rows (scripts/tpu_scatter_bench.py),
    exactly equal to the post-hoc contraction because the factor chain is
    linear in the per-g tallies.

    ``rad_w``: optional (Ng,) spectral factors for radiance targets — the
    same exactness argument: image deposits are contracted over g in-kernel
    and scattered as SCALARS ((Ng,)-row image scatters measure ~2x the
    scalar cost in-loop, scripts/tpu_gather_probe2.py).  The returned image
    then has a singleton g axis holding the factor-contracted physical
    tally.  Incompatible with ``cfg.pathlength`` (the pathlength ratio uses
    the k-distribution weights, a different contraction).
    """
    radiance = cfg.target == 'radiance'
    B = cfg.batch
    nz, ng = st.nz, st.ng
    nx_loc = st.nx
    camera = cfg.sensor_type == 'camera'
    if camera:
        nxr = nyr = cfg.cam_npix
    elif slab is not None and radiance:
        # decomposed radiance deposits into the GLOBAL image (psum-reduced
        # by the driver): slant sensors and IPA project deposit pixels
        # across slab boundaries, and the tilted-column local estimate
        # needs only the event's LOCAL voxel column for its 3D attenuation
        # (tau3_above below), so a global tally is the only cross-slab
        # coupling local estimation has
        nxr, nyr = slab.nx_global, st.ny
    else:
        nxr, nyr = st.nx, st.ny
    # flux targets: tally every level crossing of each analytic flight in
    # one step (the marching kernel in rtm.mc advances one crossing per
    # iteration).  Per-crossing per-g weights form a (B, Nz+1, Ng) tensor
    # contracted onto the tally with an MXU matmul.
    nxf, nyf = (st.nx, st.ny) if (not radiance and cfg.flux_per_column) \
        else (1, 1)
    nlev = nz + 1
    per_col = nxf * nyf > 1
    # domain-average flux runs also tally absorbed energy per (layer, g)
    # directly (the Flx_mhrt heating-rate estimator; see the tally site)
    tally_absorbed = (not radiance) and not per_col
    kx = int(cfg.flux_kcross) if per_col else 0
    scalar_flux = per_col and kx > 0 and flux_w is not None
    if scalar_flux:
        flux_w = jnp.asarray(flux_w, _F)
    scalar_rad = radiance and rad_w is not None
    if scalar_rad:
        assert not cfg.pathlength, 'rad_w is incompatible with pathlength'
        rad_w = jnp.asarray(rad_w, _F).reshape(ng)
    if slab is None:
        nx_glob = st.nx
        x_off = jnp.zeros((), _F)
    else:
        nx_glob = slab.nx_global
    lx_loc = nx_loc * st.dx
    lx_glob = nx_glob * st.dx
    ly = st.ny * st.dy

    z_lev = scene.z_lev
    dz_lay = z_lev[1:] - z_lev[:-1]
    # decomposed runs: only the deck z-range [iz3l, iz3l+nz3) is sharded;
    # above its top the 1D medium is replicated, so (except for per-column
    # flux tallies, which must accumulate into the local columns) lanes may
    # roam across slabs there — see the `active` and `clamp_s` blocks
    zd_top = z_lev[st.iz3l + st.nz3]
    roam_above_deck = slab is not None and not per_col
    n_aer = scene.sig_aer.shape[1]
    sig_aer_tot = jnp.sum(scene.sig_aer, axis=1)
    sig_1d = scene.sig_ray + sig_aer_tot
    sig_maj = scene.sig_maj
    kabs_min = jnp.min(scene.kabs, axis=1)

    # per-tile majorant columns (MCARaTS Atm_mcs super-voxels, mca_inp.py:236):
    # each (tile x tile)-column tile carries its own (Nz,) scattering majorant,
    # so photons in clear tiles of a broken-cloud layer stop paying the
    # cloud-peak null-collision rate.  Flights clamp at tile faces — exact,
    # because surviving a clamped flight leaves the remaining optical-depth
    # target Exp(1)-distributed again (memorylessness) and tau is resampled
    # every iteration.
    tile = cfg.tile_size
    use_tiles = (tile > 0) and st.has_3d
    if use_tiles:
        ntx = -(-nx_loc // tile)
        nty = -(-st.ny // tile)
        ext_p = jnp.pad(scene.ext3d, ((0, ntx * tile - nx_loc),
                                      (0, nty * tile - st.ny), (0, 0)))
        ext_t = ext_p.reshape(ntx, tile, nty, tile, st.nz3).max(axis=(1, 3))
        maj_tile = jnp.concatenate([
            jnp.broadcast_to(sig_1d[:st.iz3l], (ntx, nty, st.iz3l)),
            sig_1d[st.iz3l:st.iz3l + st.nz3][None, None, :] + ext_t,
            jnp.broadcast_to(sig_1d[st.iz3l + st.nz3:],
                             (ntx, nty, nz - st.iz3l - st.nz3)),
        ], axis=-1)
        maj_tab = jnp.maximum(maj_tile, 1e-12).reshape(ntx * nty, nz)
    else:
        ntx = nty = 1
        maj_tab = None

    sx, sy, mu_s = _sensor_dir(cfg)

    # packed voxel table: [ext_tot, cum_ext_above_voxel_top, col_tot,
    # then per 3D constituent slot s: (cf_s, ssa_s, apf_s)] — the slots
    # carry each constituent's own ssa/phase row, selected at collision
    # time by extinction share (reference: per-constituent omg/apf blocks,
    # mca_atm.py:340-370)
    ns3 = st.ns3
    dz3 = dz_lay[st.iz3l:st.iz3l + st.nz3]
    cum3d_top = jnp.concatenate(
        [jnp.cumsum((scene.ext3d * dz3[None, None, :])[..., ::-1], axis=-1)[..., ::-1][..., 1:],
         jnp.zeros((nx_loc, st.ny, 1), _F)], axis=-1)
    col_tot3d = cum3d_top[..., 0] + scene.ext3d[..., 0] * dz3[0] \
        if st.nz3 > 0 else jnp.zeros((nx_loc, st.ny))
    slot_fields = []
    for s in range(ns3):
        slot_fields += [scene.cf3d[..., s], scene.ssa3d[..., s],
                        scene.apf3d[..., s].astype(_F)]
    vox = jnp.stack(
        [scene.ext3d, cum3d_top,
         jnp.broadcast_to(col_tot3d[..., None], scene.ext3d.shape)]
        + slot_fields, axis=-1).reshape(-1, 3 + 3 * ns3)

    # absorption + sensor-attenuation matmul operator (see module docstring)
    kext = jnp.concatenate([scene.kabs, kabs_min[:, None]], axis=1)
    sens_cols = jnp.concatenate([scene.kabs, sig_1d[:, None]], axis=1)
    kop = jnp.concatenate(
        [jnp.concatenate([kext, jnp.zeros_like(sens_cols)], axis=1),
         jnp.concatenate([jnp.zeros_like(kext), sens_cols], axis=1)], axis=0)

    n_u = scene.pt_mu.shape[1]
    n_m = scene.pt_p.shape[1]
    n_pf = scene.pt_mu.shape[0]
    pt_mu_flat = scene.pt_mu.reshape(-1)
    pt_p_flat = scene.pt_p.reshape(-1)
    # Pallas phase-pair route: the two per-event LUT gathers become MXU
    # one-hot selections + a 128-lane shuffle (er3t_tpu.rtm.pallas_phase);
    # tables are packed once per kernel build
    use_ppair = cfg.use_pallas
    if use_ppair:
        from .pallas_phase import pack_phase_tables
        ph_packed, ph_meta = pack_phase_tables(scene.pt_p, scene.pt_mu)

    sin0 = jnp.sqrt(jnp.maximum(1.0 - scene.mu0 ** 2, 0.0))
    u0x = sin0 * jnp.cos(scene.phi0)
    u0y = sin0 * jnp.sin(scene.phi0)
    u0z = -scene.mu0
    z_top = z_lev[-1]
    # decomposed launch precompensation: the deterministic solar descent
    # from TOA to deck top drifts (z_top - zd_top) tan(sza) horizontally —
    # at SZA 30 over a ~17 km clear column that is ~10 km, i.e. several
    # slab widths, so uncompensated spawns would freeze+migrate at their
    # very first deck entry almost every launch (measured: the migration
    # queue starves the launch quota).  Shifting each device's launch
    # window upwind by that drift keeps first deck entries local; the
    # shifted windows still partition the domain, so the global launch
    # distribution stays exactly uniform.  Photons that Rayleigh-scatter
    # above the deck (few %) roam/migrate as before.
    if slab is not None and roam_above_deck and not st.ipa:
        x_drift0 = u0x * (z_top - zd_top) / jnp.maximum(scene.mu0, 1e-6)
    else:
        x_drift0 = jnp.zeros((), _F)

    if camera:
        cam_z = jnp.asarray(cfg.cam_zloc, _F)
        # world -> camera frame (camera axis = Rz(phi) Ry(the) zhat);
        # shared Euler helper so quasi and MC pixel mappings stay aligned
        from .scene import camera_rotation
        cam_rot = camera_rotation(cfg.cam_phi, cfg.cam_the, cfg.cam_psi).T

    uniform_sfc = (st.nxs == 1 and st.nys == 1)
    # packed surface table: [jsfc, p0..p4] — one gather per surface event
    sfc_tab = jnp.concatenate(
        [scene.jsfc.reshape(-1, 1).astype(_F), scene.psfc.reshape(-1, 5)],
        axis=1)

    def local_ix(x):
        return jnp.clip(jnp.floor((x - x_off) / st.dx).astype(jnp.int32),
                        0, nx_loc - 1)

    def col_index(x, y, ix0, iy0, nscat):
        """Voxel column for gathers; honors IPA and partial-3D pinning."""
        ixl = local_ix(x)
        iyl = jnp.floor(y / st.dy).astype(jnp.int32) % st.ny
        if st.ipa:
            return ix0, iy0
        if cfg.p3d_order > 0:
            pin = nscat >= cfg.p3d_order
            return jnp.where(pin, ix0, ixl), jnp.where(pin, iy0, iyl)
        return ixl, iyl

    ablate = set(cfg.ablate.split(',')) if cfg.ablate else set()

    cam_importance = (camera and cfg.cam_importance_sigma > 0
                      and radiance and slab is None)
    strat_launch = (cfg.qmc_launch or cfg.launch_coherent) \
        and not cam_importance
    if strat_launch:
        # Stratified-jitter launch: the photon's launch index maps bijectively
        # (multiplicative shuffle + random per-run offset) onto a grid cell of
        # the local domain, and the position is jittered uniformly inside the
        # cell.  Per-pixel launch counts are then within +-1 per n_cell block
        # instead of Poisson — the dominant noise term of clear-sky pixels
        # under local estimation — and the estimator is unbiased (the random
        # offset makes the +-1 remainder cells uniform; the jitter is fresh
        # RNG).  Stratification can only reduce the variance of the
        # launch-count component; the reference's MCARaTS launches uniformly.
        n_cell = int(nx_loc) * int(st.ny)
        q_stride = jnp.uint32(_coprime_stride(n_cell))
        q_ncell = jnp.uint32(n_cell)
        # 2^30 - 1 lies outside both per-iteration fold_in domains
        # (c.step < max_steps << 2^30 - 1, and the splitting stream uses
        # c.step + 2^30), so the offset key can never collide with an
        # iteration's deviate stream
        q_off = jax.random.randint(jax.random.fold_in(key, 0x3FFFFFFF), (),
                                   0, n_cell, dtype=jnp.int32).astype(jnp.uint32)
        if cfg.launch_coherent:
            # linear index->cell map: same per-block bijection (any bijection
            # preserves the stratification guarantee), but consecutive lanes
            # spawn in ADJACENT columns — their voxel/majorant/surface
            # gathers and image deposits then hit neighboring HBM rows
            q_stride = jnp.uint32(1)

    def phase_eval(apf, mu, first=None):
        """P(mu) local-estimate row; ``first`` (the photon has never
        scattered or reflected — the ``direct`` flag, same criterion as
        rtm.mc) selects the TMS half of the table — exact Nakajima-Tanaka
        single scattering under delta-truncation (see pre/pha.py
        PhaseTable.p_tms)."""
        if 'phase' in ablate:
            return 0.75 * (1.0 + mu * mu)
        row = apf if first is None else apf + jnp.where(first, n_pf, 0)
        i0 = jnp.clip((((mu + 1.0) * 0.5 * (n_m - 1)) + 0.5).astype(jnp.int32),
                      0, n_m - 1)
        p_tab = jnp.take(pt_p_flat, row * n_m + i0)
        return jnp.where(apf == 0, 0.75 * (1.0 + mu * mu), p_tab)

    def phase_sample(apf, u):
        if 'phase' in ablate:
            return u * 2.0 - 1.0
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

    def body(c: FlightCarry) -> FlightCarry:
        k_iter = jax.random.fold_in(key, c.step)
        # (14, B): the deviate index in the sublane dim, B in the lane dim
        # (a (B, 14) array would pad 14 -> 128 lanes, 9x the HBM traffic)
        u = jax.random.uniform(k_iter, (14, B), dtype=_F,
                               minval=1e-7, maxval=1.0 - 1e-7)

        if cfg.split_wmax > 0:
            # ---- photon splitting / weight window (MCARaTS Pho_wmax/wfac,
            # mca_inp.py:193-199) ----
            # Lanes whose best-case weight exceeds the window split in two:
            # the j-th dead lane receives a copy of the j-th splitting lane
            # (stable-sort pairing), both at half weight.  Total weight is
            # preserved (unbiased); the two copies evolve independently from
            # fresh per-lane randomness, reducing the variance of
            # deep-scattering contributions per launched photon.
            wmax_c = c.wsc * jnp.exp(c.labs[ng])
            want = c.alive & (wmax_c > cfg.split_wmax)
            dead0 = ~c.alive
            order = jnp.argsort(jnp.where(want, 0, 1).astype(jnp.int32),
                                stable=True)
            n_cp = jnp.minimum(jnp.sum(want.astype(jnp.int32)),
                               jnp.sum(dead0.astype(jnp.int32)))
            drank = jnp.cumsum(dead0.astype(jnp.int32)) - 1
            src = order[jnp.clip(drank, 0, B - 1)]
            do_cp = dead0 & (drank < n_cp)
            srank = jnp.cumsum(want.astype(jnp.int32)) - 1
            halve = want & (srank < n_cp)
            wsc_h = jnp.where(halve, c.wsc * 0.5, c.wsc)

            def _cp(f):
                return jnp.where(do_cp, f[src], f)

            u_sp = jax.random.uniform(
                jax.random.fold_in(key, c.step + (1 << 30)), (B,), dtype=_F,
                minval=1e-7, maxval=1.0 - 1e-7)
            c = c._replace(
                x=_cp(c.x), y=_cp(c.y), z=_cp(c.z), ux=_cp(c.ux),
                uy=_cp(c.uy), uz=_cp(c.uz),
                wsc=jnp.where(do_cp, wsc_h[src], wsc_h),
                labs=jnp.where(do_cp[None, :], c.labs[:, src], c.labs),
                tau=jnp.where(do_cp, -jnp.log(u_sp), c.tau),
                nscat=_cp(c.nscat), ix0=_cp(c.ix0), iy0=_cp(c.iy0),
                plen=_cp(c.plen),
                direct=jnp.where(do_cp, c.direct[src], c.direct),
                alive=c.alive | do_cp)

        # ---------------- respawn (into the local slab) ----------------
        dead = ~c.alive
        quota = n_photon - c.launched
        order = jnp.cumsum(dead.astype(jnp.int32))
        # spawn_reserve (decomposed runs): keep a few dead lanes unspawned
        # each iteration so the migration swap always has landing capacity —
        # otherwise the launch quota races migration for every freed slot
        # and emigrant lanes starve frozen at the slab faces
        spawn = dead & (order > spawn_reserve) \
            & (order - spawn_reserve <= quota) if spawn_reserve \
            else dead & (order <= quota)
        launched = c.launched + jnp.sum(spawn.astype(jnp.int32))
        if strat_launch:
            # rank among SPAWNING lanes (order is the rank among dead lanes;
            # the first spawn_reserve dead lanes are withheld, so subtract)
            idx = (c.launched + order - spawn_reserve - 1).astype(jnp.uint32)
            # (idx % n + off) * stride % n: bijective per n_cell block;
            # stride*n < 2^32 so the uint32 product never wraps
            cell = ((idx + q_off) % q_ncell) * q_stride % q_ncell
            cx = (cell // jnp.uint32(st.ny)).astype(_F)
            cy = (cell % jnp.uint32(st.ny)).astype(_F)
            x_sp = x_off + (cx + u[0]) * st.dx
            y_sp = (cy + u[1]) * st.dy
        else:
            x_sp = x_off + u[0] * lx_loc
            y_sp = u[1] * ly
        w_sp = jnp.ones(B, _F)
        if cam_importance:
            # importance-sampled launch toward the camera column (see
            # SolverConfig.cam_importance_sigma): 50/50 mixture of uniform
            # and a wrapped isotropic Gaussian at the camera; the launch
            # weight p_uniform / p_mixture (<= 2) makes the estimator
            # exactly unbiased.  Deviates come from a dedicated substream
            # (u[12]/u[13] serve the aperture sampler in the SAME
            # iteration a spawned lane first collides in).
            u_ci = jax.random.uniform(
                jax.random.fold_in(key, c.step + (1 << 29)), (3, B),
                dtype=_F, minval=1e-7, maxval=1.0 - 1e-7)
            sig_ci = cfg.cam_importance_sigma
            cam_x0 = cfg.cam_xpos * lx_glob
            cam_y0 = cfg.cam_ypos * ly
            r_g = sig_ci * jnp.sqrt(-2.0 * jnp.log(u_ci[0]))
            th_g = (2.0 * jnp.pi) * u_ci[1]
            pick_g = u_ci[2] < 0.5
            x_sp = jnp.where(pick_g, (cam_x0 + r_g * jnp.cos(th_g))
                             % lx_glob, x_sp)
            y_sp = jnp.where(pick_g, (cam_y0 + r_g * jnp.sin(th_g))
                             % ly, y_sp)
            # wrapped-Gaussian pdf: nearest 3 images per axis (exact to
            # machine precision for sigma <= domain/4)
            inv_s2 = 1.0 / (2.0 * sig_ci * sig_ci)
            nrm = 1.0 / (np.sqrt(2.0 * np.pi) * sig_ci)

            def _pdf_w(d, period):
                d = (d + 0.5 * period) % period - 0.5 * period
                return sum(jnp.exp(-(d + k * period) ** 2 * inv_s2)
                           for k in (-1.0, 0.0, 1.0)) * nrm
            p_g = _pdf_w(x_sp - cam_x0, lx_glob) * _pdf_w(y_sp - cam_y0, ly)
            p_u = 1.0 / (lx_glob * ly)
            w_sp = p_u / (0.5 * p_u + 0.5 * p_g)
        x = jnp.where(spawn, (x_sp - x_drift0) % lx_glob, c.x)
        y = jnp.where(spawn, y_sp, c.y)
        z = jnp.where(spawn, z_top, c.z)
        ux = jnp.where(spawn, u0x, c.ux)
        uy = jnp.where(spawn, u0y, c.uy)
        uz = jnp.where(spawn, u0z, c.uz)
        wsc = jnp.where(spawn, w_sp, c.wsc)
        labs = jnp.where(spawn[None, :], 0.0, c.labs)
        tau = jnp.where(spawn, -jnp.log(u[2]), c.tau)
        nscat = jnp.where(spawn, 0, c.nscat)
        alive = c.alive | spawn
        ix0 = jnp.where(spawn, local_ix(x), c.ix0)
        iy0 = jnp.where(spawn, jnp.floor(y / st.dy).astype(jnp.int32) % st.ny, c.iy0)
        plen = jnp.where(spawn, 0.0, c.plen)
        direct = spawn | c.direct

        # Lanes outside the local slab freeze until migrated — EXCEPT above
        # the 3D deck top, where the atmosphere is horizontally homogeneous
        # 1D data replicated on every device: those lanes roam freely and
        # only clamp when a descending flight would enter the deck z-range
        # inside a remote slab (see the clamp_s construction below).  Full
        # clamping at every face crossing made near-horizontal high-altitude
        # photons take thousands of clamp+migrate cycles to escape (a
        # single-device run does it in ONE flight) — the dominant
        # decomposition overhead on broken-cloud scenes.  Per-column flux
        # targets keep strict clamping: their crossing tallies index the
        # LOCAL column and may not be accumulated while out of slab.
        if slab is None:
            active = alive
        else:
            in_slab = (x >= x_off) & (x < x_off + lx_loc)
            if roam_above_deck:
                active = alive & (in_slab | (z > zd_top))
            else:
                active = alive & in_slab

        # ---------------- analytic flight through the majorant ----------------
        going_up = uz > 0.0
        uz_safe = jnp.where(jnp.abs(uz) < 1e-6, jnp.sign(uz + 1e-30) * 1e-6, uz)
        inv_uz = 1.0 / uz_safe
        if use_tiles:
            # only the deck z-range [iz3l, iz3l+nz3) varies horizontally,
            # so gather the majorant of the tile at the flight's *deck
            # entry point* and (below) clamp only at tile-face crossings
            # that occur while inside the deck — flights that stay in 1D
            # layers run unclamped whatever tiles they overfly
            zd_lo, zd_hi = z_lev[st.iz3l], z_lev[st.iz3l + st.nz3]
            t1 = (zd_lo - z) * inv_uz
            t2 = (zd_hi - z) * inv_uz
            sd_in = jnp.maximum(jnp.minimum(t1, t2), 0.0)
            sd_out = jnp.maximum(jnp.maximum(t1, t2), 0.0)
            xe_u = x + ux * sd_in
            ye_u = y + uy * sd_in
            offx = xe_u - xe_u % lx_glob   # ray-frame unwrap offsets
            offy = ye_u - ye_u % ly
            ixm, iym = col_index(xe_u % lx_glob, ye_u % ly, ix0, iy0, nscat)
            # row-gather (the fast gather form) then one transpose into the
            # (Nz, B) frame the flight core runs in
            sig_col = maj_tab[(ixm // tile) * nty + (iym // tile)].T
        else:
            sig_col = sig_maj[:, None]
        s_lo = (z_lev[:-1, None] - z[None, :]) * inv_uz[None, :]
        s_hi = (z_lev[1:, None] - z[None, :]) * inv_uz[None, :]
        d_in = jnp.maximum(jnp.minimum(s_lo, s_hi), 0.0)
        d_out = jnp.maximum(jnp.maximum(s_lo, s_hi), 0.0)
        seg = jnp.maximum(d_out - d_in, 0.0)

        od = seg * sig_col
        cum_up = jnp.cumsum(od, axis=0)
        cum_dn = jnp.cumsum(od[::-1], axis=0)[::-1]
        cum = jnp.where(going_up[None, :], cum_up, cum_dn)
        total_od = jnp.where(going_up, cum_up[-1], cum_dn[0])
        s_exit = jnp.sum(seg, axis=0)

        # clampability must be known BEFORE the forcing draw: a forced
        # flight that later gets clamped (tile or slab face) would reach
        # the face with the truncated-exponential survival probability
        # instead of the true exp(-tau_face) — a systematic bias for all
        # post-clamp transport.  Forcing is therefore restricted to
        # flights that cannot clamp (exactness is preserved: unclampable
        # thin upward flights either collide or escape to TOA).
        clampable = jnp.zeros(B, bool)
        if use_tiles and not st.ipa:
            txp, typ = ixm // tile, iym // tile
            tx_lo = x_off + (txp * tile) * st.dx + offx
            tx_hi = x_off + jnp.minimum((txp + 1) * tile, nx_loc) * st.dx + offx
            ty_lo = (typ * tile) * st.dy + offy
            ty_hi = jnp.minimum((typ + 1) * tile, st.ny) * st.dy + offy
            sfx = jnp.where(ux > 1e-7, (tx_hi - x) / ux,
                            jnp.where(ux < -1e-7, (tx_lo - x) / ux, 3e38))
            sfy = jnp.where(uy > 1e-7, (ty_hi - y) / uy,
                            jnp.where(uy < -1e-7, (ty_lo - y) / uy, 3e38))
            s_tile = jnp.maximum(jnp.minimum(sfx, sfy), 0.0)
            can_clamp = active & (s_tile < sd_out)
            if cfg.p3d_order > 0:
                can_clamp = can_clamp & (nscat < cfg.p3d_order)
            if slab is not None:
                # the tile-majorant gather clamps local_ix at the slab edge,
                # so for a roaming lane whose deck entry lies in a REMOTE
                # slab the tile faces are bogus — such flights must take the
                # slab clamp at deck entry instead (a bogus tclamp superseded
                # it and could spin with zero progress forever; measured as
                # zombie lanes pinning the decomposed loop at max_rounds)
                xe_w = xe_u % lx_glob
                can_clamp = can_clamp & (xe_w >= x_off) \
                    & (xe_w < x_off + lx_loc)
            clampable = clampable | can_clamp
        if slab is not None:
            def _s_face_from(xq):
                # distance to the first slab-face crossing, valid for a
                # point inside the slab
                return jnp.where(
                    ux > 1e-7, (x_off + lx_loc - xq) / ux,
                    jnp.where(ux < -1e-7, (x_off - xq) / ux, 3e37))

            if roam_above_deck:
                # flights starting above the deck top clamp only at deck
                # ENTRY: at the entry point itself when it lies in a remote
                # slab (freeze + migrate there), else at the first face
                # crossing after the local entry; ascending flights above
                # the deck never clamp.  In-deck/below starts keep the
                # plain face clamp (z is monotone along a flight, so a
                # descending flight below deck top cannot re-enter the
                # roaming region).
                starts_above = z > zd_top
                s_t = jnp.maximum(jnp.where(uz < 0, (zd_top - z) * inv_uz,
                                            3e37), 0.0)
                x_t = (x + ux * s_t) % lx_glob
                in_slab_t = (x_t >= x_off) & (x_t < x_off + lx_loc)
                clamp_s = jnp.where(
                    starts_above,
                    jnp.where(uz < 0,
                              jnp.where(in_slab_t,
                                        s_t + jnp.maximum(_s_face_from(x_t),
                                                          0.0),
                                        s_t),
                              3e37),
                    jnp.maximum(_s_face_from(x), 0.0))
            else:
                clamp_s = jnp.maximum(_s_face_from(x), 0.0)
            clampable = clampable | (clamp_s < s_exit)

        if per_col and kx > 0:
            # crossing-count clamp is a clamp too (see zclamp below)
            n_below = jnp.sum((z_lev[None, :] < z[:, None]).astype(jnp.int32), axis=1)
            n_le = jnp.sum((z_lev[None, :] <= z[:, None]).astype(jnp.int32), axis=1)
            # surface-reflected flights (z exactly 0, going up) must count
            # the level-0 upward crossing: only zclamp restarts may skip
            # their starting level (it was tallied by the clamped flight),
            # and those never restart at z=0 (zclamp is interior-only)
            up0k = active & going_up & (z <= 0.0)
            n_le = jnp.where(up0k, 0, n_le)
            n_to_exit = jnp.where(going_up, nz + 1 - n_le, n_below)
            clampable = clampable | (n_to_exit > kx)

        if cfg.cf_dtau > 0:
            # collision forcing (MCARaTS Rad_cf_*, Flx_cf_dtau): thin
            # UPWARD flights collide from a truncated exponential with
            # weight 1-exp(-OD).  Exact for radiance because the
            # alternative outcome (TOA escape) contributes nothing; for
            # flux targets the escape outcome's level crossings (and the
            # TOA exit) ARE tallied, deterministically, with the escape
            # probability exp(-OD) as weight (see the tally section).
            # Downward flights keep their natural surface hit.
            thin = active & going_up & (total_od < cfg.cf_dtau) & ~clampable
            surv = -jnp.expm1(-total_od)
            tau_f = -jnp.log1p(-u[11] * surv)
            tau_use = jnp.where(thin, tau_f, tau)
        else:
            thin = jnp.zeros(B, bool)
            surv = jnp.ones(B, _F)
            tau_use = tau
        collided = active & (tau_use < total_od)
        full = cum < tau_use[None, :]
        n_full = jnp.sum(full.astype(jnp.int32), axis=0)
        l_col = jnp.clip(jnp.where(going_up, n_full, nz - 1 - n_full), 0, nz - 1)
        oh_col = (jax.lax.broadcasted_iota(jnp.int32, (nz, B), 0)
                  == l_col[None, :]).astype(_F)
        sig_m = jnp.sum(oh_col * sig_col, axis=0)
        cum_before = jnp.sum(od * full.astype(_F), axis=0)
        d_before = jnp.sum(seg * full.astype(_F), axis=0)
        s_col = d_before + (tau_use - cum_before) / sig_m
        s_star = jnp.where(collided, s_col, jnp.sum(seg, axis=0))
        s_star = jnp.where(active, s_star, 0.0)

        if slab is not None:
            # clamp flights at clamp_s (slab face / remote deck entry — see
            # the clamp_s construction above): the voxel data beyond lives
            # on another device, so the lane advances to the clamp point,
            # freezes, and is migrated by the driver
            clamped = active & (clamp_s < s_star)
            s_star = jnp.minimum(s_star, clamp_s)
            collided = collided & ~clamped
        else:
            clamped = jnp.zeros(B, bool)

        if use_tiles and not st.ipa:
            # clamp flights at the faces of the deck-entry tile, only while
            # inside the deck z-range; disabled for pinned lanes (partial-3D
            # high orders), whose medium no longer varies with position.
            # Faces are unwrapped into the ray frame (offx/offy, computed
            # above with the clampability test) so periodic wrapping cannot
            # produce a face behind the origin.
            tclamp = can_clamp & (s_tile < s_star)
            s_star = jnp.where(tclamp, s_tile, s_star)
            collided = collided & ~tclamp
            clamped = clamped & ~tclamp
        else:
            tclamp = jnp.zeros(B, bool)

        if kx > 0:
            # ---- crossing-count clamp (per-column flux only) ----
            # A flight's level crossings are contiguous in level, so the k-th
            # crossing level is an affine function of the first.  Clamping
            # the flight at its kx-th crossing bounds the per-column tally
            # scatter to kx rows/lane/iteration instead of Nz+1 — the
            # 480x480 per-column scatter was ~200x slower than the radiance
            # path (BENCH_NOTES round 1).  Exact by memorylessness: tau is
            # resampled every iteration, like tile and slab clamps.
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (B, kx), 1)
            lev_k = jnp.where(going_up[:, None], n_le[:, None] + k_iota,
                              n_below[:, None] - 1 - k_iota)
            lev_ok = (lev_k >= 0) & (lev_k <= nz)
            lev_c = jnp.clip(lev_k, 0, nz)
            oh_k = (jax.lax.broadcasted_iota(jnp.int32, (B, kx, nlev), 2)
                    == lev_c[:, :, None]).astype(_F)
            s_cross_all = (z_lev[None, :] - z[:, None]) * inv_uz[:, None]
            s_k = jnp.einsum('bkl,bl->bk', oh_k, s_cross_all)
            z_k = jnp.einsum('bkl,l->bk', oh_k, z_lev)
            # the level-0 crossing of a surface-reflected flight sits at
            # s_k == 0 — admit it alongside the strictly-positive ones
            pos_ok = (s_k > 0.0) | (up0k[:, None] & (k_iota == 0))
            # stop at the kx-th crossing when it lies strictly inside the
            # flight and strictly inside the domain (boundary crossings
            # terminate the flight through the usual hit_sfc/exit_toa path)
            s_zc = s_k[:, -1]
            zclamp = active & lev_ok[:, -1] & (lev_k[:, -1] > 0) \
                & (lev_k[:, -1] < nz) & (s_zc > 0.0) & (s_zc < s_star)
            s_star = jnp.where(zclamp, s_zc, s_star)
            collided = collided & ~zclamp
            clamped = clamped & ~zclamp
            tclamp = tclamp & ~zclamp
        else:
            zclamp = jnp.zeros(B, bool)

        if cfg.cf_dtau > 0:
            # forcing weight applies once the collision survived clamping,
            # BEFORE local estimates / crossing tallies (the deposit carries
            # it); wsc_pre feeds the deterministic escape branch below
            wsc_pre = wsc
            wsc = jnp.where(thin & collided, wsc * surv, wsc)

        # traveled path per layer, valid for collided/exit/clamped alike
        trav = jnp.clip(jnp.minimum(d_out, s_star[None, :]) - d_in, 0.0, seg)
        trav = jnp.where(active[None, :], trav, 0.0)   # (Nz, B)

        flux = c.flux
        absorbed = c.absorbed
        term = active & ~collided & ~clamped & ~tclamp & ~zclamp
        if not radiance:
            # flux tallies are scatter/MXU-bound; one transpose each into
            # the (B, .) frame their contractions want is in the noise
            trav_b = trav.T
            seg_b = seg.T
            labs_bg = labs[:ng].T
        if not radiance and kx > 0:
            # ---- compact per-crossing tally (kx rows/lane; zclamp above
            # guarantees every crossing of the flight fits the window) ----
            final_k = (zclamp[:, None] & (k_iota == kx - 1)) \
                | ((term & ~going_up)[:, None] & (lev_k == 0)) \
                | ((term & going_up)[:, None] & (lev_k == nz))
            tally_k = active[:, None] & lev_ok & pos_ok \
                & ((s_k < s_star[:, None]) | final_k)
            # gas absorption along the flight to crossing k: layers fully
            # traversed before it (below lev_k going up / above going down),
            # contracted on the MXU — no (B, Nz, Ng) materialization
            l_iota3 = jax.lax.broadcasted_iota(jnp.int32, (B, kx, nz), 2)
            mask_k = jnp.where(going_up[:, None, None],
                               l_iota3 < lev_c[:, :, None],
                               l_iota3 >= lev_c[:, :, None]).astype(_F)
            a_k = jnp.dot((mask_k * trav_b[:, None, :]).reshape(B * kx, nz),
                          scene.kabs,
                          preferred_element_type=_F).reshape(B, kx, ng)
            w_k = (wsc[:, None, None] * jnp.exp(labs_bg[:, None, :] - a_k)
                   * tally_k[:, :, None].astype(_F))
            if cfg.cf_dtau > 0:
                # deterministic escape branch of forced flights: every
                # remaining crossing (incl. the TOA exit; forced lanes are
                # unclampable, so all fit the kx window) weighted by the
                # escape probability exp(-OD), absorption over the FULL
                # flight path (seg, not the collision-truncated trav)
                a2_k = jnp.dot((mask_k * seg_b[:, None, :]).reshape(B * kx, nz),
                               scene.kabs,
                               preferred_element_type=_F).reshape(B, kx, ng)
                esc_k = thin[:, None] & lev_ok & pos_ok
                w_k = w_k + ((wsc_pre * jnp.exp(-total_od))[:, None, None]
                             * jnp.exp(labs_bg[:, None, :] - a2_k)
                             * esc_k[:, :, None].astype(_F))
            xc = (x[:, None] + ux[:, None] * s_k) % lx_glob
            yc = (y[:, None] + uy[:, None] * s_k) % ly
            if st.ipa:
                ixc = jnp.broadcast_to(ix0[:, None], (B, kx))
                iyc = jnp.broadcast_to(iy0[:, None], (B, kx))
            else:
                ixc = local_ix(xc)
                iyc = jnp.floor(yc / st.dy).astype(jnp.int32) % st.ny
            chi = jnp.where(going_up, 2, jnp.where(direct, 0, 1))[:, None]
            pidx = (((ixc * nyf + iyc) * nlev + lev_c) * 3 + chi).reshape(-1)
            if scalar_flux:
                # in-kernel spectral contraction: one scalar per crossing
                # into a flat tally (see make_flight_kernel docstring)
                f_k = jnp.einsum('bkl,lg->bkg', oh_k, flux_w,
                                 preferred_element_type=_F)
                w_s = jnp.sum(w_k * f_k, axis=2)               # (B, kx)
                flux = flux.at[pidx].add(w_s.reshape(-1))
            else:
                # 8-fold row packing (see rtm.mc): 128-lane tally rows
                sub = jax.nn.one_hot(pidx % 8, 8, dtype=_F)
                upd = sub[:, :, None] * w_k.reshape(B * kx, 1, ng)
                flux = flux.at[pidx // 8].add(upd.reshape(B * kx, 8 * ng))
        elif not radiance:
            # ---- level-crossing flux tallies for the whole flight ----
            # crossing distances to every level; the terminal surface/TOA
            # crossing (s_star exactly on the boundary) is added explicitly
            # so f32 rounding cannot drop or double-count it
            s_cross = (z_lev[None, :] - z[:, None]) * inv_uz[:, None]
            lev_iota = jax.lax.broadcasted_iota(jnp.int32, (B, nlev), 1)
            # surface-reflected flights start EXACTLY at z=0 going up: their
            # level-0 upward crossing has s_cross == 0 and must be included
            # explicitly (it was silently dropped — f_up at the surface
            # level tallied 0 under any reflecting surface; caught by the
            # direct absorbed-energy tally's energy closure, round 4)
            up0 = active & going_up & (z <= 0.0)
            crossed = (active[:, None] & (s_cross > 0.0)
                       & (s_cross < s_star[:, None])) \
                | ((term & ~going_up)[:, None] & (lev_iota == 0)) \
                | ((term & going_up)[:, None] & (lev_iota == nz)) \
                | (up0[:, None] & (lev_iota == 0))
            # gas absorption accumulated before each crossing: going up,
            # layers below the level are complete; going down, layers above
            ee = trav_b[:, :, None] * scene.kabs[None, :, :]    # (B,Nz,Ng)
            pre = jnp.cumsum(ee, axis=1)
            a_up = jnp.concatenate([jnp.zeros((B, 1, ng), _F), pre], axis=1)
            a_dn = pre[:, -1:, :] - a_up
            a_x = jnp.where(going_up[:, None, None], a_up, a_dn)
            w_x = (wsc[:, None, None]
                   * jnp.exp(labs_bg[:, None, :] - a_x)
                   * crossed[:, :, None].astype(_F))            # (B,Nlev,Ng)
            if cfg.cf_dtau > 0:
                # deterministic escape branch of forced flights (see the
                # compact path above): absorption over the FULL flight path
                ee_f = seg_b[:, :, None] * scene.kabs[None, :, :]
                a_up_f = jnp.concatenate(
                    [jnp.zeros((B, 1, ng), _F), jnp.cumsum(ee_f, axis=1)],
                    axis=1)
                # forced surface-reflected flights start EXACTLY at z=0
                # going up: admit their level-0 crossing (s_cross == 0)
                # like the collided path's up0 — otherwise the escape
                # share exp(-OD) of f_up at the surface level is dropped
                esc = thin[:, None] & (
                    (s_cross > 0.0)
                    | ((going_up & (z <= 0.0))[:, None] & (lev_iota == 0)))
                w_x = w_x + ((wsc_pre * jnp.exp(-total_od))[:, None, None]
                             * jnp.exp(labs_bg[:, None, :] - a_up_f)
                             * esc[:, :, None].astype(_F))
            if nxf * nyf == 1 and tally_absorbed:
                # ---- direct absorbed-energy tally (MCARaTS Flx_mhrt,
                # mca_inp.py:129-152): per layer, weight at path entry
                # minus weight at path exit — the layer's absorbed energy
                # in closed form per flight.  Estimates the ABSORBED
                # quantity itself instead of differencing two noisy level
                # fluxes (VERDICT r3 item 10); layers the flight does not
                # traverse contribute exactly zero (ee = 0).
                hb = jnp.where(going_up[:, None, None],
                               a_up[:, :-1, :], a_dn[:, 1:, :])  # (B,Nz,Ng)
                ab_l = (wsc[:, None, None]
                        * jnp.exp(labs_bg[:, None, :] - hb)
                        * -jnp.expm1(-ee)
                        * active[:, None, None].astype(_F))
                if cfg.cf_dtau > 0:
                    # forced flights: deterministic escape branch absorbs
                    # along the FULL path with the escape weight
                    hb_f = jnp.where(going_up[:, None, None],
                                     a_up_f[:, :-1, :],
                                     (a_up_f[:, -1:, :] - a_up_f)[:, 1:, :])
                    ab_l = ab_l + ((wsc_pre * jnp.exp(-total_od))
                                   [:, None, None]
                                   * jnp.exp(labs_bg[:, None, :] - hb_f)
                                   * -jnp.expm1(-ee_f)
                                   * thin[:, None, None].astype(_F))
                absorbed = absorbed + jnp.einsum(
                    'blg->lg', ab_l, preferred_element_type=_F)
            if nxf * nyf == 1:
                chm = jnp.stack([~going_up & direct, ~going_up & ~direct,
                                 going_up], axis=0).astype(_F)  # (3, B)
                part = jnp.einsum('cb,blg->lcg', chm, w_x,
                                  preferred_element_type=_F)
                pad = flux.size // (8 * ng) * 8 - nlev * 3
                flux = flux + jnp.concatenate(
                    [part.reshape(nlev * 3, ng),
                     jnp.zeros((pad, ng), _F)]).reshape(-1, 8 * ng)
            else:
                xc = (x[:, None] + ux[:, None] * s_cross) % lx_glob
                yc = (y[:, None] + uy[:, None] * s_cross) % ly
                if st.ipa:
                    ixc = jnp.broadcast_to(ix0[:, None], (B, nlev))
                    iyc = jnp.broadcast_to(iy0[:, None], (B, nlev))
                else:
                    ixc = local_ix(xc)
                    iyc = jnp.floor(yc / st.dy).astype(jnp.int32) % st.ny
                chi = jnp.where(going_up, 2, jnp.where(direct, 0, 1))[:, None]
                pidx = (((ixc * nyf + iyc) * nlev + lev_iota) * 3
                        + chi).reshape(-1)
                # 8-fold row packing (see rtm.mc): 128-lane tally rows
                sub = jax.nn.one_hot(pidx % 8, 8, dtype=_F)
                upd = sub[:, :, None] * w_x.reshape(B * nlev, 1, ng)
                flux = flux.at[pidx // 8].add(upd.reshape(B * nlev, 8 * ng))

        if not st.ipa:
            x = jnp.where(active, (x + ux * s_star) % lx_glob, x)
            if slab is not None:
                # nudge clamped lanes robustly past the clamp point along
                # the travel direction (f32-safe epsilon: s_star rounding
                # must not leave a lane exactly on a face, which would
                # make slab ownership ambiguous)
                eps_x = 1e-3 * st.dx
                x = jnp.where(clamped,
                              (x + jnp.sign(ux) * eps_x) % lx_glob, x)
            y = jnp.where(active, (y + uy * s_star) % ly, y)
            if use_tiles:
                # place tile-clamped lanes robustly past the crossed face
                cxt = tclamp & (sfx <= sfy)
                cyt = tclamp & (sfy <= sfx)
                xf = jnp.where(ux > 0, tx_hi, tx_lo)
                yf = jnp.where(uy > 0, ty_hi, ty_lo)
                x = jnp.where(cxt, (xf + jnp.sign(ux) * 1e-3 * st.dx)
                              % lx_glob, x)
                y = jnp.where(cyt, (yf + jnp.sign(uy) * 1e-3 * st.dy) % ly, y)
        z = jnp.where(active, jnp.clip(z + uz * s_star, 0.0, z_top), z)
        if slab is not None and roam_above_deck:
            # descending flights clamped at deck entry must land AT (not
            # one f32 ulp above) the deck top: a lane left fractionally
            # above stays an active roamer and re-clamps with an
            # infinitesimal step forever (measured as zombie lanes holding
            # the decomposed while-loop at max_rounds)
            z = jnp.where(clamped & starts_above & (uz < 0.0),
                          jnp.minimum(z, zd_top), z)
        if kx > 0:
            # crossing-count-clamped lanes stop EXACTLY on the level: the
            # strict (<) / non-strict (<=) level counts above then place the
            # next flight's first crossing one level further in the travel
            # direction, so f32 rounding can neither drop nor double-count
            # the boundary crossing
            z = jnp.where(zclamp, z_k[:, -1], z)
        hit_sfc = term & ~going_up
        exit_toa = term & going_up
        z = jnp.where(hit_sfc, 0.0, z)

        # vertical path per layer toward the sensor: above the event for a
        # satellite, below it for a ground camera (slant factor applied at
        # the estimate)
        if camera:
            # vertical path between the event and the camera altitude
            zc_lo = jnp.minimum(z, cam_z)
            zc_hi = jnp.maximum(z, cam_z)
            sens_path = jnp.clip(jnp.minimum(zc_hi[None, :], z_lev[1:, None])
                                 - jnp.maximum(zc_lo[None, :], z_lev[:-1, None]),
                                 0.0, dz_lay[:, None])
        else:
            sens_path = jnp.clip(
                z_lev[1:, None] - jnp.maximum(z[None, :], z_lev[:-1, None]),
                0.0, dz_lay[:, None]) / mu_s
        big = jnp.dot(kop.T, jnp.concatenate([trav, sens_path], axis=0),
                      preferred_element_type=_F)        # (2Ng+2, B)
        labs = labs - big[:ng + 1]
        tau_sens_abs = big[ng + 1:2 * ng + 1]           # (Ng, B)
        tau_sens_sig = big[2 * ng + 1]

        plen = plen + jnp.where(active, s_star, 0.0)

        # ---------------- collision: accept / channel ----------------
        ix, iy = col_index(x, y, ix0, iy0, nscat)
        k3 = jnp.clip(l_col - st.iz3l, 0, st.nz3 - 1)
        in3 = (l_col >= st.iz3l) & (l_col < st.iz3l + st.nz3) if st.has_3d \
            else jnp.zeros(B, bool)
        if 'vox' in ablate:
            vrow = jnp.broadcast_to(vox[0], (B, 3 + 3 * ns3))
        else:
            vrow = vox[(ix * st.ny + iy) * st.nz3 + k3]
        vt = vrow.T                      # (3+3*Ns3, B): compact lane layout
        ext_c = jnp.where(in3, vt[0], 0.0)

        z_hi_col = jnp.sum(oh_col * z_lev[1:, None], axis=0)
        if st.has_3d:
            below3 = l_col < st.iz3l
            above3 = l_col >= st.iz3l + st.nz3
            tau3_above = jnp.where(
                above3, 0.0,
                jnp.where(below3, vt[1] + vt[0] * dz3[0],
                          vt[1] + vt[0] * (z_hi_col - z))) / mu_s
        else:
            tau3_above = jnp.zeros(B, _F)

        sig_r = jnp.sum(oh_col * scene.sig_ray[:, None], axis=0)
        # per-constituent aerosol extinctions at the collision layer (MXU
        # contraction; each 1D constituent keeps its own ssa/phase row,
        # reference add_mca_1d_atm, mca_atm.py:105-139)
        sig_ac = jnp.dot(scene.sig_aer.T, oh_col,
                         preferred_element_type=_F)        # (Na, B)
        sig_a = jnp.sum(sig_ac, axis=0)
        sig_real = sig_r + sig_a + ext_c
        accept = collided & (u[3] * sig_m < sig_real)

        pick = u[4] * sig_real
        ch_ray = accept & (pick < sig_r)
        ch_aer = accept & ~ch_ray & (pick < sig_r + sig_a)
        ch_cld = accept & ~ch_ray & ~ch_aer
        # 3D-constituent selection by extinction share: given ch_cld,
        # (pick - sig_r - sig_a)/ext_c is a fresh U[0,1) deviate; comparing
        # it against the cumulative-fraction boundaries picks the slot whose
        # own ssa/phase row drives this event
        u_c = jnp.clip((pick - sig_r - sig_a)
                       / jnp.maximum(ext_c, 1e-30), 0.0, 1.0 - 1e-7)
        slot = jnp.zeros(B, jnp.int32)
        for s in range(ns3 - 1):
            slot = slot + (u_c >= vt[3 + 3 * s]).astype(jnp.int32)
        ssa_sel = vt[4]
        apf_sel = vt[5]
        for s in range(1, ns3):
            m = slot == s
            ssa_sel = jnp.where(m, vt[4 + 3 * s], ssa_sel)
            apf_sel = jnp.where(m, vt[5 + 3 * s], apf_sel)
        ssa_c = jnp.where(in3, ssa_sel, 1.0)
        apf_c = jnp.where(in3, apf_sel, 0.0).astype(jnp.int32)
        c_aer = jnp.clip(jnp.sum((jnp.cumsum(sig_ac, axis=0)
                                  < (pick - sig_r)[None, :]).astype(jnp.int32),
                                 axis=0), 0, n_aer - 1)
        oh_a = (jax.lax.broadcasted_iota(jnp.int32, (n_aer, B), 0)
                == c_aer[None, :]).astype(_F)
        apf_a = jnp.sum(oh_a * scene.aer_apf.astype(_F)[:, None],
                        axis=0).astype(jnp.int32)
        ssa_a = jnp.sum(oh_a * scene.aer_ssa[:, None], axis=0)
        apf = jnp.where(ch_cld, apf_c, jnp.where(ch_aer, apf_a, 0))
        ssa_ev = jnp.where(ch_cld, ssa_c, jnp.where(ch_aer, ssa_a, 1.0))

        # scattering cosine toward the sensor (the phase-eval argument)
        if camera:
            cam_x = cfg.cam_xpos * lx_glob
            cam_y = cfg.cam_ypos * ly
            if cfg.cam_apsize > 0:
                # finite aperture (MCARaTS Rad_apsize): every local estimate
                # targets a fresh uniform point on the horizontal aperture
                # disk — the tally integrates radiance over the aperture
                # area (unbiased; reduces speckle from nearby events too)
                r_ap = cfg.cam_apsize * jnp.sqrt(u[12])
                ph_ap = (2.0 * jnp.pi) * u[13]
                cam_x = cam_x + r_ap * jnp.cos(ph_ap)
                cam_y = cam_y + r_ap * jnp.sin(ph_ap)
            dxs = (cam_x - x + 0.5 * lx_glob) % lx_glob - 0.5 * lx_glob
            dys = (cam_y - y + 0.5 * ly) % ly - 0.5 * ly
            dzs = cam_z - z
            r_cam = jnp.sqrt(dxs * dxs + dys * dys + dzs * dzs)
            r_cam = jnp.maximum(r_cam, cfg.cam_rmin)
            wsx_c, wsy_c, wsz_c = dxs / r_cam, dys / r_cam, dzs / r_cam
            mu_sc = ux * wsx_c + uy * wsy_c + uz * wsz_c
        else:
            mu_sc = ux * sx + uy * sy + uz * mu_s

        if use_ppair and 'phase' not in ablate:
            # ONE fused Pallas call for both per-event LUT lookups (eval at
            # mu_sc with TMS row selection + inverse-CDF sample at u[:, 5])
            from .pallas_phase import phase_pair
            row_e = apf + jnp.where(direct, n_pf, 0)
            pe_pair, mu_pair = phase_pair(
                apf, row_e, mu_sc, u[5], ph_packed, ph_meta,
                interpret=jax.default_backend() != 'tpu')
        else:
            pe_pair = mu_pair = None

        def eval_sensor(mu):
            if pe_pair is not None:
                return jnp.where(apf == 0, 0.75 * (1.0 + mu * mu), pe_pair)
            return phase_eval(apf, mu, first=direct)

        # ---------------- local estimates ----------------
        from .brdf import brdf_eval, brdf_sample_dir_weight
        if uniform_sfc:
            srow = jnp.broadcast_to(sfc_tab[0], (B, 6))
        else:
            if st.nxs == st.nx:
                # surface follows the (local) atmosphere grid — under
                # decomposition the table is sharded with the slabs
                sxi = local_ix(x)
            else:
                # independent surface grid (st.nxs != atmosphere nx, e.g.
                # a coarser sfc_2d_gen map): index by GLOBAL fraction —
                # the atmosphere-grid local_ix would read wrong rows and
                # clamp out of bounds
                lxg = (slab.nx_global if slab is not None else st.nx) \
                    * st.dx
                sxi = jnp.clip(jnp.floor(x / lxg * st.nxs).astype(jnp.int32),
                               0, st.nxs - 1)
            syi = jnp.floor(y / ly * st.nys).astype(jnp.int32) % st.nys
            srow = sfc_tab[sxi * st.nys + syi]
        jsfc_l = srow[:, 0].astype(jnp.int32)
        psfc_l = srow[:, 1:]

        rad = c.rad
        rad_pl = c.rad_pl
        if radiance:
            if camera:
                # point-estimator to a camera at (cam_x, cam_y, cam_z) with
                # Z-Y-Z Euler pointing (MCARaTS Rad_phi/the/psi + Rad_zloc);
                # geometry and mu_sc precomputed above
                pval = eval_sensor(mu_sc)
                if st.has_3d:
                    tau3_below = jnp.where(
                        l_col < st.iz3l, 0.0,
                        jnp.where(l_col >= st.iz3l + st.nz3, vt[2],
                                  vt[2] - vt[1]
                                  - vt[0] * (z_hi_col - z)))
                    tau3_below = jnp.clip(tau3_below, 0.0, None)
                    # camera above the deck top sees the deck portion ABOVE
                    # the event (tau3_above carries the satellite 1/mu_s)
                    cam_above = cam_z >= z_lev[st.iz3l + st.nz3]
                    tau3_cam = jnp.where(cam_above, tau3_above * mu_s,
                                         tau3_below)
                else:
                    tau3_cam = jnp.zeros(B, _F)
                slant = r_cam / jnp.maximum(jnp.abs(z - cam_z), 1.0)
                t_sens = jnp.exp(labs[:ng] - slant[None, :] * tau_sens_abs
                                 - (slant * (tau_sens_sig + tau3_cam))[None, :])
                c_vol = (wsc * ssa_ev * pval
                         / (4.0 * jnp.pi * r_cam * r_cam))[None, :] * t_sens
                # fisheye pixel (equidistant projection) in the rotated
                # camera frame; out-of-FOV events contribute nothing
                vx = (cam_rot[0, 0] * -wsx_c + cam_rot[0, 1] * -wsy_c
                      + cam_rot[0, 2] * -wsz_c)
                vy = (cam_rot[1, 0] * -wsx_c + cam_rot[1, 1] * -wsy_c
                      + cam_rot[1, 2] * -wsz_c)
                vz = (cam_rot[2, 0] * -wsx_c + cam_rot[2, 1] * -wsy_c
                      + cam_rot[2, 2] * -wsz_c)
                theta = jnp.arccos(jnp.clip(vz, -1.0, 1.0))
                phi_c = jnp.arctan2(vy, vx)
                in_fov = theta <= jnp.deg2rad(cfg.cam_qmax)
                # surface local estimate toward the camera (counterpart of
                # the satellite branch's c_sfc): reflected energy density
                # per steradian is rho(wi->ws) cos(theta_out), and the
                # same 1/r^2 aperture-flux conversion as c_vol applies —
                # without it a down-looking camera never sees the direct
                # surface-reflected signal (the dominant clear-pixel term)
                rho_cam = brdf_eval(jsfc_l, psfc_l, ux, uy, uz,
                                    wsx_c, wsy_c, wsz_c)
                c_sfc_cam = (wsc * rho_cam * jnp.maximum(wsz_c, 0.0)
                             / (r_cam * r_cam))[None, :] * t_sens
                contrib = jnp.where((accept & in_fov)[None, :], c_vol,
                                    jnp.where((hit_sfc & in_fov)[None, :],
                                              c_sfc_cam, 0.0))
                pr = jnp.clip(theta / jnp.deg2rad(cfg.cam_qmax), 0.0, 0.999)
                cam_px = jnp.clip(((0.5 + 0.5 * pr * jnp.cos(phi_c)) * nxr)
                                  .astype(jnp.int32), 0, nxr - 1)
                cam_py = jnp.clip(((0.5 + 0.5 * pr * jnp.sin(phi_c)) * nyr)
                                  .astype(jnp.int32), 0, nyr - 1)
            else:
                pval = eval_sensor(mu_sc)
                t_sens = jnp.exp(labs[:ng] - tau_sens_abs
                                 - (tau_sens_sig + tau3_above)[None, :])
                c_vol = (wsc * ssa_ev * pval / (4.0 * jnp.pi * mu_s))[None, :] * t_sens
                rho_sens = brdf_eval(jsfc_l, psfc_l, ux, uy, uz, sx, sy, mu_s)
                c_sfc = (wsc * rho_sens)[None, :] * t_sens
                contrib = jnp.where(accept[None, :], c_vol,
                                    jnp.where(hit_sfc[None, :], c_sfc, 0.0))
            if 'firstdep' in ablate:
                # diagnostic only (variance budget): drop first-order
                # deposits (volume estimates at the first scattering and
                # direct-beam surface estimates) — BIASED, never physics
                contrib = jnp.where(direct[None, :], 0.0, contrib)

            # pathlength at detection: path so far + the sensor leg —
            # event->camera distance for a camera, else the slant exit
            # path to TOA toward the satellite
            if camera:
                pl_det = plen + r_cam                           # (B,)
            else:
                pl_det = plen + (z_top - z) / mu_s              # (B,)
            if scalar_rad:
                # in-kernel spectral contraction (see docstring): one scalar
                # deposit per event instead of an (Ng,)-wide row
                contrib = jnp.einsum('g,gb->b', rad_w, contrib)
            if nxr * nyr == 1:
                if scalar_rad:
                    rad = rad + jnp.sum(contrib, keepdims=True)
                else:
                    rad = rad + jnp.sum(contrib, axis=1, keepdims=True).T
                if cfg.pathlength:
                    rad_pl = rad_pl + jnp.sum(contrib * pl_det[None, :],
                                              axis=1, keepdims=True).T
            else:
                if camera:
                    pidx = cam_px * nyr + cam_py
                elif st.ipa:
                    if slab is None:
                        pidx = ix0 * nyr + iy0
                    else:
                        ix_g = ix0 + jnp.round(x_off / st.dx).astype(jnp.int32)
                        pidx = ix_g * nyr + iy0
                else:
                    # slant projection onto the TOA image plane wraps
                    # periodically in BOTH axes, consistent with the
                    # periodic transport domain (a clamped x would pile
                    # boundary-crossing deposits onto the edge pixels and
                    # diverge from the decomposed global image)
                    xp = (x - sx / mu_s * z) % lx_glob
                    yp = (y - sy / mu_s * z) % ly
                    gix = jnp.clip(
                        jnp.floor(xp / st.dx).astype(jnp.int32),
                        0, nx_glob - 1)
                    pidx = gix * nyr \
                        + jnp.floor(yp / st.dy).astype(jnp.int32) % nyr
                if 'deposit' in ablate:
                    # profiling: drop the image scatter entirely (a pidx=0
                    # stand-in measures a CONTENDED scatter instead — slower
                    # than the real thing); keep contrib live via a reduce
                    rad = rad + jnp.sum(contrib).astype(rad.dtype)
                elif scalar_rad:
                    rad = rad.at[pidx].add(contrib)
                else:
                    rad = rad.at[pidx].add(contrib.T)
                if cfg.pathlength:
                    rad_pl = rad_pl.at[pidx].add((contrib * pl_det[None, :]).T)

        if tally_absorbed:
            # particulate (cloud/aerosol) absorption at accepted collisions:
            # the collision layer absorbs wsc*(1-ssa_ev), seen through the
            # gas transmission accumulated to the collision point
            # (exp(labs)).  Without this the direct absorbed-energy tally
            # integrated GAS absorption only, and heating rates with
            # absorbing clouds/aerosols biased low (advisor round-4 high:
            # at 2130 nm the gas-only tally captured 0.55x of the
            # flux-divergence column absorption).
            ab_c = jnp.where(accept, wsc * (1.0 - ssa_ev), 0.0)    # (B,)
            absorbed = absorbed + jnp.einsum(
                'lb,gb->lg', oh_col, jnp.exp(labs[:ng]) * ab_c[None, :],
                preferred_element_type=_F)

        # ---------------- direction updates ----------------
        mu_new = mu_pair if mu_pair is not None else phase_sample(apf, u[5])
        psi = u[6] * (2.0 * jnp.pi)
        ux_s, uy_s, uz_s = rotate(ux, uy, uz, mu_new, psi)
        # NOTE: a hand-written Lambertian fast path here (skipping the
        # Cox-Munk/LSRT lane math behind st.sfc_lambertian) measured a
        # reproducible 1.07 ms/step REGRESSION (scripts/tpu_isolate_ab.py,
        # 3.01 -> 4.08) — the extra (B,) transcendental chain splits XLA's
        # fusion worse than the dead-branch BRDF math it removes.  Keep the
        # generic call.
        bx, by, bz, bw = brdf_sample_dir_weight(
            jsfc_l, psfc_l, ux, uy, uz, u[5], u[6], u[9], u[10])
        ux = jnp.where(accept, ux_s, jnp.where(hit_sfc, bx, ux))
        uy = jnp.where(accept, uy_s, jnp.where(hit_sfc, by, uy))
        uz = jnp.where(accept, uz_s, jnp.where(hit_sfc, bz, uz))
        wsc = jnp.where(accept, wsc * ssa_ev, jnp.where(hit_sfc, wsc * bw, wsc))
        if cfg.p3d_order > 0:
            # partial-3D: track the column of the last low-order scatter
            low = accept & (nscat < cfg.p3d_order)
            ix0 = jnp.where(low, local_ix(x), ix0)
            iy0 = jnp.where(low, jnp.floor(y / st.dy).astype(jnp.int32) % st.ny, iy0)
        nscat = nscat + accept.astype(jnp.int32)
        direct = direct & ~accept & ~hit_sfc
        tau = jnp.where(active, -jnp.log(u[7]), tau)

        # ---------------- termination / roulette ----------------
        alive = alive & ~exit_toa & (nscat < cfg.n_scat_max) & (wsc > 0.0)
        wmax = wsc * jnp.exp(labs[ng])
        need_rr = active & (wmax < cfg.rr_wmin)
        p_surv = jnp.clip(wmax / cfg.rr_wmin, 0.0, 1.0)
        if cfg.rr_value > 0 and radiance and not camera:
            # sensor-importance roulette (SolverConfig.rr_value): the
            # photon's future deposits scale like wmax times its escape
            # probability toward the sensor, ~1/(1+tau_v) for a conservative
            # slab (Milne); tau_sens_sig/tau3_above are already computed for
            # the local estimate, so the value costs two elementwise ops
            tau_v = (tau_sens_sig + tau3_above) * mu_s
            p_val = jnp.clip((wmax / ((1.0 + tau_v) * cfg.rr_value)),
                             0.05, 1.0)
            need_rr = need_rr | (active & (p_val < 1.0))
            p_surv = jnp.minimum(p_surv, p_val)
        die = need_rr & (u[8] > p_surv)
        wsc = jnp.where(need_rr & ~die, wsc / jnp.maximum(p_surv, 1e-12), wsc)
        alive = alive & ~die

        return FlightCarry(x=x, y=y, z=z, ux=ux, uy=uy, uz=uz, wsc=wsc,
                           labs=labs, tau=tau, nscat=nscat, alive=alive,
                           ix0=ix0, iy0=iy0, launched=launched,
                           step=c.step + 1, rad=rad, plen=plen,
                           rad_pl=rad_pl, direct=direct, flux=flux,
                           absorbed=absorbed)

    def cond(c: FlightCarry):
        return jnp.any(c.alive) | (c.launched < n_photon)

    zB = jnp.zeros(B, _F)
    n_pl = nxr * nyr if cfg.pathlength else 1
    if radiance:
        flux0 = jnp.zeros((1, 8 * ng), _F)
    elif scalar_flux:
        flux0 = jnp.zeros(nxf * nyf * nlev * 3, _F)
    else:
        flux0 = jnp.zeros((-(-(nxf * nyf * nlev * 3) // 8), 8 * ng), _F)
    ng_r = 1 if scalar_rad else ng
    carry0 = FlightCarry(
        x=zB, y=zB, z=zB, ux=zB, uy=zB, uz=zB, wsc=zB,
        labs=jnp.zeros((ng + 1, B), _F), tau=zB,
        nscat=jnp.zeros(B, jnp.int32), alive=jnp.zeros(B, bool),
        ix0=jnp.zeros(B, jnp.int32), iy0=jnp.zeros(B, jnp.int32),
        launched=jnp.zeros((), jnp.int32), step=jnp.zeros((), jnp.int32),
        rad=(jnp.zeros(nxr * nyr, _F) if scalar_rad
             else jnp.zeros((nxr * nyr, ng), _F)), plen=zB,
        rad_pl=jnp.zeros((n_pl, ng_r), _F),
        direct=jnp.zeros(B, bool),
        flux=flux0,
        absorbed=jnp.zeros((nz, ng) if tally_absorbed else (1, 1), _F))
    return body, cond, carry0


# FlightCarry fields that are tallies/counters, NOT per-lane state.  Every
# other field is packed by lane_matrix below — a future per-lane field is
# picked up automatically, and a future tally field must be listed here or
# its shape fails loudly in lane_matrix (advisor r3: the old hand-written
# field lists would silently leave new per-lane fields unpermuted).
_NON_LANE_FIELDS = frozenset({'launched', 'step', 'rad', 'rad_pl', 'flux',
                              'absorbed'})


def lane_matrix(c: FlightCarry):
    """All per-lane state as one (B, F) float32 matrix + column spec.

    One matrix means a lane permutation (sorting) or migration window swap
    costs ONE row-gather/ppermute instead of ~20 per-array ones.  Int/bool
    lanes round-trip through float32 — exact for values < 2^24; callers
    must assert their ranges (see the sort_every/decomp guards).
    """
    B = c.x.shape[0]
    cols, spec, off = [], {}, 0
    for name, v in zip(c._fields, c):
        if name in _NON_LANE_FIELDS:
            continue
        if getattr(v, 'ndim', None) == 1 and v.shape[0] == B:
            cols.append(v.astype(_F)[:, None])
            spec[name] = (off, 1, v.dtype)
            off += 1
        elif getattr(v, 'ndim', None) == 2 and v.shape[1] == B:
            k = v.shape[0]
            cols.append(v.T.astype(_F))
            spec[name] = (off, k, v.dtype)
            off += k
        else:
            raise TypeError(
                f'FlightCarry.{name} (shape {getattr(v, "shape", None)}) is '
                'not per-lane; add it to _NON_LANE_FIELDS or teach '
                'lane_matrix how to pack it')
    return jnp.concatenate(cols, axis=1), spec


def lanes_from_matrix(m, c: FlightCarry, spec) -> FlightCarry:
    """Inverse of :func:`lane_matrix` (restores dtypes per the spec)."""
    upd = {}
    for name, (off, k, dt) in spec.items():
        block = m[:, off:off + k]
        v = block[:, 0] if k == 1 else block.T
        if dt == jnp.bool_:
            v = v > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            v = jnp.round(v).astype(dt)
        else:
            v = v.astype(dt)
        upd[name] = v
    return c._replace(**upd)


def _sort_lanes(c: FlightCarry, st: SceneStatic) -> FlightCarry:
    """Re-sort photon lanes by their current voxel column (see
    SolverConfig.sort_every).

    Adjacent lanes then gather adjacent voxel/majorant/surface rows and
    deposit into adjacent image pixels — clustered HBM indices measured
    ~3.7x cheaper than uniform-random ones (BENCH_NOTES round-3 cost
    model).  Dead lanes sort to the END: the respawn block assigns them
    sequential stratified cells (launch_coherent), so the new photons are
    born coherent too.
    """
    key = jnp.where(
        c.alive,
        jnp.clip(jnp.floor(c.x / st.dx).astype(jnp.int32), 0, st.nx - 1)
        * st.ny + jnp.floor(c.y / st.dy).astype(jnp.int32) % st.ny,
        jnp.int32(st.nx * st.ny))
    perm = jnp.argsort(key)
    m, spec = lane_matrix(c)
    return lanes_from_matrix(m[perm], c, spec)


def transport_flight(scene: SceneArrays, st: SceneStatic, cfg: SolverConfig,
                     n_photon, key: jax.Array,
                     flux_w=None, rad_w=None) -> Tallies:
    """``n_photon`` may be a python int OR a traced int32 scalar — nothing
    shape-depends on it (spawn quota, loop conditions and the step cap are
    all value-level), so one compiled kernel serves every photon count of
    a given (scene shapes, cfg, batch).  This removes an entire recompile
    class: remainder chunks in the solver and the 16 per-g budgets of the
    independent-protocol noise phase each cost a fresh multi-minute
    remote compile when n_photon was a static argument."""
    n_photon = jnp.asarray(n_photon, jnp.int32)
    body, cond, carry0 = make_flight_kernel(scene, st, cfg, n_photon, key,
                                            flux_w=flux_w, rad_w=rad_w)
    if cfg.max_events:
        max_steps = jnp.asarray(cfg.max_events, jnp.int32)
    else:
        max_steps = ((n_photon // cfg.batch + 2) * 400).astype(jnp.int32)

    def cond_capped(c):
        return cond(c) & (c.step < max_steps)

    # Drain-phase batch compaction (VERDICT r4 task 1c/3): once the photon
    # budget is launched, the while-loop runs at full batch width while the
    # surviving stragglers (random walks inside optically thick clouds)
    # dwindle — a fixed ~200-step median tail, with a heavy seed-dependent
    # tail (1400-7400 steps observed at 4M-photon chunks, r5 sweep).
    # ms/step scales linearly with batch (memory-bound), so compacting the
    # survivors into an 8x (then 64x) smaller batch cuts the tail cost by
    # the same factor.  Exact: lanes are permuted alive-first (lane_matrix
    # pack, f32-exact for this state) and continue with their own state;
    # the per-(step, lane) RNG streams never repeat because step increases
    # monotonically across stages.  Auto-disabled for configurations whose
    # int lane state could exceed the f32-exact range.
    compact_stages = []
    if (cfg.drain_compact and cfg.sort_every == 0 and cfg.batch >= 2048
            and st.nx * st.ny < 2 ** 24 and cfg.n_scat_max < 2 ** 24):
        b_s = cfg.batch // 8
        while b_s >= 256 and len(compact_stages) < 2:
            compact_stages.append(b_s)
            b_s //= 8

    if cfg.sort_every > 0:
        # int lanes (nscat, ix0, iy0) round-trip through float32 in the
        # sort's packed matrix — exact only below 2^24 (advisor r3)
        assert st.nx * st.ny < 2 ** 24 and cfg.n_scat_max < 2 ** 24, \
            'sort_every packs int lane state into float32 (exact < 2^24)'

        # sort + a fixed block of steps per outer trip; the while cond is
        # checked at block granularity (a <=sort_every-1 step overshoot in
        # the drain tail — harmless, tallies ignore dead lanes)
        def outer(c):
            c = _sort_lanes(c, st)
            return jax.lax.fori_loop(0, cfg.sort_every,
                                     lambda i, cc: body(cc), c)
        out = jax.lax.while_loop(cond_capped, outer, carry0)
        # float32: step*batch reaches ~1e9-1e10 at production chunks and
        # would wrap int32; ppm-level float rounding is irrelevant for a
        # work metric
        lane_iters = out.step.astype(_F) * cfg.batch
    elif compact_stages:
        b1 = compact_stages[0]

        def cond0(c):
            n_alive = jnp.sum(c.alive.astype(jnp.int32))
            return (((c.launched < n_photon) | (n_alive > b1))
                    & ((n_alive > 0) | (c.launched < n_photon))
                    & (c.step < max_steps))
        c = jax.lax.while_loop(cond0, body, carry0)
        lane_iters = c.step.astype(_F) * cfg.batch
        prev_step = c.step
        import dataclasses as _dc
        for si, b_s in enumerate(compact_stages):
            cfg_s = _dc.replace(cfg, batch=b_s)
            body_s, _, carry_t = make_flight_kernel(
                scene, st, cfg_s, n_photon, key, flux_w=flux_w, rad_w=rad_w)
            m, spec = lane_matrix(c)
            order = jnp.argsort(jnp.where(c.alive, 0, 1), stable=True)
            c = lanes_from_matrix(m[order[:b_s]], carry_t, spec)._replace(
                launched=c.launched, step=c.step, rad=c.rad,
                rad_pl=c.rad_pl, flux=c.flux, absorbed=c.absorbed)
            nxt = compact_stages[si + 1] if si + 1 < len(compact_stages) \
                else 0

            def cond_s(cc, nxt=nxt):
                n_alive = jnp.sum(cc.alive.astype(jnp.int32))
                return (n_alive > nxt) & (cc.step < max_steps)
            c = jax.lax.while_loop(cond_s, body_s, c)
            lane_iters = lane_iters + (c.step - prev_step).astype(_F) * b_s
            prev_step = c.step
        out = c
    else:
        out = jax.lax.while_loop(cond_capped, body, carry0)
        lane_iters = out.step.astype(_F) * cfg.batch
    if cfg.sensor_type == 'camera':
        nxr = nyr = cfg.cam_npix
    else:
        nxr, nyr = st.nx, st.ny
    rad_plen = out.rad_pl.reshape(nxr, nyr, st.ng) if cfg.pathlength \
        else jnp.zeros(())
    nlev = st.nz + 1
    if cfg.target == 'radiance':
        flux = jnp.zeros((1, 1, nlev, 3, st.ng), _F)
    else:
        nxf, nyf = (st.nx, st.ny) if cfg.flux_per_column else (1, 1)
        scalar = out.flux.ndim == 1
        ng_f = 1 if scalar else st.ng
        n_rows = nxf * nyf * nlev * 3
        flux = out.flux.reshape(-1, ng_f)[:n_rows].reshape(
            nxf, nyf, nlev, 3, ng_f)
        # deterministic TOA down-direct entry: exactly 1 per launched photon
        # (already factor-contracted in scalar mode)
        toa1 = jnp.sum(jnp.asarray(flux_w, _F)[st.nz]) if scalar \
            else jnp.ones((), _F)
        flux = flux.at[:, :, st.nz, 0, :].add(
            out.launched.astype(_F) * toa1 / (nxf * nyf))
    ng_r = st.ng if out.rad.ndim > 1 else 1
    return Tallies(rad=out.rad.reshape(nxr, nyr, ng_r),
                   flux=flux,
                   n_launched=out.launched, n_steps=out.step,
                   rad_plen=rad_plen, lane_iters=lane_iters,
                   absorbed=out.absorbed)


def run_transport_flight(scene, static, cfg, n_photon, seed=0, rng_impl='rbg',
                         flux_w=None, rad_w=None):
    """Jitted entry point.

    ``rng_impl='rbg'`` uses the TPU's fast RNG path (cheaper per deviate than
    threefry inside the hot loop); pass 'threefry2x32' for cross-platform
    bitwise determinism.  ``flux_w``: (Nz+1, Ng) spectral factors enabling
    the in-kernel spectral contraction of per-column flux tallies (the
    returned Tallies.flux then has a singleton g axis holding the
    factor-contracted physical tally).  ``rad_w``: (Ng,) spectral factors
    enabling the same contraction for radiance images (Tallies.rad gets a
    singleton g axis).
    """
    fn = jax.jit(transport_flight, static_argnums=(1, 2))
    try:
        key = jax.random.key(seed, impl=rng_impl)
    except Exception:
        key = jax.random.key(seed)
    fw = None if flux_w is None else jnp.asarray(flux_w, _F)
    rw = None if rad_w is None else jnp.asarray(rad_w, _F)
    return fn(scene, static, cfg, jnp.asarray(int(n_photon), jnp.int32),
              key, fw, rw)
