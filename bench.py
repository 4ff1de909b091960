"""Benchmark: LES-like 480x480 Mie nadir-radiance scene, photons/sec/chip.

Twin of the reference's headline workload (examples/00_er3t_mca.py
example_05: 480x480 LES scene, 650 nm nadir radiance, Mie phase, 16 g-points;
45 s for 3e8 single-g photons on 24 CPUs => 6.7e6 photons/s — BASELINE.md).
The LES netCDF is not redistributable, so an equivalent broken-cloud field
(480x480, 25% cover, COT<=30, reff 10 um) is generated in-framework.

Metrics (the reference's accuracy band is Nrun-repeat per-pixel std,
mcarats.py:134 / mca_out.py:394-397):

* raw physical photons/s per chip (median over chunks; see health guard);
* g-samples/s (each photon carries all 16 correlated g-point weights —
  the reference launches one photon per g);
* the measured correlated-vs-independent noise discount: per-photon pixel
  variance of the spectrally-integrated radiance under the correlated
  protocol vs the reference's independent per-g protocol, at matched
  budgets;
* noise-matched photons/s = photons/s x (var_indep / var_corr): the photon
  rate an independent-protocol solver would need to reach the same
  per-pixel std in the same wall time — the honest number against the
  6.7e6 ph/s baseline.

Tunnel-health guard (the round-2 record was captured in a degraded window
and understated the repo ~15x; identical compiled chunks oscillate 6-20x
within one session): the headline is the MEDIAN OVER NON-STALLED CHUNKS
(rate >= 50% of session best, >= 3 required) — stalls are remote-service
contention, not kernel behavior.  The raw all-chunk median, every chunk
rate, and the stall count are in the JSON so nothing is hidden; a window
without 3 clean chunks is marked ``degraded: true`` and the noise phase
(which would stamp a misleading headline) is skipped.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
The primary metric is noise-matched photons/s when the noise phase runs,
else raw g-samples/s.
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np


BASELINE_PHOTONS_PER_S = 6.7e6  # reference, 24 CPUs (BASELINE.md)
# healthy single-chunk rate observed on a clean tunnel (2026-08-20, lane-major
# kernel + pallas phase pair: 3.4-3.5 ms/step at 12.7k photons/step, B=2^17,
# tile16/t20 => ~3.6M ph/s steady-state); a session whose best chunk stays
# below HEALTH_FRAC of this is marked degraded
HEALTHY_REF_PHOTONS_PER_S = 3.5e6   # r5: t25 + drain compaction measured
#                                     4.0M ph/s at 4M chunks in a clean
#                                     window (scripts/tpu_drain_ab.py)
HEALTH_FRAC = 0.5


def build():
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm.scene import build_scene

    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm)
    cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                      cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                      cot_scale=15.0, cloud_base=0.5, seed=7)
    pha = pha_mie_wc(650.0)
    # 25 deg forward truncation with TMS (first-order exact).  MCARaTS's own
    # default is 20 deg (Sca_qtfmax); the round-5 interleaved sweep measured
    # t25 at +8-14% rate with a -0.32% domain-mean shift vs t20 (seed sd of
    # the mean ~0.08%) — disclosed, well inside the reference's own Nrun
    # noise protocol (~1% per-pixel) and the 2.5% cross-solver anchor.
    # t30/t35 were rejected (-0.9%/-1.3% shifts; BENCH_NOTES round-5).
    scene, st = build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                            solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                            forward_trunc_deg=25.0)
    return ab, scene, st


def _pixel_var_per_photon(images, n_per_run):
    """Mean-over-pixels per-photon variance from repeat images.

    var(run mean) = var_per_photon / N  =>  var_per_photon = N * var(runs).
    Cloudy pixels dominate; use the pixel-mean variance (the reference's
    std fields are per-pixel, mca_out.py:394-397).
    """
    imgs = np.stack(images)                    # (K, nx, ny)
    v = imgs.var(axis=0, ddof=1)               # per-pixel var of run means
    return float(v.mean()) * n_per_run


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight
    from er3t_tpu.rtm.out import spectral_factors

    ab, scene, st = build()
    # production config: per-tile majorants + 25-deg truncation (TMS,
    # set in build() above — the round-5 t25 adoption) +
    # in-kernel spectral contraction of image deposits (rad_w) + the Pallas
    # MXU phase-pair kernel (use_pallas; physics matched to the XLA path to
    # 0.05%, tests/test_pallas_phase.py) + stratified-jitter launch
    # (qmc_launch: unbiased, measured -2% pixel variance at neutral rate on
    # this scene — scripts/tpu_var_budget.py r4); n_scat_max=600 bounds
    # pathological walks (negligible energy there).  The round-4 per-knob
    # A/B (BENCH_NOTES) measured every other variance knob on this scene:
    # pfpeak30 no-op under 20-deg truncation, cf_dtau=0.5 net -3%,
    # split_wmax/rr_value large net losses — qmc_launch is the only winner.
    cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                       tile_size=16, use_pallas=True, qmc_launch=True)
    # reference-protocol config for the independent-sampling noise phase:
    # the same kernel minus the framework-only variance knob (MCARaTS
    # launches uniformly), mirroring the baseline estimator
    cfg_ref = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                           tile_size=16, use_pallas=True)
    factors, _ = spectral_factors(ab, nz_out=1)
    rad_w = factors[0]

    def run(n, seed, c=None):
        tal = run_transport_flight(scene, st, c or cfg, n, seed=seed,
                                   rad_w=rad_w)
        img = np.asarray(tal.rad)[:, :, 0]     # forces completion (tunnel)
        return img, int(tal.n_launched)

    # ---------------- phase 0: warm-up + health probe ----------------
    run(100_000, seed=0)
    probe_rate = 0.0
    for k in range(3):            # a probe can hit a tunnel stall too
        t0 = time.time()
        _, n_h = run(2_000_000, seed=1)
        probe_rate = max(probe_rate, n_h / (time.time() - t0))
        if probe_rate >= HEALTH_FRAC * HEALTHY_REF_PHOTONS_PER_S:
            break

    # ---------------- phase 1: throughput ----------------
    # The tunnel stalls intermittently (identical compiled chunks oscillate
    # 6-20x in wall time within one session — e.g. [0.17, 3.05, 0.35, 3.53,
    # 0.53] M ph/s on 2026-08-20).  Stalls are infrastructure (remote
    # execution service contention), not kernel behavior, so the headline is
    # the MEDIAN OVER NON-STALLED CHUNKS (rate >= 50% of session best); the
    # raw all-chunk median, every chunk rate, and the stall count are all in
    # the JSON so nothing is hidden.  A window without >=3 clean chunks is
    # marked degraded instead of stamping a headline.
    chunk = 8_000_000
    target_seconds = 110.0
    chunk_rates = []
    t_used, i = 0.0, 0
    while (t_used < target_seconds or
           sum(1 for r in chunk_rates
               if r >= 0.5 * max(chunk_rates)) < 3) and i < 32 \
            and t_used < 3 * target_seconds:
        t0 = time.time()
        try:
            _, n_l = run(chunk, seed=2 + i)
        except Exception as e:
            print(f'# chunk {i} failed: {e}', file=sys.stderr)
            break
        dt = time.time() - t0
        chunk_rates.append(n_l / dt)
        t_used += dt
        i += 1
        if dt < 25.0 and chunk < 32_000_000:
            chunk *= 2
        elif dt > 90.0 and chunk > 4_000_000:
            chunk //= 2

    if not chunk_rates:
        print(json.dumps({'metric': 'noise_matched_photons_per_sec_per_chip',
                          'value': 0.0, 'unit': '1/s', 'vs_baseline': 0.0,
                          'degraded': True, 'probe_rate': round(probe_rate, 1)}))
        return
    best = max(chunk_rates)
    clean = [r for r in chunk_rates if r >= 0.5 * best]
    median_all = float(np.median(chunk_rates))
    median_rate = float(np.median(clean))
    slow_chunks = len(chunk_rates) - len(clean)
    healthy = (best >= HEALTH_FRAC * HEALTHY_REF_PHOTONS_PER_S
               and len(clean) >= 3)
    photons_per_s = median_rate
    g_samples_per_s = photons_per_s * ab.ng

    # ---------------- phase 2: noise protocol ----------------
    # per-pixel std from Nrun repeats (the reference's protocol) under the
    # correlated spectral sampling, and under the reference's independent
    # per-g protocol at the same photon budget.  Skipped on a degraded
    # tunnel — a bad window must not stamp the headline number.
    # The variance ratio is now estimated from >=8 repeats per protocol
    # (round-3 used 3+2; a 2-sample variance has chi^2_1 spread, so the
    # round-3 multiplier was statistically fragile — VERDICT r3 weak #2).
    # Independent-protocol repeats use 2M photons each (variance per photon
    # is budget-independent; 8 repeats at half budget cost the same wall
    # time as 4 at full).
    var_c = var_i = None
    if healthy and t_used < 420.0:
        try:
            n_noise = 4_000_000
            imgs_c = []
            for k in range(8):
                img, n_l = run(n_noise, seed=101 + k)
                imgs_c.append(img / max(n_l, 1))
            var_c = _pixel_var_per_photon(imgs_c, n_noise)

            import dataclasses as _dc
            from er3t_tpu.rtm.solver import distribute_photon
            n_ind = 2_000_000
            dist = distribute_photon(n_ind, ab.weight)
            imgs_i = []
            for k in range(8):
                acc = np.zeros((st.nx, st.ny))
                for g in range(ab.ng):
                    scene_g = scene._replace(kabs=scene.kabs[:, g:g + 1])
                    st_g = _dc.replace(st, ng=1)
                    tg = run_transport_flight(scene_g, st_g, cfg_ref,
                                              int(dist[g]),
                                              seed=301 + 16 * k + g)
                    acc += (np.asarray(tg.rad)[:, :, 0]
                            / max(int(tg.n_launched), 1)) * factors[0][g]
                imgs_i.append(acc)
            var_i = _pixel_var_per_photon(imgs_i, n_ind)
        except Exception as e:
            print(f'# noise phase failed: {e}', file=sys.stderr)

    out = {
        'unit': '1/s',
        'photons_per_sec': round(photons_per_s, 1),
        'g_samples_per_sec': round(g_samples_per_s, 1),
        'healthy': bool(healthy),
        'probe_rate': round(probe_rate, 1),
        'chunk_rates': [round(r, 1) for r in chunk_rates],
        'median': round(median_rate, 1),          # over non-stalled chunks
        'median_all_chunks': round(median_all, 1),
        'best': round(best, 1),
        'slow_chunks': slow_chunks,
        # unfiltered counterpart of the headline (advisor r3): the same
        # metric from the raw all-chunk median, stalls included
        'vs_baseline_all': round(median_all / BASELINE_PHOTONS_PER_S, 3),
    }
    if not healthy:
        out['degraded'] = True
    if var_c and var_i and var_c > 0:
        noise_ratio = var_i / var_c
        noise_matched = photons_per_s * noise_ratio
        out.update({
            'metric': 'noise_matched_photons_per_sec_per_chip',
            'value': round(noise_matched, 1),
            'vs_baseline': round(noise_matched / BASELINE_PHOTONS_PER_S, 3),
            'vs_baseline_all': round(median_all * noise_ratio
                                     / BASELINE_PHOTONS_PER_S, 3),
            'noise_var_ratio_indep_over_corr': round(noise_ratio, 3),
            'pixel_std_at_budget': round(float(np.sqrt(var_c / 4e6)), 8),
        })
    else:
        out.update({
            'metric': 'gpoint_photon_samples_per_sec_per_chip',
            'value': round(g_samples_per_s, 1),
            'vs_baseline': round(g_samples_per_s / BASELINE_PHOTONS_PER_S, 3),
        })
    print(json.dumps(out))


if __name__ == '__main__':
    main()
