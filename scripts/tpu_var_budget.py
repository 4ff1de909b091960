"""Per-pixel variance budget + per-knob A/B on the bench scene (real TPU).

Round-4 driver (VERDICT item 1): the kernel is at its measured rate floor,
so the noise-matched headline must be won on variance per photon.  This
script measures, for each candidate config:

* rate (photons/s, median over repeats),
* per-photon pixel variance of the spectrally-contracted image
  (mean over pixels, and split over cloudy/clear columns),
* effective noise-matched throughput vs the base config
  = rate * var(base)/var(cfg).

Also runs the biased 'firstdep' diagnostic (first-order deposits dropped) to
expose how much of the pixel variance is first-order sampling noise — the
decision datum for a deterministic single-scattering estimator.

Usage: python -u scripts/tpu_var_budget.py [--repeats 12] [--photons 2e6]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--repeats', type=int, default=12)
    ap.add_argument('--photons', type=float, default=2e6)
    ap.add_argument('--configs', type=str, default='')
    args = ap.parse_args()

    import jax
    from bench import build
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight
    from er3t_tpu.rtm.out import spectral_factors

    ab, scene, st = build()
    factors, _ = spectral_factors(ab, nz_out=1)
    rad_w = factors[0]

    # pfpeak scene: rebuild with the clamp
    def build_pfpeak(pk):
        levels = np.concatenate([np.arange(0, 3.0, 0.5),
                                 np.arange(3.0, 20.1, 1.0)])
        atm = atm_atmmod(levels)
        ab2 = abs_synthetic(650.0, atm)
        cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                          cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                          cot_scale=15.0, cloud_base=0.5, seed=7)
        pha = pha_mie_wc(650.0)
        return build_scene(atm, ab2, cld=cld, pha=pha, surface=0.03,
                           solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                           forward_trunc_deg=20.0, pfpeak=pk)

    base = dict(target='radiance', batch=1 << 17, n_scat_max=600,
                tile_size=16, use_pallas=True)
    cloud_mask = np.asarray(scene.ext3d).sum(axis=2) > 0   # (480,480)

    CONFIGS = {
        'base':     (SolverConfig(**base), scene, st),
        'pfpeak30': (SolverConfig(**base), *build_pfpeak(30.0)),
        'qmc':      (SolverConfig(**base, qmc_launch=True), scene, st),
        'cf05':     (SolverConfig(**base, cf_dtau=0.5), scene, st),
        'split05':  (SolverConfig(**base, split_wmax=0.5), scene, st),
        'firstdep': (SolverConfig(**base, ablate='firstdep'), scene, st),
        'rr03':     (SolverConfig(**base, rr_value=0.03), scene, st),
        'rr05':     (SolverConfig(**base, rr_value=0.05), scene, st),
        'rr10':     (SolverConfig(**base, rr_value=0.10), scene, st),
        'rr05qmc':  (SolverConfig(**base, rr_value=0.05, qmc_launch=True),
                     scene, st),
    }
    if args.configs:
        names = args.configs.split(',')
        CONFIGS = {k: CONFIGS[k] for k in names}

    n = int(args.photons)
    out = {}
    for name, (cfg, sc, stc) in CONFIGS.items():
        imgs, rates = [], []
        t_comp = time.time()
        for k in range(args.repeats):
            t0 = time.time()
            try:
                tal = run_transport_flight(sc, stc, cfg, n, seed=500 + k,
                                           rad_w=rad_w)
                img = np.asarray(tal.rad)[:, :, 0]
                n_l = int(tal.n_launched)
            except Exception as e:
                print(f'# {name} rep {k} failed: {e}', file=sys.stderr,
                      flush=True)
                continue
            dt = time.time() - t0
            imgs.append(img / max(n_l, 1))
            if k > 0:               # skip compile repeat for rate
                rates.append(n_l / dt)
            print(f'#   {name} rep {k}: {dt:.1f}s '
                  f'{n_l / dt / 1e6:.2f}M ph/s', flush=True)
        if len(imgs) < 4:
            print(f'# {name}: too few repeats, skipped', flush=True)
            continue
        arr = np.stack(imgs)
        v = arr.var(axis=0, ddof=1) * n          # per-photon pixel variance
        mean_img = arr.mean(axis=0)
        out[name] = {
            'rate_med': float(np.median(rates)) if rates else 0.0,
            'var_mean': float(v.mean()),
            'var_cloudy': float(v[cloud_mask].mean()),
            'var_clear': float(v[~cloud_mask].mean()),
            'mean_rad': float(mean_img.mean()),
            'mean_cloudy': float(mean_img[cloud_mask].mean()),
            'mean_clear': float(mean_img[~cloud_mask].mean()),
            'repeats': len(imgs),
            'wall': round(time.time() - t_comp, 1),
        }
        print(f'# {name}: rate {out[name]["rate_med"]/1e6:.2f}M  '
              f'var {v.mean():.4g} (cloudy {out[name]["var_cloudy"]:.4g} '
              f'clear {out[name]["var_clear"]:.4g})  '
              f'mean {mean_img.mean():.5g}', flush=True)

    if 'base' in out:
        v0, r0 = out['base']['var_mean'], out['base']['rate_med']
        for name, d in out.items():
            if d['var_mean'] > 0 and d['rate_med'] > 0:
                d['eff_vs_base'] = round(
                    (d['rate_med'] / r0) * (v0 / d['var_mean']), 3)
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
