"""Drain-compaction A/B on the real chip (VERDICT r4 task 1c).

Configs: truncation {t20, t25} x drain_compact {off, on}, interleaved
across rounds (tunnel drift cancels).  4M-photon chunks hit the drain
tail hard (the r5 sweep measured 1400-7400-step seed-dependent tails vs
~550 productive steps); production 8-32M chunks amortize less often but
pay the same tail per call.

`python -u scripts/tpu_drain_ab.py [photons] [rounds]`
"""
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    print('devices:', jax.devices(), flush=True)

    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight
    from er3t_tpu.rtm.out import spectral_factors

    chunk = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm)
    cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                      cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                      cot_scale=15.0, cloud_base=0.5, seed=7)
    pha = pha_mie_wc(650.0)
    scenes = {}
    for tr in (20.0, 25.0):
        scenes[tr] = build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                                 solar_zenith_angle=30.0,
                                 solar_azimuth_angle=45.0,
                                 forward_trunc_deg=tr)
    factors, _ = spectral_factors(ab, nz_out=1)
    rad_w = factors[0]

    CONFIGS = [(f't{tr:.0f}_dc{int(dc)}', tr, dc)
               for tr in (20.0, 25.0) for dc in (False, True)]

    def cfg_for(dc):
        return SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                            tile_size=16, use_pallas=True, qmc_launch=True,
                            drain_compact=dc)

    def run(tr, dc, n, seed):
        scene, st = scenes[tr]
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg_for(dc), n, seed=seed,
                                   rad_w=rad_w)
        img = np.asarray(tal.rad)
        dt = time.time() - t0
        return (int(tal.n_launched) / dt, int(tal.n_steps),
                float(img.sum() / max(int(tal.n_launched), 1)), dt)

    for name, tr, dc in CONFIGS:
        t0 = time.time()
        run(tr, dc, 50_000, 0)
        print(f'warm {name}: {time.time()-t0:.1f}s', flush=True)

    res = defaultdict(list)
    for r in range(rounds):
        for name, tr, dc in CONFIGS:
            rate, steps, mean, dt = run(tr, dc, chunk, 10 + r)
            res[name].append((rate, steps, mean))
            print(f'r{r} {name}: {rate/1e6:.3f}M ph/s  steps={steps}  '
                  f'mean={mean:.6e}  ({dt:.1f}s)', flush=True)

    print('\n== summary ==')
    for name, tr, dc in CONFIGS:
        rates = sorted(x[0] for x in res[name])
        means = [x[2] for x in res[name]]
        print(f'{name}: median {np.median(rates)/1e6:.3f}M  '
              f'min {rates[0]/1e6:.3f}M  max {rates[-1]/1e6:.3f}M  '
              f'mean={np.mean(means):.6e} +- {np.std(means):.2e}', flush=True)


if __name__ == '__main__':
    main()
