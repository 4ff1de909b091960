"""Round-5 interleaved A/B on the real chip: phase-table bins x truncation.

VERDICT r4 task 1(a)+(b): the two unburned rate leads.

* bins: 2048 (production) vs 1024 vs 512 — the Pallas phase-pair cost is
  MXU FLOPs linear in packed table rows, so halving the bin count halves
  that component (0.55 ms/step of ~2.95 at 2048).
* truncation: t20 (production, MCARaTS default) vs t25/t30/t35 with TMS —
  deeper delta-truncation removes scattering events AND weakens the
  majorant (fewer iterations/photon); first-order local estimates stay
  exact (TMS rows), only order>=2 is approximated.

Same-shape configs share a compiled kernel (truncation changes table
CONTENT only); configs are interleaved across rounds to cancel the
tunnel's 3x service drift.  Each round records ph/s, steps, and the
domain-mean radiance (bias gauge vs t20/2048 across seeds).

`python -u scripts/tpu_r5_sweep.py [photons_per_chunk] [rounds]`
"""
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ('t20_b2048', 20.0, None),     # production base
    ('t20_b1024', 20.0, 1024),
    ('t20_b512', 20.0, 512),
    ('t25_b2048', 25.0, None),
    ('t30_b2048', 30.0, None),
    ('t35_b2048', 35.0, None),
    ('t30_b1024', 30.0, 1024),     # combined candidate
]


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
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm)
    cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                      cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                      cot_scale=15.0, cloud_base=0.5, seed=7)
    pha = pha_mie_wc(650.0)           # Mie once, tables per config

    scenes = {}
    for name, trunc, bins in CONFIGS:
        scenes[name] = build_scene(
            atm, ab, cld=cld, pha=pha, surface=0.03,
            solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
            forward_trunc_deg=trunc, phase_bins=bins)
        print(f'built {name}', flush=True)

    cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                       tile_size=16, use_pallas=True, qmc_launch=True)
    factors, _ = spectral_factors(ab, nz_out=1)
    rad_w = factors[0]

    def run(name, n, seed):
        scene, st = scenes[name]
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, n, seed=seed, rad_w=rad_w)
        img = np.asarray(tal.rad)                 # forces completion
        dt = time.time() - t0
        return (int(tal.n_launched) / dt, int(tal.n_steps),
                float(img.sum() / max(int(tal.n_launched), 1)), dt)

    for name, _, _ in CONFIGS:
        t0 = time.time()
        run(name, 50_000, 0)
        print(f'warm {name}: {time.time()-t0:.1f}s', flush=True)

    res = defaultdict(list)
    for r in range(rounds):
        for name, _, _ in CONFIGS:
            rate, steps, mean, dt = run(name, chunk, 10 + r)
            res[name].append((rate, steps, mean))
            print(f'r{r} {name}: {rate/1e6:.3f}M ph/s  steps={steps}  '
                  f'mean={mean:.6e}  ({dt:.1f}s)', flush=True)

    print('\n== summary (median rate | median steps | mean rad +- seed sd) ==')
    base_mean = np.mean([m for _, _, m in res['t20_b2048']])
    for name, _, _ in CONFIGS:
        rates = [x[0] for x in res[name]]
        steps = [x[1] for x in res[name]]
        means = [x[2] for x in res[name]]
        print(f'{name}: {np.median(rates)/1e6:.3f}M ph/s  '
              f'steps={int(np.median(steps))}  '
              f'mean={np.mean(means):.6e} +- {np.std(means):.2e}  '
              f'vs_base={np.mean(means)/base_mean - 1:+.3%}', flush=True)


if __name__ == '__main__':
    main()
