"""Round-5 residual-knob A/B: batch width x tile size at t25 + compaction.

With the drain tail compacted, the historical B=2^17 sweet spot and the
t20-tuned tile16 may no longer be optimal.  Interleaved rounds.

`python -u scripts/tpu_r5_knobs.py [photons] [rounds]`
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

    chunk = int(float(sys.argv[1])) if len(sys.argv) > 1 else 8_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm)
    cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                      cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                      cot_scale=15.0, cloud_base=0.5, seed=7)
    pha = pha_mie_wc(650.0)
    scene, st = build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                            solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                            forward_trunc_deg=25.0)
    factors, _ = spectral_factors(ab, nz_out=1)
    rad_w = factors[0]

    CONFIGS = [('b17_t16', 1 << 17, 16), ('b18_t16', 1 << 18, 16),
               ('b16_t16', 1 << 16, 16), ('b17_t24', 1 << 17, 24),
               ('b17_t32', 1 << 17, 32)]

    def run(name, batch, tile, n, seed):
        cfg = SolverConfig(target='radiance', batch=batch, n_scat_max=600,
                           tile_size=tile, use_pallas=True, qmc_launch=True)
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, n, seed=seed, rad_w=rad_w)
        np.asarray(tal.rad)
        dt = time.time() - t0
        return int(tal.n_launched) / dt, int(tal.n_steps), dt

    for name, b, t in CONFIGS:
        t0 = time.time()
        run(name, b, t, 100_000, 0)
        print(f'warm {name}: {time.time()-t0:.1f}s', flush=True)

    res = defaultdict(list)
    for r in range(rounds):
        for name, b, t in CONFIGS:
            rate, steps, dt = run(name, b, t, chunk, 10 + r)
            res[name].append(rate)
            print(f'r{r} {name}: {rate/1e6:.3f}M ph/s ({dt:.1f}s, {steps} steps)',
                  flush=True)

    print('\n== summary ==')
    for name, _, _ in CONFIGS:
        rr = sorted(res[name])
        print(f'{name}: median {np.median(rr)/1e6:.3f}M  '
              f'range {rr[0]/1e6:.2f}-{rr[-1]/1e6:.2f}M', flush=True)


if __name__ == '__main__':
    main()
