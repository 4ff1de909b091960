"""Interleaved A/B on the real chip: truncation x tile_size.

Alternates configs across rounds to cancel tunnel-service drift.
`python -u scripts/tpu_ab_sweep.py`
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(trunc):
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
    return build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                       solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                       forward_trunc_deg=trunc)


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    print('devices:', jax.devices(), flush=True)

    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    scenes = {t: build(t) for t in (5.0, 20.0)}
    configs = [(5.0, 0), (20.0, 0), (20.0, 16), (20.0, 32), (20.0, 64)]
    chunk = 2_000_000

    # compile+warm all configs first
    for trunc, ts in configs:
        scene, st = scenes[trunc]
        cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                           tile_size=ts)
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, 50_000, seed=0)
        _ = np.asarray(tal.rad)
        print(f'warm t{trunc:.0f}/tile{ts}: {time.time()-t0:.1f}s', flush=True)

    acc = {c: [0, 0.0, 0] for c in configs}   # photons, wall, steps
    for rnd in range(3):
        for trunc, ts in configs:
            scene, st = scenes[trunc]
            cfg = SolverConfig(target='radiance', batch=1 << 17,
                               n_scat_max=600, tile_size=ts)
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, chunk, seed=10 + rnd)
            _ = np.asarray(tal.rad)
            dt = time.time() - t0
            a = acc[(trunc, ts)]
            a[0] += int(tal.n_launched)
            a[1] += dt
            a[2] += int(tal.n_steps)
            print(f'r{rnd} t{trunc:.0f}/tile{ts:2d}: {int(tal.n_launched)/dt/1e6:.3f}M ph/s '
                  f'steps={int(tal.n_steps)} ({dt/int(tal.n_steps)*1e3:.1f} ms/step)',
                  flush=True)

    print('--- totals ---')
    for c, (n, w, s) in acc.items():
        print(f't{c[0]:.0f}/tile{c[1]:2d}: {n/w/1e6:.3f}M ph/s  '
              f'{w/s*1e3:.1f} ms/step  {s} steps')


if __name__ == '__main__':
    main()
