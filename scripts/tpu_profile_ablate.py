"""Ablation profile of the flight kernel on the real chip.

Costs each gather/scatter site by difference: ms/step at a FIXED iteration
count (max_events pins the while-loop trip count; a huge photon budget keeps
every lane active, so each step does full work).  Interleaved rounds cancel
tunnel drift.  `python -u scripts/tpu_profile_ablate.py [steps]`
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(ng=16):
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.pre.pha import pha_mie_wc
    from er3t_tpu.rtm.scene import build_scene
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    ab = abs_synthetic(650.0, atm, ng=ng)
    cld = cld_gen_hem(nx=480, ny=480, nz=4, dx=0.1, dy=0.1, dz=0.5,
                      cloud_frac_tgt=0.25, radii=(0.5, 1.0, 2.0),
                      cot_scale=15.0, cloud_base=0.5, seed=7)
    pha = pha_mie_wc(650.0)
    return build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                       solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                       forward_trunc_deg=20.0)


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

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    scene, st = build()
    scene1, st1 = build(ng=1)
    B = 1 << 17
    base = dict(target='radiance', batch=B, n_scat_max=600, tile_size=16,
                max_events=n_steps)
    configs = [
        ('full        ', scene, st, SolverConfig(**base)),
        ('no-deposit  ', scene, st, SolverConfig(**base, ablate='deposit')),
        ('no-phase    ', scene, st, SolverConfig(**base, ablate='phase')),
        ('no-vox      ', scene, st, SolverConfig(**base, ablate='vox')),
        ('floor(all)  ', scene, st, SolverConfig(**base,
                                                 ablate='vox,phase,deposit')),
        ('tile0       ', scene, st, SolverConfig(**{**base, 'tile_size': 0})),
        ('ng1         ', scene1, st1, SolverConfig(**base)),
    ]
    res = {n: [] for n, *_ in configs}
    for rnd in range(3):
        for name, scn, stt, cfg in configs:
            t0 = time.time()
            tal = run_transport_flight(scn, stt, cfg, 1 << 30, seed=rnd)
            _ = np.asarray(tal.rad[:1, :1])
            dt = time.time() - t0
            res[name].append(dt / n_steps * 1000)
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/n_steps*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.1f}M', flush=True)
    print('\nmedian ms/step (B=131072):')
    full = np.median(res['full        '])
    for name in res:
        m = np.median(res[name])
        print(f'  {name}: {m:6.2f} ms/step   delta vs full {full - m:+6.2f}')


if __name__ == '__main__':
    main()
