"""Ablation profile of the pallas+srad production config on the real chip.

Round-3 follow-up to tpu_profile_ablate.py: the production radiance config
is now use_pallas (MXU phase pair) + rad_w (scalar deposits); this script
re-derives the per-site marginal costs under that config to target the
next optimization.  `python -u scripts/tpu_ablate2.py [steps]`
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_profile_ablate import build


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
    from er3t_tpu.rtm.out import spectral_factors
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.atm import atm_atmmod

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    scene, st = build()
    scene1, st1 = build(ng=1)
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    atm = atm_atmmod(levels)
    rw = spectral_factors(abs_synthetic(650.0, atm), nz_out=1)[0][0]
    rw1 = spectral_factors(abs_synthetic(650.0, atm, ng=1), nz_out=1)[0][0]
    B = 1 << 17
    base = dict(target='radiance', batch=B, n_scat_max=600, tile_size=16,
                max_events=n_steps, use_pallas=True)
    configs = [
        ('full        ', scene, st, SolverConfig(**base), rw),
        ('no-deposit  ', scene, st, SolverConfig(**base, ablate='deposit'), rw),
        ('no-vox      ', scene, st, SolverConfig(**base, ablate='vox'), rw),
        ('no-phase    ', scene, st,
         SolverConfig(**{**base, 'use_pallas': False}, ablate='phase'), rw),
        ('tile0       ', scene, st,
         SolverConfig(**{**base, 'tile_size': 0}), rw),
        ('ng1         ', scene1, st1, SolverConfig(**base), rw1),
        ('floor       ', scene, st,
         SolverConfig(**{**base, 'use_pallas': False},
                      ablate='vox,phase,deposit'), rw),
    ]
    res = {n: [] for n, *_ in configs}
    for rnd in range(3):
        for name, scn, stt, cfg, w in configs:
            t0 = time.time()
            tal = run_transport_flight(scn, stt, cfg, 1 << 30, seed=rnd,
                                       rad_w=w)
            _ = np.asarray(tal.rad[:1, :1])
            dt = time.time() - t0
            res[name].append(dt / n_steps * 1000)
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/n_steps*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.1f}M', flush=True)
    print('\nmedian ms/step (B=131072, pallas+srad):')
    full = np.median(res['full        '])
    for name in res:
        m = np.median(res[name])
        print(f'  {name}: {m:6.2f} ms/step   delta vs full {full - m:+6.2f}')


if __name__ == '__main__':
    main()
