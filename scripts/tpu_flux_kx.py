"""Per-column flux kx sweep on the real chip (post lane-major layout).

The crossing-count clamp trades scatter rows (kx per lane-iteration) against
extra clamp iterations; this finds the sweet spot at 480x480.
`python -u scripts/tpu_flux_kx.py [steps]`
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
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    print('devices:', jax.devices(), flush=True)
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight
    from er3t_tpu.rtm.out import spectral_factors
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.atm import atm_atmmod

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    scene, st = build()
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    ab = abs_synthetic(650.0, atm_atmmod(levels))
    fw = spectral_factors(ab, nz_out=st.nz + 1)[0]
    base = dict(target='flux', batch=1 << 17, n_scat_max=600, tile_size=16,
                max_events=n_steps, flux_per_column=True)
    configs = [(f'kx{k}', SolverConfig(**base, flux_kcross=k))
               for k in (2, 3, 4, 6)]
    configs.append(('domavg', SolverConfig(**{**base,
                                              'flux_per_column': False})))
    res = {n: [] for n, *_ in configs}
    la = {}
    for rnd in range(3):
        for name, cfg in configs:
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, 1 << 30, seed=rnd,
                                       flux_w=fw if cfg.flux_per_column
                                       else None)
            _ = np.asarray(tal.flux[:1, :1, :1])
            dt = time.time() - t0
            res[name].append(dt / n_steps * 1000)
            la[name] = int(tal.n_launched) / n_steps
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/n_steps*1e3:6.2f} ms/step '
                  f'({la[name]:.0f}/step)', flush=True)
    print('\nmedian ms/step | ph/s estimate:')
    for name in res:
        m = np.median(res[name])
        print(f'  {name}: {m:6.2f} ms/step  {la[name]/m*1000/1e6:5.2f}M ph/s')


if __name__ == '__main__':
    main()
