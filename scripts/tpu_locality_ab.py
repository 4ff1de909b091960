"""Interleaved A/B: gather-locality levers on the real chip.

Measures ms/step at a pinned step count for the pallas+srad radiance config
with (a) coherent stratified launch (SolverConfig.launch_coherent), (b)
periodic lane re-sort by voxel column (sort_every), and (c) both; plus the
per-column flux config with the same levers.
`python -u scripts/tpu_locality_ab.py [steps]`
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
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    ab = abs_synthetic(650.0, atm_atmmod(levels))
    rw = spectral_factors(ab, nz_out=1)[0][0]
    fw = spectral_factors(ab, nz_out=st.nz + 1)[0]
    B = 1 << 17
    rb = dict(target='radiance', batch=B, n_scat_max=600, tile_size=16,
              max_events=n_steps, use_pallas=True)
    fb = dict(target='flux', batch=B, n_scat_max=600, tile_size=16,
              max_events=n_steps, flux_per_column=True, flux_kcross=4)
    configs = [
        ('rad-base     ', SolverConfig(**rb), rw, None),
        ('rad-coh      ', SolverConfig(**rb, launch_coherent=True), rw, None),
        ('rad-sort8    ', SolverConfig(**rb, launch_coherent=True,
                                       sort_every=8), rw, None),
        ('rad-sort16   ', SolverConfig(**rb, launch_coherent=True,
                                       sort_every=16), rw, None),
        ('rad-sort4    ', SolverConfig(**rb, launch_coherent=True,
                                       sort_every=4), rw, None),
        ('flux-base    ', SolverConfig(**fb), None, fw),
        ('flux-coh     ', SolverConfig(**fb, launch_coherent=True), None, fw),
        ('flux-sort8   ', SolverConfig(**fb, launch_coherent=True,
                                       sort_every=8), None, fw),
        ('flux-sort4   ', SolverConfig(**fb, launch_coherent=True,
                                       sort_every=4), None, fw),
    ]
    res = {n: [] for n, *_ in configs}
    la = {}
    for rnd in range(3):
        for name, cfg, w, f in configs:
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, 1 << 30, seed=rnd,
                                       rad_w=w, flux_w=f)
            _ = np.asarray(tal.rad[:1, :1]) + np.asarray(tal.flux[:1, :1, :1])
            dt = time.time() - t0
            steps = int(tal.n_steps)
            res[name].append(dt / steps * 1000)
            la[name] = int(tal.n_launched) / steps
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/steps*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.1f}M '
                  f'({la[name]:.0f}/step)', flush=True)
    print('\nmedian ms/step | photons/step | ph/s estimate:')
    for name in res:
        m = np.median(res[name])
        print(f'  {name}: {m:6.2f} ms/step  {la[name]:8.0f}/step  '
              f'{la[name]/m*1000/1e6:5.2f}M ph/s')


if __name__ == '__main__':
    main()
