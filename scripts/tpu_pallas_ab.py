"""Interleaved A/B on the real chip: Pallas phase-pair + scalar deposits.

Pins the while-loop at a fixed step count (like tpu_profile_ablate) and
compares ms/step of: baseline XLA kernel, +scalar rad deposits (rad_w),
+Pallas phase pair (use_pallas), and both.  `python -u scripts/tpu_pallas_ab.py [steps]`
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

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    scene, st = build()
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.atm import atm_atmmod
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    ab = abs_synthetic(650.0, atm_atmmod(levels))
    rw = spectral_factors(ab, nz_out=1)[0][0]
    B = 1 << 17
    base = dict(target='radiance', batch=B, n_scat_max=600, tile_size=16,
                max_events=n_steps)
    configs = [
        ('xla         ', SolverConfig(**base), None),
        ('scalar-rad  ', SolverConfig(**base), rw),
        ('pallas      ', SolverConfig(**base, use_pallas=True), None),
        ('pallas+srad ', SolverConfig(**base, use_pallas=True), rw),
    ]
    res = {n: [] for n, *_ in configs}
    ref = {}
    for rnd in range(3):
        for name, cfg, rad_w in configs:
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, 1 << 30, seed=rnd,
                                       rad_w=rad_w)
            img = np.asarray(tal.rad)
            dt = time.time() - t0
            res[name].append(dt / n_steps * 1000)
            s = float((img @ rw if img.shape[-1] > 1 else img[..., 0]).sum()) \
                / max(int(tal.n_launched), 1)
            ref[name] = s
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/n_steps*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.1f}M mean={s:.4e}',
                  flush=True)
    print('\nmedian ms/step (B=131072):')
    for name in res:
        print(f'  {name}: {np.median(res[name]):6.2f} ms/step  mean={ref[name]:.4e}')


if __name__ == '__main__':
    main()
