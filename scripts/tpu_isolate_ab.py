"""Isolate the pallas+srad regression: tables 2048 vs 8192/4096, Lambertian
fast path on/off.  `python -u scripts/tpu_isolate_ab.py [steps]`"""
import dataclasses
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(n_u, n_m):
    import er3t_tpu.rtm.scene as S
    import er3t_tpu.pre.pha as P
    orig = P.build_phase_table
    S.build_phase_table = lambda *a, **k: orig(*a, **{**k, 'n_u': n_u,
                                                      'n_m': n_m})
    try:
        from tpu_profile_ablate import build as b
        return b()
    finally:
        S.build_phase_table = orig


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
    sc_s, st_s = build(2048, 2048)     # small tables
    sc_l, st_l = build(8192, 4096)     # round-2 tables
    st_s_nolam = dataclasses.replace(st_s, sfc_lambertian=False)
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    ab = abs_synthetic(650.0, atm_atmmod(levels))
    rw = spectral_factors(ab, nz_out=1)[0][0]
    cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                       tile_size=16, max_events=n_steps, use_pallas=True)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    configs = [
        ('small+lam+pal ', sc_s, st_s, cfg),
        ('small+lam+xla ', sc_s, st_s, cfg_x),
        ('small-lam+pal ', sc_s, st_s_nolam, cfg),
        ('big+lam+pal   ', sc_l, st_l, cfg),
    ]
    res = {n: [] for n, *_ in configs}
    for rnd in range(3):
        for name, scn, stt, cf in configs:
            t0 = time.time()
            tal = run_transport_flight(scn, stt, cf, 1 << 30, seed=rnd,
                                       rad_w=rw)
            _ = np.asarray(tal.rad[:1, :1])
            dt = time.time() - t0
            res[name].append(dt / n_steps * 1000)
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/n_steps*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.1f}M', flush=True)
    print('\nmedian ms/step:')
    for name in res:
        print(f'  {name}: {np.median(res[name]):6.2f} ms/step')


if __name__ == '__main__':
    main()
