"""Round-3 sweep: batch/tile for the pallas+srad radiance config, scatter
scaling (probe4 inline), and a fresh per-column flux baseline."""
import os, sys, time, json
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

    n_steps = 300
    scene, st = build()
    levels = np.concatenate([np.arange(0, 3.0, 0.5), np.arange(3.0, 20.1, 1.0)])
    ab = abs_synthetic(650.0, atm_atmmod(levels))
    rw = spectral_factors(ab, nz_out=1)[0][0]
    fw = spectral_factors(ab, nz_out=st.nz + 1)[0]

    # ---- radiance: tile x batch sweep under pallas+srad ----
    rad_cfgs = []
    for tile in (8, 16, 32):
        for b_log in (17, 18):
            rad_cfgs.append((f'rad-t{tile}-b{b_log}',
                             SolverConfig(target='radiance', batch=1 << b_log,
                                          n_scat_max=600, tile_size=tile,
                                          max_events=n_steps, use_pallas=True),
                             rw, None))
    # ---- flux per-column fresh baselines ----
    flux_base = dict(target='flux', batch=1 << 17, n_scat_max=600,
                     tile_size=16, max_events=n_steps, flux_per_column=True)
    flux_cfgs = [
        ('flux-kx4      ', SolverConfig(**flux_base, flux_kcross=4), None, fw),
        ('flux-kx8      ', SolverConfig(**flux_base, flux_kcross=8), None, fw),
        ('flux-kx4-pal  ', SolverConfig(**flux_base, flux_kcross=4,
                                        use_pallas=True), None, fw),
        ('flux-domavg   ', SolverConfig(**{**flux_base,
                                           'flux_per_column': False}), None, None),
    ]
    configs = rad_cfgs + flux_cfgs
    res = {n: [] for n, *_ in configs}
    la = {}
    for rnd in range(3):
        for name, cfg, rad_w, flux_w in configs:
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, 1 << 30, seed=rnd,
                                       rad_w=rad_w, flux_w=flux_w)
            _ = np.asarray(tal.rad if cfg.target == 'radiance' else tal.flux)
            dt = time.time() - t0
            steps = int(tal.n_steps)
            res[name].append(dt / max(steps, 1) * 1000)
            la[name] = int(tal.n_launched) / max(steps, 1)
            print(f'r{rnd} {name}: {dt:6.2f}s = {dt/max(steps,1)*1e3:6.2f} ms/step '
                  f'launched={int(tal.n_launched)/1e6:.2f}M ({la[name]:.0f}/step)',
                  flush=True)
    print('\nmedian ms/step | photons/step | ph/s estimate:')
    for name in res:
        m = np.median(res[name])
        print(f'  {name}: {m:6.2f} ms/step  {la[name]:7.0f}/step  '
              f'{la[name]/m*1000/1e6:5.2f}M ph/s')

if __name__ == '__main__':
    main()
