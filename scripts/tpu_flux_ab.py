"""Interleaved A/B on the real chip: per-column flux crossing-count clamp.

Round-1 bottleneck: per-column 480x480 flux scattered B x (Nz+1) tally rows
per iteration (0.033M ph/s vs 3.54M domain-average — BENCH_NOTES).  The
crossing-count clamp (SolverConfig.flux_kcross) bounds the scatter to
kx rows/lane/iteration.  Alternates configs across rounds to cancel
tunnel-service drift.  `python -u scripts/tpu_flux_ab.py [photons]`
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build():
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
    return ab, *build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
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

    from er3t_tpu.rtm.out import spectral_factors

    n_phot = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    ab, scene, st = build()
    fw, _ = spectral_factors(ab, nz_out=st.nz + 1)
    configs = [('scalar-kx4', dict(flux_kcross=4), True),
               ('scalar-kx8', dict(flux_kcross=8), True),
               ('kx4', dict(flux_kcross=4), False),
               ('kx0-legacy', dict(flux_kcross=0), False),
               ('domavg', dict(flux_kcross=0, flux_per_column=False), False)]
    results = {k: [] for k, _, _ in configs}
    sfc = {}
    for rnd in range(3):
        for name, kw, use_fw in configs:
            cfg = SolverConfig(target='flux', batch=1 << 17, n_scat_max=600,
                               tile_size=16,
                               **{**dict(flux_per_column=True), **kw})
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, n_phot, seed=rnd,
                                       flux_w=fw if use_fw else None)
            flux = np.asarray(tal.flux)   # forces completion
            dt = time.time() - t0
            n = int(tal.n_launched)
            rate = n / dt
            results[name].append(rate)
            if flux.shape[-1] == 1:     # scalar (factor-contracted) tally
                f = flux[..., 0] / fw.sum(axis=1)[None, None, :, None]
            else:
                f = flux @ ab.weight
            ncol = f.shape[0] * f.shape[1]
            sfc[name] = (f[:, :, 0, 0].mean() + f[:, :, 0, 1].mean()) / n * ncol
            print(f'r{rnd} {name:12s}: {n/1e6:.1f}M ph in {dt:6.2f}s = '
                  f'{rate/1e6:6.3f}M ph/s  steps={int(tal.n_steps):5d} '
                  f'sfc_dn={sfc[name]:.4f}', flush=True)
    print('\nmedian ph/s by config:')
    for name, _, _ in configs:
        med = np.median(results[name])
        print(f'  {name:12s}: {med/1e6:6.3f}M ph/s   sfc_dn={sfc[name]:.4f}')


if __name__ == '__main__':
    main()
