"""Second TPU A/B: tile granularity {8,12,16,24} and chunk size {2M,8M}."""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    print('devices:', jax.devices(), flush=True)

    from bench import build
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    ab, scene, st = build()          # t20 per bench.py
    cases = [(8, 2), (12, 2), (16, 2), (24, 2), (16, 8)]
    for ts, ch in cases:
        cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                           tile_size=ts)
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, 50_000, seed=0)
        _ = np.asarray(tal.rad)
        print(f'warm tile{ts}: {time.time()-t0:.1f}s', flush=True)
    for rnd in range(2):
        for ts, ch in cases:
            cfg = SolverConfig(target='radiance', batch=1 << 17,
                               n_scat_max=600, tile_size=ts)
            chunk = ch * 1_000_000
            t0 = time.time()
            tal = run_transport_flight(scene, st, cfg, chunk, seed=21 + rnd)
            _ = np.asarray(tal.rad)
            dt = time.time() - t0
            print(f'r{rnd} tile{ts:2d}/chunk{ch}M: '
                  f'{int(tal.n_launched)/dt/1e6:.3f}M ph/s  '
                  f'steps={int(tal.n_steps)}  '
                  f'{dt/int(tal.n_steps)*1e3:.1f} ms/step', flush=True)


if __name__ == '__main__':
    main()
