"""TPU sweep: bench-scene throughput vs SolverConfig.tile_size.

Run on the real chip: `python -u scripts/tpu_tile_sweep.py [tile ...]`.
One chunk per tile size after a small warm-up compile.
"""
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    print('devices:', jax.devices(), flush=True)

    from bench import build
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    ab, scene, st = build()
    tiles = [int(a) for a in sys.argv[1:]] or [0, 16, 32, 64]
    chunk = 4_000_000
    for ts in tiles:
        cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                           tile_size=ts)
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, 100_000, seed=0)
        r_warm = np.asarray(tal.rad)
        print(f'tile={ts:3d} compile+warm {time.time()-t0:.1f}s', flush=True)
        t0 = time.time()
        tal = run_transport_flight(scene, st, cfg, chunk, seed=1)
        rad = np.asarray(tal.rad)
        dt = time.time() - t0
        n = int(tal.n_launched)
        print(f'tile={ts:3d}  {n/dt/1e6:.2f}M ph/s  steps={int(tal.n_steps)}'
              f'  wall={dt:.1f}s  mean_rad={float((rad @ ab.weight).mean()):.4e}',
              flush=True)


if __name__ == '__main__':
    main()
