"""Camera launch-importance A/B (VERDICT r4 item 9): per-pixel variance
of the ground-fisheye camera image at fixed photon budget, uniform launch
vs the 50/50 camera-centered wrapped-Gaussian mixture
(SolverConfig.cam_importance_sigma), several seeds on the CPU backend.

python scripts/cam_importance_ab.py [photons] [seeds]
"""
import os
import sys
import time

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from er3t_tpu.pre.atm import atm_atmmod
    from er3t_tpu.pre.abs import abs_synthetic
    from er3t_tpu.pre.cld import cld_gen_hem
    from er3t_tpu.rtm.scene import build_scene
    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    n_ph = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    n_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    qmax = float(sys.argv[3]) if len(sys.argv) > 3 else 85.0

    atm = atm_atmmod(np.concatenate([np.arange(0, 5.0, 0.5),
                                     np.arange(5.0, 20.1, 1.0)]))
    ab = abs_synthetic(650.0, atm)
    # 16x16 km broken-cloud sky over a central camera: most of the domain
    # is far from the camera's effective footprint
    cld = cld_gen_hem(nx=32, ny=32, nz=3, dx=0.5, dy=0.5, dz=0.5,
                      cloud_frac_tgt=0.3, radii=(1.0, 2.0),
                      cot_scale=8.0, cloud_base=1.0, seed=5)
    scn, st = build_scene(atm, ab, cld=cld, surface=0.1,
                          solar_zenith_angle=40.0, solar_azimuth_angle=0.0,
                          forward_trunc_deg=20.0)

    for sig in (0.0, 1.0, 2.0, 4.0):
        cfg = SolverConfig(target='radiance', batch=1 << 12,
                           sensor_type='camera', cam_npix=16, cam_qmax=qmax,
                           cam_importance_sigma=sig, n_scat_max=400)
        imgs = []
        t0 = time.time()
        for s in range(n_seed):
            tal = run_transport_flight(scn, st, cfg, n_ph, seed=100 + s)
            imgs.append((np.asarray(tal.rad) @ ab.weight)
                        / int(tal.n_launched))
        wall = time.time() - t0
        imgs = np.stack(imgs)
        mean = imgs.mean(axis=0)
        var = imgs.var(axis=0, ddof=1)
        # fisheye-active pixels only
        act = mean > 0
        print(f'sigma={sig:.1f}: mean={mean[act].mean():.5e}  '
              f'pixvar={var[act].mean():.4e}  '
              f'rel={var[act].mean():.3e}  wall={wall:.0f}s', flush=True)


if __name__ == '__main__':
    main()
