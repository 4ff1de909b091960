"""Benchmark: LES-like 480x480 Mie nadir-radiance scene, photons/sec/chip.

Twin of the reference's headline workload (examples/00_er3t_mca.py
example_05: 480x480 LES scene, 650 nm nadir radiance, Mie phase, 16 g-points;
45 s for 3e8 single-g photons on 24 CPUs => 6.7e6 photons/s — BASELINE.md).
The LES netCDF is not redistributable, so an equivalent broken-cloud field
(480x480, 25% cover, COT<=30, reff 10 um) is generated in-framework.

Metric: g-point photon samples per second per chip.  Every transported
photon here carries all 16 correlated g-point weights (the reference
launches one photon per g), so g-samples/s = photons/s * 16 is the
apples-to-apples rate against the reference's photons/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np


BASELINE_PHOTONS_PER_S = 6.7e6  # reference, 24 CPUs (BASELINE.md)


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
    # 20 deg forward truncation = MCARaTS's own default (Sca_qtfmax); the
    # TMS correction (pre/pha.py p_tms) keeps first-order scattering exact,
    # validated to ~1% of the untruncated estimate (BENCH_NOTES.md)
    scene, st = build_scene(atm, ab, cld=cld, pha=pha, surface=0.03,
                            solar_zenith_angle=30.0, solar_azimuth_angle=45.0,
                            forward_trunc_deg=20.0)
    return ab, scene, st


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from er3t_tpu.rtm.mc import SolverConfig
    from er3t_tpu.rtm.mc_flight import run_transport_flight

    ab, scene, st = build()
    # big chunks amortize the straggler drain tail of each while-loop call;
    # n_scat_max=600 bounds pathological walks (negligible energy at that
    # order in delta-truncated clouds)
    # tile_size=16: per-tile majorants (measured 3.5x on-chip vs the global
    # per-layer majorant on this scene — scripts/tpu_ab_sweep.py)
    cfg = SolverConfig(target='radiance', batch=1 << 17, n_scat_max=600,
                       tile_size=16)

    # warm-up / compile
    tal = run_transport_flight(scene, st, cfg, 100_000, seed=0)
    _ = np.asarray(tal.rad)

    # adaptive chunks: the while-loop drain tail (in-cloud stragglers) is a
    # fixed ~200-step cost per chunk, so bigger chunks amortize it (~2x at
    # 8M vs 2M).  Start small and double while the tunneled chip is healthy
    # (long device calls can fault the tunnel, CLAUDE.md).
    chunk = 4_000_000
    target_seconds = 120.0
    n_done = 0
    t_used = 0.0
    i = 0
    while t_used < target_seconds and i < 32:
        t0 = time.time()
        try:
            tal = run_transport_flight(scene, st, cfg, chunk, seed=1 + i)
            _ = np.asarray(tal.rad)   # forces real completion on tunneled chips
        except Exception as e:       # tunnel hiccup: report what we have
            print(f'# chunk {i} failed: {e}', file=sys.stderr)
            break
        dt = time.time() - t0
        n_done += int(tal.n_launched)
        t_used += dt
        i += 1
        if dt < 25.0 and chunk < 32_000_000:
            chunk *= 2
        elif dt > 90.0 and chunk > 4_000_000:
            chunk //= 2

    if n_done == 0 or t_used == 0:
        print(json.dumps({'metric': 'gpoint_photon_samples_per_sec_per_chip',
                          'value': 0.0, 'unit': '1/s', 'vs_baseline': 0.0}))
        return

    photons_per_s = n_done / t_used
    g_samples_per_s = photons_per_s * ab.ng
    print(json.dumps({
        'metric': 'gpoint_photon_samples_per_sec_per_chip',
        'value': round(g_samples_per_s, 1),
        'unit': '1/s',
        'vs_baseline': round(g_samples_per_s / BASELINE_PHOTONS_PER_S, 3),
    }))


if __name__ == '__main__':
    main()
