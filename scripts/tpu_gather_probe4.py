"""TPU probe #4: in-loop scatter-add cost vs tally size (VMEM residency).

Hypothesis from probe #1/#2: scatter-add into a small tally (fits VMEM)
runs ~16x faster than into an HBM-sized one — the per-column flux tally
(480*480*21*3 f32 = 58 MB) would then be scatter-wall-bound no matter how
few rows per lane are scattered.  Measures marginal in-loop cost of a (B,)
scalar scatter into tallies of increasing size, plus a (B,4) 4-row variant
(the flux kcross shape) and the (B,) into 230400x16-row layout.
"""
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

_F = jnp.float32
B = 1 << 17
K = 30


def report(name, **kw):
    print(json.dumps({'probe': name, **kw}), flush=True)


def timeit(fn, *args, n=5):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


def inloop_scatter(tag, n_tal, rows_per_lane=1):
    key0 = jax.random.key(1)
    try:
        def step(i, carry):
            tal, acc = carry
            k = jax.random.fold_in(key0, i)
            u = jax.random.uniform(k, (B, rows_per_lane), dtype=_F)
            idx = (u * (n_tal - 1)).astype(jnp.int32).reshape(-1)
            tal = tal.at[idx].add(u.reshape(-1))
            return (tal, acc + u[:, 0])

        def base(i, carry):
            tal, acc = carry
            k = jax.random.fold_in(key0, i)
            u = jax.random.uniform(k, (B, rows_per_lane), dtype=_F)
            return (tal, acc + u[:, 0])

        @jax.jit
        def run(on):
            c0 = (jnp.zeros(n_tal, _F), jnp.zeros(B, _F))
            out = jax.lax.fori_loop(
                0, K, step if on else base, c0)
            return out[0][0] + out[1][0]

        t_on = timeit(run, True)
        t_off = timeit(run, False)
        report(tag, n_tal=n_tal, rows_per_lane=rows_per_lane,
               ms_per_iter=round((t_on - t_off) / K * 1e3, 4),
               ns_per_row=round((t_on - t_off) / K / (B * rows_per_lane) * 1e9, 2))
    except Exception as e:
        report(tag, error=str(e)[:200])


def main():
    report('device', kind=str(jax.devices()[0].device_kind))
    for n_tal in (1 << 18, 1 << 20, 1 << 22, 480 * 480 * 21 * 3):
        inloop_scatter(f'scatter1_{n_tal}', n_tal)
    inloop_scatter('scatter4_flux', 480 * 480 * 21 * 3, rows_per_lane=4)
    inloop_scatter('scatter4_1M', 1 << 20, rows_per_lane=4)


if __name__ == '__main__':
    main()
