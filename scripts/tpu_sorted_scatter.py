"""Does sorting scatter indices pay on TPU?  In-loop marginal costs of:
argsort(N), unsorted scatter-add, sorted scatter-add (indices_are_sorted),
for the radiance-image (230k tally) and per-column-flux (24M tally) shapes.
`python -u scripts/tpu_sorted_scatter.py`
"""
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np


def bench(fn, reps=3):
    import jax
    f = jax.jit(fn, static_argnums=(1,))
    out = []
    for _ in range(reps):
        t0 = time.time()
        r = np.asarray(f(jax.random.key(0), 50))
        out.append((time.time() - t0) / 50 * 1000)
    return min(out), r


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    print('devices:', jax.devices(), flush=True)

    for n_upd, n_tal, tag in [(1 << 17, 230_400, 'image'),
                              (1 << 19, 24_192_000, 'flux')]:
        def mk(body):
            def fn(key, k):
                def step(i, carry):
                    tal, acc = carry
                    kk = jax.random.fold_in(key, i)
                    idx = jax.random.randint(kk, (n_upd,), 0, n_tal)
                    w = jax.random.uniform(kk, (n_upd,))
                    tal, acc = body(tal, acc, idx, w)
                    return tal, acc
                tal0 = jnp.zeros(n_tal, jnp.float32)
                tal, acc = jax.lax.fori_loop(0, k, step,
                                             (tal0, jnp.zeros((), jnp.float32)))
                return tal.sum() + acc
            return fn

        def b_base(tal, acc, idx, w):
            return tal, acc + idx.sum() + w.sum()

        def b_unsorted(tal, acc, idx, w):
            return tal.at[idx].add(w), acc

        def b_sortonly(tal, acc, idx, w):
            si = jnp.sort(idx)
            return tal, acc + si[0].astype(jnp.float32) + w.sum()

        def b_sorted(tal, acc, idx, w):
            order = jnp.argsort(idx)
            return tal.at[idx[order]].add(
                w[order], indices_are_sorted=True), acc

        t0, _ = bench(mk(b_base))
        t1, r1 = bench(mk(b_unsorted))
        t2, _ = bench(mk(b_sortonly))
        t3, r3 = bench(mk(b_sorted))
        print(f'{tag} (N={n_upd}, tally={n_tal}):')
        print(f'  rng/base      : {t0:6.2f} ms/iter')
        print(f'  scatter       : {t1 - t0:6.2f} ms/iter marginal')
        print(f'  sort alone    : {t2 - t0:6.2f} ms/iter marginal')
        print(f'  sort+scatter  : {t3 - t0:6.2f} ms/iter marginal '
              f'(match={np.allclose(r1, r3, rtol=1e-4)})', flush=True)


if __name__ == '__main__':
    main()
