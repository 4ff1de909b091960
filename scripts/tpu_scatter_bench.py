"""Microbenchmark: XLA scatter-add shapes on the TPU (per-column flux tally).

Determines what the scatter cost scales with (rows vs elements vs tally
size) to pick the per-column flux tally structure.
`python -u scripts/tpu_scatter_bench.py`
"""
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # force via fetch
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
    return (time.time() - t0) / reps


def main():
    print('devices:', jax.devices(), flush=True)
    key = jax.random.key(0)
    N = 524_288                      # B=2^17 * kx=4 update rows
    NROW_PACKED = 4_233_600          # 480*480*49*3/8
    NROW_FLAT = NROW_PACKED * 8

    idx = jax.random.randint(key, (N,), 0, NROW_PACKED)
    idx_flat = jax.random.randint(key, (N,), 0, NROW_FLAT)
    upd128 = jnp.ones((N, 128), jnp.float32)
    upd16 = jnp.ones((N, 16), jnp.float32)
    upd1 = jnp.ones((N,), jnp.float32)

    tal128 = jnp.zeros((NROW_PACKED, 128), jnp.float32)
    tal_flat = jnp.zeros((NROW_FLAT,), jnp.float32)

    @jax.jit
    def s_rows128(t, i, u):
        return t.at[i].add(u)

    @jax.jit
    def s_scalar(t, i, u):
        return t.at[i].add(u)

    @jax.jit
    def s_window16(t, i, isub, u):
        dn = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1))
        ind = jnp.stack([i, isub * 16], axis=1)
        return lax.scatter_add(t, ind, u, dn)

    sub = jax.random.randint(key, (N,), 0, 8)

    for name, fn, args in [
        ('rows128  N   ', s_rows128, (tal128, idx, upd128)),
        ('rows128  N/4 ', s_rows128, (tal128, idx[:N // 4], upd128[:N // 4])),
        ('rows128  N/16', s_rows128, (tal128, idx[:N // 16], upd128[:N // 16])),
        ('scalar   N   ', s_scalar, (tal_flat, idx_flat, upd1)),
        ('scalar   4N  ', s_scalar, (jnp.zeros((NROW_FLAT,), jnp.float32),
                                     jnp.tile(idx_flat, 4),
                                     jnp.ones((4 * N,), jnp.float32))),
        ('window16 N   ', s_window16, (tal128, idx, sub, upd16)),
        ('smalltal r128', s_rows128, (jnp.zeros((66_150, 128), jnp.float32),
                                      idx % 66_150, upd128)),
    ]:
        try:
            dt = timeit(fn, *args)
            n_upd = args[1].shape[0] if args[1].ndim else N
            print(f'{name}: {dt*1e3:8.2f} ms  '
                  f'({dt/n_upd*1e9:7.1f} ns/row)', flush=True)
        except Exception as e:
            print(f'{name}: FAILED {type(e).__name__}: {e}', flush=True)


if __name__ == '__main__':
    main()
