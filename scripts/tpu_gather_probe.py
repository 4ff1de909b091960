"""TPU probe for the round-3 mega-kernel design (run on the real chip).

Questions answered:
  1. tunnel health: tiny fixed-shape matmul rate vs stored reference
  2. XLA gather cost per row (narrow + wide rows, big tables)
  3. XLA scatter-add cost (scalar flat vs (Ng,) rows)
  4. Pallas in-kernel dynamic gather (jnp.take from a VMEM-resident table):
     supported at all? throughput?
  5. VMEM ceiling: largest table a kernel can hold

Each experiment is independently try/except'd so a Mosaic lowering failure
does not kill the probe.  Prints one JSON line per experiment.
"""
import functools
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

_F = jnp.float32


def timeit(fn, *args, n=20):
    r = fn(*args)
    r = jax.tree.map(np.asarray, r)          # force through the tunnel
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    r = jax.tree.map(np.asarray, r)
    return (time.time() - t0) / n


def report(name, **kw):
    print(json.dumps({'probe': name, **kw}), flush=True)


def main():
    dev = jax.devices()[0]
    report('device', kind=str(dev.device_kind), platform=str(dev.platform))

    # ---- 1. health: 2048^2 matmul ----
    try:
        a = jnp.ones((2048, 2048), _F)
        f = jax.jit(lambda a: a @ a)
        dt = timeit(f, a, n=10)
        gflops = 2 * 2048**3 / dt / 1e9
        report('health_matmul', ms=round(dt * 1e3, 3), gflops=round(gflops, 1))
    except Exception as e:
        report('health_matmul', error=str(e)[:200])

    B = 1 << 17
    key = jax.random.key(0)

    # ---- 2. XLA gather ----
    for rows, width, tag in [(1 << 20, 1, 'xla_gather_1w'),
                             (1 << 20, 5, 'xla_gather_5w'),
                             (1 << 20, 16, 'xla_gather_16w'),
                             (64, 1024, 'xla_gather_smalltab_wide'),
                             (61440, 1, 'xla_gather_phaseflat')]:
        try:
            tab = jax.random.normal(key, (rows, width), _F)
            idx = jax.random.randint(key, (B,), 0, rows)

            @jax.jit
            def g(tab, idx):
                return jnp.sum(tab[idx], axis=None)
            dt = timeit(g, tab, idx)
            report(tag, rows=rows, width=width,
                   ns_per_row=round(dt / B * 1e9, 2), ms=round(dt * 1e3, 3))
        except Exception as e:
            report(tag, error=str(e)[:200])

    # ---- 3. XLA scatter-add ----
    for tal_rows, width, tag in [(480 * 480, 16, 'xla_scatter_img16'),
                                 (480 * 480, 1, 'xla_scatter_img1'),
                                 (480 * 480 * 21 * 3, 1, 'xla_scatter_flux1')]:
        try:
            tal = jnp.zeros((tal_rows, width), _F)
            idx = jax.random.randint(key, (B,), 0, tal_rows)
            upd = jax.random.normal(key, (B, width), _F)

            @jax.jit
            def s(tal, idx, upd):
                return tal.at[idx].add(upd)
            dt = timeit(s, tal, idx, upd)
            report(tag, tal_rows=tal_rows, width=width,
                   ns_per_row=round(dt / B * 1e9, 2), ms=round(dt * 1e3, 3))
        except Exception as e:
            report(tag, error=str(e)[:200])

    # ---- 4. Pallas in-kernel gather ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def pallas_gather(rows, width, reps, tag, lane_block=8192):
        try:
            tab = jax.random.normal(key, (rows, width), _F)
            idx = jax.random.randint(key, (B,), 0, rows, dtype=jnp.int32)

            def kern(idx_ref, tab_ref, out_ref):
                ix = idx_ref[:]
                acc = jnp.zeros((lane_block,), _F)
                for r in range(reps):
                    v = tab_ref[:, 0] if width else None
                    g = jnp.take(tab_ref[:, min(r, width - 1)],
                                 (ix + r) % rows, axis=0)
                    acc = acc + g
                out_ref[:] = acc

            fn = pl.pallas_call(
                kern,
                grid=(B // lane_block,),
                in_specs=[pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows, width), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B,), _F),
            )
            f = jax.jit(lambda i, t: fn(i, t))
            dt = timeit(f, idx, tab)
            report(tag, rows=rows, width=width, reps=reps,
                   ns_per_row=round(dt / (B * reps) * 1e9, 2),
                   ms=round(dt * 1e3, 3))
        except Exception as e:
            report(tag, error=str(e)[:300])

    pallas_gather(61440, 1, 1, 'pallas_take_phase_1x')
    pallas_gather(61440, 1, 4, 'pallas_take_phase_4x')
    pallas_gather(1 << 20, 1, 1, 'pallas_take_1M_1x')
    pallas_gather(1 << 20, 1, 4, 'pallas_take_1M_4x')

    # 2D row gather via take of flattened (row*width + col)?
    def pallas_gather_2d(rows, width, tag, lane_block=8192):
        try:
            tab = jax.random.normal(key, (rows * width,), _F)
            idx = jax.random.randint(key, (B,), 0, rows, dtype=jnp.int32)

            def kern(idx_ref, tab_ref, out_ref):
                ix = idx_ref[:] * width
                acc = jnp.zeros((lane_block,), _F)
                for c in range(width):
                    acc = acc + jnp.take(tab_ref[:], ix + c, axis=0)
                out_ref[:] = acc

            fn = pl.pallas_call(
                kern,
                grid=(B // lane_block,),
                in_specs=[pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows * width,), lambda i: (0,),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B,), _F),
            )
            f = jax.jit(lambda i, t: fn(i, t))
            dt = timeit(f, idx, tab)
            report(tag, rows=rows, width=width,
                   ns_per_lane=round(dt / B * 1e9, 2), ms=round(dt * 1e3, 3))
        except Exception as e:
            report(tag, error=str(e)[:300])

    pallas_gather_2d(921600, 2, 'pallas_take_vox2w')

    # ---- 4b. Pallas one-hot MXU gather for a small table ----
    def pallas_onehot(rows, width, tag, lane_block=1024):
        try:
            tab = jax.random.normal(key, (rows, width), _F)
            idx = jax.random.randint(key, (B,), 0, rows, dtype=jnp.int32)

            def kern(idx_ref, tab_ref, out_ref):
                ix = idx_ref[:].reshape(lane_block, 1)
                cols = jax.lax.broadcasted_iota(jnp.int32, (lane_block, rows), 1)
                oh = (cols == ix).astype(_F)
                v = jnp.dot(oh, tab_ref[:], preferred_element_type=_F)
                out_ref[:] = jnp.sum(v, axis=1)

            fn = pl.pallas_call(
                kern,
                grid=(B // lane_block,),
                in_specs=[pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((rows, width), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((lane_block,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B,), _F),
            )
            f = jax.jit(lambda i, t: fn(i, t))
            dt = timeit(f, idx, tab)
            report(tag, rows=rows, width=width,
                   ns_per_row=round(dt / B * 1e9, 2), ms=round(dt * 1e3, 3))
        except Exception as e:
            report(tag, error=str(e)[:300])

    pallas_onehot(64, 128, 'pallas_onehot_64x128')
    pallas_onehot(512, 128, 'pallas_onehot_512x128')

    # ---- 5. VMEM ceiling ----
    for mb in (4, 8, 16, 32, 64, 96, 120):
        try:
            n = mb * (1 << 20) // 4
            tab = jnp.ones((n,), _F)

            def kern(tab_ref, out_ref):
                out_ref[0] = tab_ref[0] + tab_ref[n - 1]

            fn = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1,), _F),
            )
            np.asarray(jax.jit(fn)(tab))
            report('vmem_ceiling', mb=mb, ok=True)
        except Exception as e:
            report('vmem_ceiling', mb=mb, ok=False, error=str(e)[:150])
            break


if __name__ == '__main__':
    main()
