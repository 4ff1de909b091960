"""TPU probe #2: Mosaic 2D-gather forms + IN-LOOP marginal op costs.

Probe #1 showed a ~2.1 ms fixed per-call tunnel overhead, so every cost here
is measured as the marginal ms/iteration of adding the op to a
``lax.fori_loop`` inside ONE jitted call (K reps), against a baseline loop.

Also enumerates which dynamic-gather forms Mosaic accepts ("Only 2D gather
is supported" from probe #1 implies some 2D form lowers).
"""
import functools
import json
import os
import time

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F = jnp.float32
B = 1 << 17
K = 50


def report(name, **kw):
    print(json.dumps({'probe': name, **kw}), flush=True)


def timeit(fn, *args, n=6):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.time() - t0)
    return float(np.median(ts))


# ---------------- part 1: Mosaic gather forms ----------------
def mosaic_form(tag, build):
    try:
        out = build()
        np.asarray(out)
        report(tag, ok=True)
        return True
    except Exception as e:
        report(tag, ok=False, error=str(e)[:160])
        return False


def try_forms():
    LB = 2048
    key = jax.random.key(0)

    def run_kernel(kern, tab_shape, idx_shape, out_shape, idx_max):
        tab = jax.random.normal(key, tab_shape, _F)
        idx = jax.random.randint(key, idx_shape, 0, idx_max, dtype=jnp.int32)
        fn = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, _F),
        )
        return jax.jit(fn)(tab, idx)

    # A: row gather — jnp.take(tab (R, W), idx (B,), axis=0)
    def kern_a(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
    mosaic_form('mosaic_take_rows_w128',
                lambda: run_kernel(kern_a, (4096, 128), (LB,), (LB, 128), 4096))
    mosaic_form('mosaic_take_rows_w8',
                lambda: run_kernel(kern_a, (4096, 8), (LB,), (LB, 8), 4096))

    # B: take_along_axis axis 0 — tab (R,128), idx (LB,128)
    def kern_b(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
    mosaic_form('mosaic_tala_axis0',
                lambda: run_kernel(kern_b, (4096, 128), (LB, 128), (LB, 128), 4096))

    # C: take_along_axis axis 1 — tab (LB,128), idx (LB,128) lane shuffle
    def kern_c(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
    mosaic_form('mosaic_tala_axis1',
                lambda: run_kernel(kern_c, (LB, 128), (LB, 128), (LB, 128), 128))

    # C2: axis 1 with wide table (lane gather across >128 columns)
    def kern_c2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
    mosaic_form('mosaic_tala_axis1_wide',
                lambda: run_kernel(kern_c2, (LB, 1024), (LB, 128), (LB, 128), 1024))

    # D: 2D take with 2D idx rows
    def kern_d(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)
    mosaic_form('mosaic_take_rows_idx2d',
                lambda: run_kernel(kern_d, (4096, 128), (LB, 1), (LB, 128), 4096))


# ---------------- part 2: in-loop marginal costs ----------------
def inloop(tag, body_extra, carry_extra=(), tables=(), n_iter=K):
    """Marginal in-loop cost of body_extra vs a trivial baseline."""
    key0 = jax.random.key(1)

    def make(with_op):
        def step(i, carry):
            acc = carry[0]
            k = jax.random.fold_in(key0, i)
            u = jax.random.uniform(k, (B,), dtype=_F)
            if with_op:
                acc = body_extra(i, u, acc, *carry[1:])
            else:
                acc = acc + u
            return (acc,) + carry[1:]

        @jax.jit
        def run(*tabs):
            c0 = (jnp.zeros(B, _F),) + tuple(tabs)
            out = jax.lax.fori_loop(0, n_iter, step, c0)
            return out[0][0]
        return run

    try:
        tabs = tuple(tables)
        t_on = timeit(make(True), *tabs)
        t_off = timeit(make(False), *tabs)
        report(tag, ms_per_iter=round((t_on - t_off) / n_iter * 1e3, 4),
               ns_per_lane=round((t_on - t_off) / n_iter / B * 1e9, 2),
               total_on_ms=round(t_on * 1e3, 1), total_off_ms=round(t_off * 1e3, 1))
    except Exception as e:
        report(tag, error=str(e)[:200])


def main():
    report('device', kind=str(jax.devices()[0].device_kind))
    try_forms()

    key = jax.random.key(2)
    nz, ng = 20, 16

    # gather 5-wide from 921600-row table (the vox gather)
    vox = jax.random.normal(key, (921600, 5), _F)
    inloop('loop_gather_vox5',
           lambda i, u, acc, t: acc + jnp.sum(
               t[(u * 921599).astype(jnp.int32)], axis=1),
           tables=(vox,))

    # gather flat phase LUT (61440 entries)
    ph = jax.random.normal(key, (61440,), _F)
    inloop('loop_gather_phase',
           lambda i, u, acc, t: acc + t[(u * 61439).astype(jnp.int32)],
           tables=(ph,))

    # gather 20-wide from 900-row table (maj_tab)
    mj = jax.random.normal(key, (900, nz), _F)
    inloop('loop_gather_maj20',
           lambda i, u, acc, t: acc + jnp.sum(
               t[(u * 899).astype(jnp.int32)], axis=1),
           tables=(mj,))

    # scatter-add (B,16) rows into a 230400x16 image
    img = jnp.zeros((230400, ng), _F)
    inloop('loop_scatter_img16',
           lambda i, u, acc, t: acc + t.at[
               (u * 230399).astype(jnp.int32)].add(
                   jnp.broadcast_to(u[:, None], (B, ng)))[0, 0],
           tables=(img,))

    # scatter-add (B,) scalars into a 230400 image
    img1 = jnp.zeros((230400,), _F)
    inloop('loop_scatter_img1',
           lambda i, u, acc, t: acc + t.at[
               (u * 230399).astype(jnp.int32)].add(u)[0],
           tables=(img1,))

    # (B, nz) elementwise block: 2 cumsums + reductions (flight core shape)
    inloop('loop_flightcore_ew',
           lambda i, u, acc: acc + (lambda od: jnp.sum(
               jnp.cumsum(od, axis=1) + jnp.cumsum(od[:, ::-1], axis=1)
               + jnp.maximum(od, 0.1), axis=1))(
                   u[:, None] * jnp.arange(1, nz + 1, dtype=_F)[None, :]))

    # the kop matmul (B, 2nz) @ (2nz, 2ng+2)
    kop = jax.random.normal(key, (2 * nz, 2 * ng + 2), _F)
    inloop('loop_kop_matmul',
           lambda i, u, acc, t: acc + jnp.sum(jnp.dot(
               jnp.broadcast_to(u[:, None], (B, 2 * nz)), t,
               preferred_element_type=_F), axis=1),
           tables=(kop,))

    # threefry (B,12) uniforms (the per-iteration RNG block)
    inloop('loop_rng12',
           lambda i, u, acc: acc + jnp.sum(jax.random.uniform(
               jax.random.fold_in(key, i), (B, 12), dtype=_F), axis=1))


if __name__ == '__main__':
    main()
