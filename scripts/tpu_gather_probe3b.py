"""TPU probe #3: Mosaic dynamic-gather shape rules + phase-pair kernel cost.

The phase tables are pt_mu (20, 8192) and pt_p (40, 4096).  Candidate
Pallas replacements for the two XLA LUT gathers (measured 1.87 ms/step
in-kernel by ablation):

  A. dynamic-gather axis0 with equal shapes (if Mosaic accepts it)
  B. one-hot (row, bin_hi) @ (rows*blocks, 128) MXU matmul + axis1 shuffle

All in-loop (fori_loop K reps inside one jit) to cancel the ~2 ms tunnel
dispatch overhead.
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


def mosaic_form(tag, kern, shapes, idx_max):
    key = jax.random.key(0)
    try:
        out_shape = shapes[-1][1]
        args = []
        for kind, shape in shapes[:-1]:
            if kind == 'f':
                args.append(jax.random.normal(key, shape, _F))
            else:
                args.append(jax.random.randint(key, shape, 0, idx_max,
                                               dtype=jnp.int32))
        fn = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, _F),
        )
        np.asarray(jax.jit(fn)(*args))
        report(tag, ok=True)
    except Exception as e:
        report(tag, ok=False, error=str(e)[:160])


def kern_a(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


def main():
    report('device', kind=str(jax.devices()[0].device_kind))


    # ---------------- phase-pair kernel candidates ----------------
    NPF2, NM = 40, 4096      # eval rows (working + TMS), eval bins
    NPF, NU = 20, 8192       # sample rows, sample bins
    NBL_E = NM // 128        # 32
    NBL_S = NU // 128        # 64
    KE = NPF2 * NBL_E        # 1280
    KS = NPF * NBL_S         # 1280

    key = jax.random.key(2)
    pt_p = jax.random.normal(key, (NPF2, NM), _F)
    pt_mu = jax.random.normal(key, (NPF, NU), _F)
    p_e = pt_p.reshape(KE, 128)
    p_s = pt_mu.reshape(KS, 128)

    def make_pair(lb, dtype):
        tp = p_e.astype(dtype)
        ts = p_s.astype(dtype)

        def kern(apf_ref, mu_ref, u_ref, first_ref, tp_ref, ts_ref,
                 pe_ref, mn_ref):
            apf = apf_ref[:].reshape(lb // 128, 128)
            mu = mu_ref[:].reshape(lb // 128, 128)
            u = u_ref[:].reshape(lb // 128, 128)
            first = first_ref[:].reshape(lb // 128, 128)
            # eval index
            ib = jnp.clip(((mu + 1.0) * 0.5 * (NM - 1) + 0.5).astype(jnp.int32),
                          0, NM - 1)
            row_e = apf + first * NPF
            ke = row_e * NBL_E + (ib >> 7)
            # sample index
            iu = jnp.clip((u * (NU - 1) + 0.5).astype(jnp.int32), 0, NU - 1)
            ks = apf * NBL_S + (iu >> 7)

            outs = []
            for kk, tab_ref, kdim, lo in ((ke, tp_ref, KE, ib),
                                          (ks, ts_ref, KS, iu)):
                k2 = kk.reshape(lb, 1)
                cols = jax.lax.broadcasted_iota(jnp.int32, (lb, kdim), 1)
                oh = (cols == k2).astype(dtype)
                v = jnp.dot(oh, tab_ref[:], preferred_element_type=_F)
                v = v.reshape(lb // 128, 128, 128)
                # select lane lo & 127 within each 128 block: axis1 shuffle
                sel = jnp.take_along_axis(
                    v.reshape(lb, 128),
                    (lo.reshape(lb, 1) & 127), axis=1)
                outs.append(sel.reshape(lb // 128, 128))
            pe_ref[:] = outs[0].reshape(lb)
            mn_ref[:] = outs[1].reshape(lb)

        lane = lambda: pl.BlockSpec((lb,), lambda i: (i,),
                                    memory_space=pltpu.VMEM)
        tspec = lambda rows: pl.BlockSpec((rows, 128), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        fn = pl.pallas_call(
            kern,
            grid=(B // lb,),
            in_specs=[lane(), lane(), lane(), lane(),
                      tspec(KE), tspec(KS)],
            out_specs=(lane(), lane()),
            out_shape=(jax.ShapeDtypeStruct((B,), _F),
                       jax.ShapeDtypeStruct((B,), _F)),
        )
        return fn, tp, ts

    def inloop_pair(tag, lb, dtype):
        try:
            fn, tp2, ts2 = make_pair(lb, dtype)
            key0 = jax.random.key(3)

            def step(i, acc):
                k = jax.random.fold_in(key0, i)
                u = jax.random.uniform(k, (B, 3), dtype=_F)
                apf = (u[:, 0] * (NPF - 1)).astype(jnp.int32)
                first = (u[:, 2] > 0.5).astype(jnp.int32)
                pe, mn = fn(apf, u[:, 1] * 2 - 1, u[:, 2], first, tp2, ts2)
                return acc + pe + mn

            @jax.jit
            def run():
                return jax.lax.fori_loop(0, K, step,
                                         jnp.zeros(B, _F))[0]

            def base_step(i, acc):
                k = jax.random.fold_in(key0, i)
                u = jax.random.uniform(k, (B, 3), dtype=_F)
                return acc + u[:, 0] + u[:, 1]

            @jax.jit
            def base():
                return jax.lax.fori_loop(0, K, base_step,
                                         jnp.zeros(B, _F))[0]

            t_on = timeit(run)
            t_off = timeit(base)
            report(tag, ms_per_iter=round((t_on - t_off) / K * 1e3, 4),
                   total_on_ms=round(t_on * 1e3, 1))
        except Exception as e:
            report(tag, error=str(e)[:250])

    inloop_pair('pair_onehot_bf16_lb1024', 1024, jnp.bfloat16)
    inloop_pair('pair_onehot_bf16_lb2048', 2048, jnp.bfloat16)
    inloop_pair('pair_onehot_f32_lb1024', 1024, _F)

    # XLA reference: the same two gathers through XLA in-loop
    key0 = jax.random.key(4)
    ppf = pt_p.reshape(-1)
    pmf = pt_mu.reshape(-1)

    def xstep(i, acc):
        k = jax.random.fold_in(key0, i)
        u = jax.random.uniform(k, (B, 3), dtype=_F)
        apf = (u[:, 0] * (NPF - 1)).astype(jnp.int32)
        mu = u[:, 1] * 2 - 1
        ib = jnp.clip(((mu + 1.0) * 0.5 * (NM - 1) + 0.5).astype(jnp.int32),
                      0, NM - 1)
        iu = jnp.clip((u[:, 2] * (NU - 1) + 0.5).astype(jnp.int32), 0, NU - 1)
        pe = jnp.take(ppf, (apf + (u[:, 2] > 0.5) * NPF) * NM + ib)
        mn = jnp.take(pmf, apf * NU + iu)
        return acc + pe + mn

    def xbase(i, acc):
        k = jax.random.fold_in(key0, i)
        u = jax.random.uniform(k, (B, 3), dtype=_F)
        return acc + u[:, 0] + u[:, 1]

    @jax.jit
    def xrun():
        return jax.lax.fori_loop(0, K, xstep, jnp.zeros(B, _F))[0]

    @jax.jit
    def xbaserun():
        return jax.lax.fori_loop(0, K, xbase, jnp.zeros(B, _F))[0]

    t_on = timeit(xrun)
    t_off = timeit(xbaserun)
    report('pair_xla_gathers', ms_per_iter=round((t_on - t_off) / K * 1e3, 4))


if __name__ == '__main__':
    main()
