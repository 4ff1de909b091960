"""Instrumented decomposed transport: per-superstep population diagnostics.

Runs the transport_decomp superstep structure manually (jit per superstep)
and prints alive/frozen/launched counts per device — the tool that found
the roaming zombies (round 4).

Usage: python scripts/debug_decomp_drain.py [n_dev] [photons]
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update('jax_platforms', 'cpu')

import dataclasses
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scripts.cpu_scaling_bench import build_scene_mid
from er3t_tpu.dist import decomp as D
from er3t_tpu.dist.mesh import make_mesh
from er3t_tpu.rtm.mc import SolverConfig
from er3t_tpu.rtm.mc_flight import SlabSpec, make_flight_kernel
from er3t_tpu.rtm.out import spectral_factors


def main():
    n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_photon = int(float(sys.argv[2])) if len(sys.argv) > 2 else 40000
    ab, scene, st = build_scene_mid(96, 96)
    factors, _ = spectral_factors(ab, nz_out=1)
    cfg = SolverConfig(target='radiance', batch=1 << 10, n_scat_max=600,
                       tile_size=8)
    mesh = make_mesh(n_dev, decomp=n_dev)
    B = cfg.batch
    nx_loc = st.nx // n_dev
    st_loc = dataclasses.replace(st, nx=nx_loc)
    slab = SlabSpec(nx_global=st.nx, nx_local=nx_loc)
    n_per = n_photon // n_dev
    M = B // 4
    reserve = min(M // 2, B // 8)
    zd_top_v = float(np.asarray(scene.z_lev)[st.iz3l + st.nz3])

    # per-device kernels under shard_map, ONE superstep per jit call,
    # carry handed back and forth so we can inspect it
    k_super = 16
    specs3d = {'ext3d', 'ssa3d', 'apf3d', 'cf3d'}
    in_specs = type(scene)(*[P('x') if f in specs3d else P()
                             for f in scene._fields])

    def init_fn(scene_loc, rw):
        me = jax.lax.axis_index('x')
        x_off = (me * nx_loc * st.dx).astype(jnp.float32)
        key = jax.random.fold_in(jax.random.key(0), me * 4096)
        body, _, carry0 = make_flight_kernel(
            scene_loc, st_loc, cfg, n_per, key, slab=slab, x_off=x_off,
            rad_w=rw, spawn_reserve=reserve)
        return carry0._replace(launched=carry0.launched[None],
                               step=carry0.step[None])

    def step_fn(scene_loc, rw, c):
        me = jax.lax.axis_index('x')
        x_off = (me * nx_loc * st.dx).astype(jnp.float32)
        key = jax.random.fold_in(jax.random.key(0), me * 4096)
        body, _, _ = make_flight_kernel(
            scene_loc, st_loc, cfg, n_per, key, slab=slab, x_off=x_off,
            rad_w=rw, spawn_reserve=reserve)
        c = c._replace(launched=c.launched[0], step=c.step[0])
        c = jax.lax.fori_loop(0, k_super, lambda i, cc: body(cc), c)
        return c._replace(launched=c.launched[None], step=c.step[None])

    mesh_axes = mesh
    carry = jax.jit(jax.shard_map(
        init_fn, mesh=mesh, in_specs=(in_specs, P()),
        out_specs=P('x'), check_vma=False))(scene, factors[0])

    step = jax.jit(jax.shard_map(
        step_fn, mesh=mesh, in_specs=(in_specs, P(), P('x')),
        out_specs=P('x'), check_vma=False))

    # migration identical to transport_decomp's, lifted here
    def mig_fn(c, go_right):
        me = jax.lax.axis_index('x')
        x_off = (me * nx_loc * st.dx).astype(jnp.float32)
        lx_loc = nx_loc * st.dx
        from er3t_tpu.rtm.mc_flight import lane_matrix, lanes_from_matrix
        ring_r = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        ring_l = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        ring_fwd, ring_rev = (ring_r, ring_l) if go_right else (ring_l, ring_r)
        t_slab = jnp.floor(c.x / lx_loc).astype(jnp.int32) % n_dev
        d_r = (t_slab - me) % n_dev
        frozen = c.alive & (d_r != 0) & (c.z <= zd_top_v)
        emig = frozen & ((d_r <= n_dev // 2) if go_right
                         else (d_r >= (n_dev + 1) // 2))
        dead = ~c.alive
        k = jnp.where(dead, 0, jnp.where(emig, 1, 2)).astype(jnp.int32)
        perm = jnp.argsort(k, stable=True)
        n_dead = jnp.sum(dead.astype(jnp.int32))
        n_emig = jnp.sum(emig.astype(jnp.int32))
        cap = n_dead
        ship = jnp.minimum(n_emig, M)
        for _ in range(2):
            cap_nb = jax.lax.ppermute(cap, axis_name='x', perm=ring_rev)
            ship = jnp.minimum(jnp.minimum(n_emig, M), cap_nb)
            cap = n_dead + ship
        m, spec = lane_matrix(c)
        alive_col = spec['alive'][0]
        j = jnp.arange(M)
        src = perm[jnp.clip(n_dead + j, 0, B - 1)]
        out_win = jnp.where((j < ship)[:, None], m[src], 0.0)
        in_win = jax.lax.ppermute(out_win, axis_name='x', perm=ring_fwd)
        n_in = jax.lax.ppermute(ship, axis_name='x', perm=ring_fwd)
        # dump-row scheme (must mirror decomp.migrate_dir exactly)
        pad = jnp.zeros((1, m.shape[1]), m.dtype)
        m2 = jnp.concatenate([m, pad])
        src_w = jnp.where(j < ship, src, B)
        m2 = m2.at[src_w, alive_col].set(0.0)
        dst_w = jnp.where(j < n_in, perm[jnp.clip(j, 0, B - 1)], B)
        m2 = m2.at[dst_w].set(jnp.where((j < n_in)[:, None], in_win, 0.0))
        return lanes_from_matrix(m2[:B], c, spec)

    def mig_wrap(scene_loc, rw, c):
        c = c._replace(launched=c.launched[0], step=c.step[0])
        c = mig_fn(c, True)
        c = mig_fn(c, False)
        return c._replace(launched=c.launched[None], step=c.step[None])

    mig = jax.jit(jax.shard_map(
        mig_wrap, mesh=mesh, in_specs=(in_specs, P(), P('x')),
        out_specs=P('x'), check_vma=False))

    lx_loc = nx_loc * st.dx
    for r in range(400):
        carry = step(scene, factors[0], carry)
        carry = mig(scene, factors[0], carry)
        if r % 10 == 0 or r < 5:
            al = np.asarray(carry.alive).reshape(n_dev, B)
            x = np.asarray(carry.x).reshape(n_dev, B)
            z = np.asarray(carry.z).reshape(n_dev, B)
            ns = np.asarray(carry.nscat).reshape(n_dev, B)
            la = np.asarray(carry.launched).reshape(n_dev)
            rows = []
            for d in range(n_dev):
                in_slab = (x[d] >= d * lx_loc) & (x[d] < (d + 1) * lx_loc)
                roam = al[d] & ~in_slab & (z[d] > zd_top_v)
                froz = al[d] & ~in_slab & (z[d] <= zd_top_v)
                act = al[d] & in_slab
                rows.append(f'd{d}: act {act.sum():4d} roam {roam.sum():4d} '
                            f'froz {froz.sum():4d} launched {la[d]:6d} '
                            f'max_nscat {ns[d][al[d]].max() if al[d].any() else 0}')
            print(f'r={r:3d} | ' + ' | '.join(rows), flush=True)
        if r in (80, 100, 120):
            al = np.asarray(carry.alive)
            for i in np.where(al)[0]:
                d = i // B
                print(f'  STUCK lane dev={d} x={float(np.asarray(carry.x)[i]):.2f} '
                      f'y={float(np.asarray(carry.y)[i]):.2f} '
                      f'z={float(np.asarray(carry.z)[i]):.3f} '
                      f'ux={float(np.asarray(carry.ux)[i]):.5f} '
                      f'uy={float(np.asarray(carry.uy)[i]):.5f} '
                      f'uz={float(np.asarray(carry.uz)[i]):.6f} '
                      f'nscat={int(np.asarray(carry.nscat)[i])} '
                      f'wsc={float(np.asarray(carry.wsc)[i]):.3e}', flush=True)
        if not np.asarray(carry.alive).any() and \
                np.asarray(carry.launched).sum() >= n_photon - n_dev:
            print(f'drained at round {r}')
            break


if __name__ == '__main__':
    main()
