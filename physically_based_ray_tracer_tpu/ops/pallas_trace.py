"""Fused Pallas BVH traversal megakernel (dense-leaf BVH, bvh/dense.py).

This is the production traversal path on TPU — the role tinybvh's AVX2
BVH8_CPU::Intersect/IsOccluded plays in the reference
(Core/tiny_bvh.h:6302-6636), redesigned for the (8, 128)-lane VPU:

  * grid over *tiles* of 1024 rays; each program owns one tile and runs it
    to completion — no global lockstep, stragglers only stall their own
    program (the round-1 XLA wave engine iterated ALL tiles until the
    slowest finished, ops/traverse_packet.py);
  * one shared traversal stack per tile in SMEM; node fetches are ~14
    scalar SMEM reads — no gathers;
  * per-lane slab tests against both children on the full (8, 128) tile,
    reduced to scalar decisions (any/min) — exact culling, not the
    conservative interval frusta of the wave engine;
  * leaf = dense 128-triangle group, component-major (12 rows x 128 lanes):
    the tile tests 1024 rays x 128 triangles by rolling the triangle lanes
    128 times — every op is a full-width (8, 128) VPU op, zero gathers,
    zero per-lane extracts;
  * ordered near-first descent with per-lane best-t pruning (closest) or
    any-hit early exit (occlusion), mirroring IsOccluded semantics.

Node tables live in SMEM when they fit (<= ~200 KB, i.e. ~3k nodes — dense
leaves keep node counts tiny) and fall back to VMEM row reads above that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physically_based_ray_tracer_tpu.bvh.dense import (DenseBVH, GROUP_ROWS,
                                                       LEAF_W, NODE_F)
from physically_based_ray_tracer_tpu.config import BVH_FAR
from physically_based_ray_tracer_tpu.ops.intersect import Hit

TILE = 1024            # rays per program: one (8, 128) vreg block
DONE = 0x7FFFFFFF      # python ints/floats: jnp constants would be captured
BIG = 1e30             # as pallas_call closure constants (disallowed)
SMEM_NODE_LIMIT = 3072  # nodes; 3072*16*4 B = 192 KB of SMEM


def _roll1(x, interpret):
    """Roll one lane along axis 1. jnp.roll in interpret mode (pltpu.roll is
    TPU-only); pltpu.roll compiled."""
    if interpret:
        return jnp.roll(x, 1, axis=1)
    return pltpu.roll(x, 1, 1)


def _rcp(d):
    eps = jnp.float32(1e-20)
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


def _read_node(nodes_ref, cur, k, smem):
    if smem:
        return nodes_ref[cur * NODE_F + k]
    return nodes_ref[cur, k]


def _slab(o, rd, lo, hi, t_clip):
    """(8,128) per-lane slab test vs one child box given as 6 scalars."""
    ox, oy, oz = o
    rdx, rdy, rdz = rd
    tx0 = (lo[0] - ox) * rdx
    tx1 = (hi[0] - ox) * rdx
    ty0 = (lo[1] - oy) * rdy
    ty1 = (hi[1] - oy) * rdy
    tz0 = (lo[2] - oz) * rdz
    tz1 = (hi[2] - oz) * rdz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                     jnp.minimum(tz0, tz1))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                     jnp.maximum(tz0, tz1))
    h = (tn <= tf) & (tf > 0.0) & (tn < t_clip) & (t_clip > 0.0)
    return h, tn


def _traverse_kernel(nodes_ref, groups_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                     t_ref, u_ref, v_ref, prim_ref,
                     stack_ref, *, closest, smem_nodes, max_steps, interpret):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]
    o3 = (ox, oy, oz)
    rd3 = (_rcp(dx), _rcp(dy), _rcp(dz))

    t_ref[:] = tmax if closest else jnp.zeros_like(tmax)
    u_ref[:] = jnp.zeros_like(tmax)
    v_ref[:] = jnp.zeros_like(tmax)
    prim_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    # occlusion mode reuses t_ref as the "occluded" mask (0/1 as float)

    rn = functools.partial(_read_node, nodes_ref, smem=smem_nodes)

    def leaf_visit(v):
        # leaf code v = g * 8 + log2(c): group id + replication period
        # (bvh/dense.py variable-count leaves — sweep only c iterations)
        g = v // 8
        count = jnp.int32(1) << (v % 8)
        base = g * GROUP_ROWS
        blk = groups_ref[pl.ds(base, 12), :]        # (12, 128)
        comps0 = [blk[i:i + 1, :] for i in range(10)]

        if closest:
            def lbody(k, comps):
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, opr) = comps
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                t_cur = t_ref[:]
                ok = ((jnp.abs(det) > 1e-9) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (tt > 0.0) & (tt < t_cur))
                t_ref[:] = jnp.where(ok, tt, t_cur)
                u_ref[:] = jnp.where(ok, uu, u_ref[:])
                v_ref[:] = jnp.where(ok, vv, v_ref[:])
                prim_ref[:] = jnp.where(ok, opr.astype(jnp.int32), prim_ref[:])
                return [_roll1(c, interpret) for c in comps]

            jax.lax.fori_loop(0, count, lbody, comps0)
        else:
            def lbody(k, comps):
                (v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, opr) = comps
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
                tx = ox - v0x
                ty = oy - v0y
                tz = oz - v0z
                uu = (tx * px + ty * py + tz * pz) * inv
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = ((jnp.abs(det) > 1e-9) & (uu >= 0.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (tt > 0.0) & (tt < tmax))
                t_ref[:] = jnp.where(ok, jnp.float32(1.0), t_ref[:])
                return [_roll1(c, interpret) for c in comps]

            jax.lax.fori_loop(0, count, lbody, comps0)

    def body(carry):
        i, cur, sp = carry
        is_leaf = cur < 0
        ncur = jnp.where(is_leaf, 0, cur)

        if closest:
            t_clip = t_ref[:]
        else:
            t_clip = jnp.where(t_ref[:] > 0.0, 0.0, tmax)

        lo0 = (rn(ncur, 0), rn(ncur, 1), rn(ncur, 2))
        hi0 = (rn(ncur, 3), rn(ncur, 4), rn(ncur, 5))
        lo1 = (rn(ncur, 6), rn(ncur, 7), rn(ncur, 8))
        hi1 = (rn(ncur, 9), rn(ncur, 10), rn(ncur, 11))
        c0 = rn(ncur, 12).astype(jnp.int32)
        c1 = rn(ncur, 13).astype(jnp.int32)
        h0, tn0 = _slab(o3, rd3, lo0, hi0, t_clip)
        h1, tn1 = _slab(o3, rd3, lo1, hi1, t_clip)
        any0 = jnp.any(h0)
        any1 = jnp.any(h1)
        m0 = jnp.min(jnp.where(h0, tn0, BIG))
        m1 = jnp.min(jnp.where(h1, tn1, BIG))
        swap = m1 < m0
        near = jnp.where(swap, c1, c0)
        far = jnp.where(swap, c0, c1)
        near_ok = jnp.where(swap, any1, any0)
        far_ok = jnp.where(swap, any0, any1)

        push = near_ok & far_ok & ~is_leaf

        @pl.when(push)
        def _():
            stack_ref[sp] = far

        sp2 = jnp.where(push, sp + 1, sp)
        done_c = jnp.int32(DONE)
        nxt = jnp.where(near_ok, near, jnp.where(far_ok, far, done_c))
        nxt = jnp.where(is_leaf, done_c, nxt)

        @pl.when(is_leaf)
        def _():
            leaf_visit(-(cur + 1))

        need_pop = nxt == DONE
        can_pop = need_pop & (sp2 > 0)
        top = stack_ref[jnp.maximum(sp2 - 1, 0)]
        nxt = jnp.where(can_pop, top, nxt)
        sp3 = jnp.where(can_pop, sp2 - 1, sp2)
        if not closest:
            # whole-tile early exit once every live lane is occluded
            done = jnp.all((t_ref[:] > 0.0) | (tmax <= 0.0))
            nxt = jnp.where(done, done_c, nxt)
        return i + 1, nxt, sp3

    def cond(carry):
        i, cur, _ = carry
        return (cur != DONE) & (i < max_steps)

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(0)))


def _pack(x, n_prog, pad, fill=0.0):
    x = jnp.pad(x, (0, pad), constant_values=fill)
    return x.reshape(n_prog * 8, 128)


def _call_kernel(dbvh: DenseBVH, o, d, t_max, *, closest, stack_depth=128,
                 interpret=False):
    B = o.shape[0]
    n_prog = -(-B // TILE)
    pad = n_prog * TILE - B
    n_nodes = dbvh.nodes16.shape[0] // NODE_F
    smem_nodes = n_nodes <= SMEM_NODE_LIMIT
    max_steps = 4 * n_nodes + 64

    ox = _pack(o[:, 0], n_prog, pad)
    oy = _pack(o[:, 1], n_prog, pad)
    oz = _pack(o[:, 2], n_prog, pad)
    dx = _pack(d[:, 0], n_prog, pad)
    dy = _pack(d[:, 1], n_prog, pad)
    dz = _pack(d[:, 2], n_prog, pad)
    tm = _pack(t_max, n_prog, pad)

    nodes = dbvh.nodes16 if smem_nodes else dbvh.nodes16.reshape(-1, NODE_F)
    node_space = pltpu.SMEM if smem_nodes else pltpu.VMEM
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_traverse_kernel, closest=closest,
                             smem_nodes=smem_nodes, max_steps=max_steps,
                             interpret=interpret)
    shape = (n_prog * 8, 128)
    t, u, v, prim = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=node_space),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((stack_depth,), jnp.int32)],
        interpret=interpret,
    )(nodes, dbvh.groups, ox, oy, oz, dx, dy, dz, tm)
    return (x.reshape(-1)[:B] for x in (t, u, v, prim))


def intersect_closest_dense(dbvh: DenseBVH, o, d, t_max=None, *,
                            interpret=False, **_ignored) -> Hit:
    """Closest-hit traversal; o, d: (B, 3). Returns Hit with prim in
    original triangle order (ids baked into the leaf groups)."""
    B = o.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), BVH_FAR, o.dtype)
    t, u, v, prim = _call_kernel(dbvh, o, d, t_max, closest=True,
                                 interpret=interpret)
    found = prim >= 0
    return Hit(t=jnp.where(found, t, BVH_FAR),
               u=jnp.where(found, u, 0.0),
               v=jnp.where(found, v, 0.0),
               prim=prim,
               inst=jnp.where(found, 0, -1))


def intersect_any_dense(dbvh: DenseBVH, o, d, t_max, *,
                        interpret=False, **_ignored) -> jnp.ndarray:
    """Occlusion query: True where a hit exists with t in (0, t_max)."""
    t, _, _, _ = _call_kernel(dbvh, o, d, t_max, closest=False,
                              interpret=interpret)
    return t > 0.0


def _morton_perm(dbvh: DenseBVH, o, d, dead=None):
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    return morton_order(o, d, dbvh.world_lo, dbvh.world_hi, dead=dead)


def sorted_closest_dense(dbvh: DenseBVH, o, d, t_max=None, *,
                         interpret=False, **_ignored) -> Hit:
    """Closest-hit on octant+Morton-sorted rays (bounce/shadow wavefronts)."""
    if t_max is None:
        t_max = jnp.full((o.shape[0],), BVH_FAR, o.dtype)
    perm = _morton_perm(dbvh, o, d, dead=t_max <= 0.0)
    hit = intersect_closest_dense(dbvh, jnp.take(o, perm, axis=0),
                                  jnp.take(d, perm, axis=0),
                                  jnp.take(t_max, perm), interpret=interpret)
    inv = jnp.argsort(perm)
    return jax.tree.map(lambda x: jnp.take(x, inv, axis=0), hit)


def sorted_any_dense(dbvh: DenseBVH, o, d, t_max, *,
                     interpret=False, **_ignored) -> jnp.ndarray:
    perm = _morton_perm(dbvh, o, d, dead=t_max <= 0.0)
    occ = intersect_any_dense(dbvh, jnp.take(o, perm, axis=0),
                              jnp.take(d, perm, axis=0),
                              jnp.take(t_max, perm), interpret=interpret)
    return jnp.take(occ, jnp.argsort(perm), axis=0)
