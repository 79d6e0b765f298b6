"""Fused Pallas BVH traversal megakernel (dense-leaf BVH, bvh/dense.py).

This is the production traversal path on TPU — the role tinybvh's AVX2
BVH8_CPU::Intersect/IsOccluded + TLAS dispatch plays in the reference
(Core/tiny_bvh.h:6302-6636, :2500-2565), redesigned for the (8, 128)-lane
VPU:

  * grid over *tiles* of 1024 rays; each program owns one tile and runs it
    to completion — no global lockstep, stragglers only stall their own
    program;
  * one shared traversal stack per tile in SMEM; node fetches are ~14
    scalar SMEM reads — no gathers;
  * per-lane slab tests against both children on the full (8, 128) tile,
    reduced to scalar decisions (any/min) — exact culling;
  * leaf = dense component-major triangle group (12 rows x 128 lanes): the
    tile tests 1024 rays x c triangles by rolling the triangle lanes c
    times (c = power-of-two replication period, bvh/dense.py) — every op is
    a full-width (8, 128) VPU op, zero gathers, zero per-lane extracts;
  * ordered near-first descent with per-lane best-t pruning (closest) or
    any-hit early exit (occlusion), mirroring IsOccluded semantics;
  * TWO-LEVEL (TLAS) traversal: an instance leaf transforms the whole ray
    tile into object space (12 scalar MACs on (8,128) registers), pushes a
    RESTORE sentinel, and descends into the shared BLAS subtree; the
    sentinel pop returns the tile to world space. Exactly the role of
    tinybvh's IntersectTLAS leaf dispatch (Core/tiny_bvh.h:2530-2543) with
    the inverse-transform cached per instance (BLASInstance,
    Core/tiny_bvh.h:1243-1256). Hit t is invariant under the affine
    transform (direction is transformed un-normalized), so best-t pruning
    carries across levels.

Memory placement: node table in SMEM when it fits (~3k nodes), else VMEM
rows. Leaf groups in VMEM when the table fits the ~16 MB/core budget, else
HBM with a per-visit async DMA into a VMEM scratch block.

Leaf child encoding (must match bvh/dense.py):
    code >= 0            -> internal node index
    code < 0, v=-(code+1):
        v & 1 == 0       -> triangle leaf, v>>1 = group*8 + log2(period)
        v & 1 == 1       -> instance leaf, v>>1 = instance id
                            (id RESTORE_ID = the sentinel)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physically_based_ray_tracer_tpu.bvh.dense import (ABSENT, DenseBVH,
                                                       GROUP_ROWS, INST_F,
                                                       NODE_F, RESTORE_ID)
from physically_based_ray_tracer_tpu.config import BVH_FAR
from physically_based_ray_tracer_tpu.ops.intersect import Hit

TILE = 1024            # rays per program: one (8, 128) vreg block
DONE = 0x7FFFFFFF      # python ints/floats: jnp constants would be captured
BIG = 1e30             # as pallas_call closure constants (disallowed)
SMEM_NODE_LIMIT = 3072     # nodes; 3072*16*4 B = 192 KB of SMEM
VMEM_GROUP_LIMIT = 1280    # groups; 1280*16*128*4 B = 10.5 MB of VMEM


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


def _traverse_kernel(nodes_ref, groups_ref, inst_ref_smem,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                     t_ref, u_ref, v_ref, prim_ref, iout_ref,
                     stack_ref, *scratch, closest, smem_nodes, groups_hbm,
                     two_level, max_steps, interpret):
    # NOTE on control flow: the instance enter/restore ray re-basing must
    # NOT be a lax.cond returning the (8,128) ray registers — Mosaic lowers
    # that to arith.select over vectors with a scalar predicate and fails
    # ("Null layout / non-vector operand"). Instead the current ray state
    # lives in a VMEM scratch block (rays_ref, rows 8k..8k+8 = component k
    # of o/d/rd) mutated under pl.when — a genuinely predicated region —
    # and the while-loop carry stays scalar-only.
    sc = list(scratch)
    rays_ref = sc.pop(0) if two_level else None
    if groups_hbm:
        # decoupled leaf queue (r5): ping-pong DMA buffers — a discovered
        # leaf's fetch STARTS immediately, its sweep DEFERS to the next
        # leaf discovery (or the post-loop drain), so the group DMA
        # overlaps a full sweep + the node steps in between
        gs0, gs1, sem0, sem1 = sc
    wx, wy, wz = ox_ref[:], oy_ref[:], oz_ref[:]
    wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]

    t_ref[:] = tmax if closest else jnp.zeros_like(tmax)
    u_ref[:] = jnp.zeros_like(tmax)
    v_ref[:] = jnp.zeros_like(tmax)
    prim_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    iout_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    # occlusion mode reuses t_ref as the "occluded" mask (0/1 as float)

    rn = functools.partial(_read_node, nodes_ref, smem=smem_nodes)

    wrdx, wrdy, wrdz = _rcp(wdx), _rcp(wdy), _rcp(wdz)
    if two_level:
        for k, comp in enumerate((wx, wy, wz, wdx, wdy, wdz,
                                  wrdx, wrdy, wrdz)):
            rays_ref[pl.ds(8 * k, 8), :] = comp

    def read_rays():
        if two_level:
            return tuple(rays_ref[pl.ds(8 * k, 8), :] for k in range(9))
        return (wx, wy, wz, wdx, wdy, wdz, wrdx, wrdy, wrdz)

    def rays_for(pinst):
        """Ray tuple in instance ``pinst``'s object space (world for < 0)
        — a deferred sweep cannot read rays_ref (rewritten by instance
        enters/restores between discovery and sweep)."""
        if not two_level:
            return (wx, wy, wz, wdx, wdy, wdz, wrdx, wrdy, wrdz)
        use = jnp.maximum(pinst, 0) * INST_F
        a = [inst_ref_smem[use + k] for k in range(12)]
        inb = pinst >= 0
        ox = jnp.where(inb, a[0] * wx + a[1] * wy + a[2] * wz + a[3], wx)
        oy = jnp.where(inb, a[4] * wx + a[5] * wy + a[6] * wz + a[7], wy)
        oz = jnp.where(inb, a[8] * wx + a[9] * wy + a[10] * wz + a[11], wz)
        dx = jnp.where(inb, a[0] * wdx + a[1] * wdy + a[2] * wdz, wdx)
        dy = jnp.where(inb, a[4] * wdx + a[5] * wdy + a[6] * wdz, wdy)
        dz = jnp.where(inb, a[8] * wdx + a[9] * wdy + a[10] * wdz, wdz)
        return ox, oy, oz, dx, dy, dz, _rcp(dx), _rcp(dy), _rcp(dz)

    def start_fetch(gv, nb):
        # full GROUP_ROWS-aligned block: dynamic-offset DMAs must stay
        # sublane-tile aligned (a 12-row slice at a 16-row stride faults
        # the worker on real hardware)
        base = (gv // 8) * GROUP_ROWS

        @pl.when(nb == 0)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, GROUP_ROWS), :], gs0, sem0).start()

        @pl.when(nb == 1)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, GROUP_ROWS), :], gs1, sem1).start()

    def wait_fetch(gv, nb):
        base = (gv // 8) * GROUP_ROWS

        @pl.when(nb == 0)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, GROUP_ROWS), :], gs0, sem0).wait()

        @pl.when(nb == 1)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, GROUP_ROWS), :], gs1, sem1).wait()

    def pending_block(nb):
        return jnp.where(nb == 0, gs0[:], gs1[:])

    def leaf_visit(v, inst, rays, blk_in=None):
        # v = g * 8 + log2(c): group id + replication period (bvh/dense.py
        # variable-count leaves — sweep only c iterations)
        ox, oy, oz, dx, dy, dz = rays[:6]
        g = v // 8
        count = jnp.int32(1) << (v % 8)
        base = g * GROUP_ROWS
        if groups_hbm:
            blk = blk_in                  # pre-fetched by the leaf queue
        else:
            blk = groups_ref[pl.ds(base, GROUP_ROWS), :]   # (16, 128)
        # the sweep carries the whole block and rotates it with ONE native
        # (16,128) roll per iteration: rolling the 10 components separately
        # costs ten sub-native (1,128) rotates, which profiling showed was
        # ~half of each iteration (93 -> ~50 cycles, docs/PERF_LOG.md)

        def mt(blk):
            comps = [blk[i:i + 1, :] for i in range(10)]
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
            base_ok = ((jnp.abs(det) > 1e-9) & (uu >= 0.0) & (vv >= 0.0)
                       & (uu + vv <= 1.0) & (tt > 0.0))
            return uu, vv, tt, base_ok, opr

        if closest:
            def lbody(k, blk):
                uu, vv, tt, base_ok, opr = mt(blk)
                t_cur = t_ref[:]
                ok = base_ok & (tt < t_cur)
                t_ref[:] = jnp.where(ok, tt, t_cur)
                u_ref[:] = jnp.where(ok, uu, u_ref[:])
                v_ref[:] = jnp.where(ok, vv, v_ref[:])
                prim_ref[:] = jnp.where(ok, opr.astype(jnp.int32), prim_ref[:])
                iout_ref[:] = jnp.where(ok, inst, iout_ref[:])
                return _roll1(blk, interpret)
        else:
            def lbody(k, blk):
                _, _, tt, base_ok, _ = mt(blk)
                ok = base_ok & (tt < tmax)
                t_ref[:] = jnp.where(ok, jnp.float32(1.0), t_ref[:])
                return _roll1(blk, interpret)

        jax.lax.fori_loop(0, count, lbody, blk)

    def body(carry):
        i, cur, sp, inst, pgv, pinst, pbuf = carry
        rays = read_rays()
        is_leaf = cur < 0
        v = jnp.where(is_leaf, -(cur + 1), 0)
        if two_level:
            is_inst = is_leaf & (v % 2 == 1)
            iid = v // 2
            is_restore = is_inst & (iid == RESTORE_ID)
            is_tri = is_leaf & ~is_inst
        else:
            is_tri = is_leaf
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
        o3 = rays[:3]
        rd3 = rays[6:9]
        h0, tn0 = _slab(o3, rd3, lo0, hi0, t_clip)
        h1, tn1 = _slab(o3, rd3, lo1, hi1, t_clip)
        # absent slots need the explicit code check: the min/max slab test
        # is lo/hi-symmetric, so no box encoding can reject every ray
        any0 = jnp.any(h0) & (c0 != ABSENT)
        any1 = jnp.any(h1) & (c1 != ABSENT)
        m0 = jnp.min(jnp.where(h0, tn0, BIG))
        m1 = jnp.min(jnp.where(h1, tn1, BIG))
        swap = m1 < m0
        near = jnp.where(swap, c1, c0)
        far = jnp.where(swap, c0, c1)
        near_ok = jnp.where(swap, any1, any0)
        far_ok = jnp.where(swap, any0, any1)

        push = push_far = near_ok & far_ok & ~is_leaf
        sp_cap = stack_ref.shape[0] - 1   # clamp guard (ADVICE r2)

        @pl.when(push_far)
        def _():
            stack_ref[jnp.minimum(sp, sp_cap)] = far

        # sp itself is clamped too (not just the write index): after a
        # pathological overflow an unclamped sp would make the pop read
        # stack_ref[sp-1] out of bounds (ADVICE r3)
        sp2 = jnp.where(push, jnp.minimum(sp + 1, sp_cap + 1), sp)
        done_c = jnp.int32(DONE)
        nxt = jnp.where(near_ok, near, jnp.where(far_ok, far, done_c))
        nxt = jnp.where(is_leaf, done_c, nxt)

        if groups_hbm:
            # leaf queue: start this leaf's DMA into the idle buffer, then
            # sweep the PREVIOUS leaf (DMA in flight across the node steps
            # since its discovery)
            @pl.when(is_tri)
            def _():
                start_fetch(v // 2, 1 - pbuf)

                @pl.when(pgv >= 0)
                def _():
                    wait_fetch(pgv, pbuf)
                    leaf_visit(pgv, pinst, rays_for(pinst),
                               pending_block(pbuf))

            pgv = jnp.where(is_tri, v // 2, pgv)
            pinst = jnp.where(is_tri, inst, pinst)
            pbuf = jnp.where(is_tri, 1 - pbuf, pbuf)
        else:
            @pl.when(is_tri)
            def _():
                leaf_visit(v // 2, inst, rays)

        if two_level:
            # --- instance enter / restore (rare; pl.when-predicated) -------
            enter = is_inst & ~is_restore
            new_inst = jnp.where(enter, iid, jnp.where(is_restore, -1, inst))
            # RESTORE sentinel below the BLAS subtree on the stack
            sent = jnp.int32(-((RESTORE_ID * 2 + 1) + 1))

            @pl.when(enter)
            def _():
                stack_ref[jnp.minimum(sp2, sp_cap)] = sent

            sp2b = jnp.where(enter, jnp.minimum(sp2 + 1, sp_cap + 1), sp2)
            # BLAS root read is unconditional — clamp iid so the non-enter
            # steps (iid = 0 / RESTORE_ID) never index out of bounds
            safe_b = jnp.where(enter, iid, 0) * INST_F
            obj_root = inst_ref_smem[safe_b + 12].astype(jnp.int32)

            @pl.when(enter)
            def _():
                # re-base the tile into instance object space (inverse 3x4
                # from inst_ref_smem; BLASInstance analogue)
                a = [inst_ref_smem[safe_b + k] for k in range(12)]
                ox = a[0] * wx + a[1] * wy + a[2] * wz + a[3]
                oy = a[4] * wx + a[5] * wy + a[6] * wz + a[7]
                oz = a[8] * wx + a[9] * wy + a[10] * wz + a[11]
                dx = a[0] * wdx + a[1] * wdy + a[2] * wdz
                dy = a[4] * wdx + a[5] * wdy + a[6] * wdz
                dz = a[8] * wdx + a[9] * wdy + a[10] * wdz
                for k, comp in enumerate((ox, oy, oz, dx, dy, dz,
                                          _rcp(dx), _rcp(dy), _rcp(dz))):
                    rays_ref[pl.ds(8 * k, 8), :] = comp

            @pl.when(is_restore)
            def _():
                for k, comp in enumerate((wx, wy, wz, wdx, wdy, wdz,
                                          wrdx, wrdy, wrdz)):
                    rays_ref[pl.ds(8 * k, 8), :] = comp

            nxt = jnp.where(enter, obj_root, nxt)
        else:
            new_inst = inst
            sp2b = sp2

        need_pop = nxt == DONE
        can_pop = need_pop & (sp2b > 0)
        top = stack_ref[jnp.maximum(sp2b - 1, 0)]
        nxt = jnp.where(can_pop, top, nxt)
        sp3 = jnp.where(can_pop, sp2b - 1, sp2b)
        if not closest:
            # whole-tile early exit once every live lane is occluded
            done = jnp.all((t_ref[:] > 0.0) | (tmax <= 0.0))
            nxt = jnp.where(done, done_c, nxt)
        return i + 1, nxt, sp3, new_inst, pgv, pinst, pbuf

    def cond(carry):
        i, cur = carry[0], carry[1]
        return (cur != DONE) & (i < max_steps)

    fin = jax.lax.while_loop(cond, body,
                             (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                              jnp.int32(-1), jnp.int32(-1), jnp.int32(-1),
                              jnp.int32(0)))
    if groups_hbm:
        # drain the last pending leaf (its DMA must be waited regardless)
        pgv, pinst, pbuf = fin[4], fin[5], fin[6]

        @pl.when(pgv >= 0)
        def _():
            wait_fetch(pgv, pbuf)
            leaf_visit(pgv, pinst, rays_for(pinst), pending_block(pbuf))


def _pack(x, n_prog, pad, fill=0.0):
    x = jnp.pad(x, (0, pad), constant_values=fill)
    return x.reshape(n_prog * 8, 128)


def _call_kernel(dbvh: DenseBVH, o, d, t_max, *, closest, stack_depth=128,
                 interpret=False, components=None):
    """``components``: optional pre-split (ox, oy, oz, dx, dy, dz) tuple —
    the co-sorting wrappers already hold per-component arrays, so slicing
    o/d again would add six avoidable slice fusions per call."""
    B = t_max.shape[0] if components is not None else o.shape[0]
    n_prog = -(-B // TILE)
    pad = n_prog * TILE - B
    n_nodes = dbvh.nodes16.shape[0] // NODE_F
    n_groups = dbvh.groups.shape[0] // GROUP_ROWS
    smem_nodes = n_nodes <= SMEM_NODE_LIMIT
    groups_hbm = n_groups > VMEM_GROUP_LIMIT
    # single-level tables (inst16 is a 1-float stub) compile the kernel
    # without any instance machinery
    two_level = dbvh.inst16.shape[0] >= INST_F
    # Step bound: single-level traversal visits each node at most once per
    # distinct stack path (8x slack); two-level traversal re-enters shared
    # BLAS subtrees once per *instance*, so the bound must scale with the
    # instance count or many-instance scenes silently truncate (ADVICE r2).
    n_inst = dbvh.inst16.shape[0] // INST_F
    max_steps = min(8 * n_nodes * (n_inst + 1 if two_level else 1) + 64,
                    2**31 - 1)
    # Stack safety: pushes happen only when both children are hit (plus one
    # RESTORE sentinel per instance enter), so live entries are bounded by
    # the tree depth — but a degenerate sweep-SAH TLAS can chain to
    # I-1 levels (ADVICE r2). Size the stack to the table (cheap: SMEM
    # int32s) and clamp writes as a last-resort guard.
    stack_depth = max(stack_depth, min(2 * n_nodes + 16, 4096))

    if components is None:
        components = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    ox, oy, oz, dx, dy, dz = (_pack(c, n_prog, pad) for c in components)
    tm = _pack(t_max, n_prog, pad)

    nodes = dbvh.nodes16 if smem_nodes else dbvh.nodes16.reshape(-1, NODE_F)
    node_space = pltpu.SMEM if smem_nodes else pltpu.VMEM
    group_space = pl.ANY if groups_hbm else pltpu.VMEM
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_traverse_kernel, closest=closest,
                             smem_nodes=smem_nodes, groups_hbm=groups_hbm,
                             two_level=two_level, max_steps=max_steps,
                             interpret=interpret)
    shape = (n_prog * 8, 128)
    scratch = [pltpu.SMEM((stack_depth,), jnp.int32)]
    if two_level:
        scratch += [pltpu.VMEM((72, 128), jnp.float32)]
    if groups_hbm:
        # leaf-queue ping-pong buffers (see _traverse_kernel)
        scratch += [pltpu.VMEM((GROUP_ROWS, 128), jnp.float32),
                    pltpu.VMEM((GROUP_ROWS, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
    t, u, v, prim, inst = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=node_space),
            pl.BlockSpec(memory_space=group_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(nodes, dbvh.groups, dbvh.inst16, ox, oy, oz, dx, dy, dz, tm)
    return (x.reshape(-1)[:B] for x in (t, u, v, prim, inst))


def intersect_closest_dense(dbvh: DenseBVH, o, d, t_max=None, *,
                            interpret=False, components=None,
                            **_ignored) -> Hit:
    """Closest-hit traversal; o, d: (B, 3). Returns Hit with prim in
    original triangle order (ids baked into the leaf groups) and inst = the
    instance id for two-level tables (0 for single-level)."""
    B = t_max.shape[0] if components is not None else o.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), BVH_FAR, o.dtype)
    t, u, v, prim, inst = _call_kernel(dbvh, o, d, t_max, closest=True,
                                       interpret=interpret,
                                       components=components)
    found = prim >= 0
    # shared-BLAS prim ids are mesh-local; map to the scene's global
    # per-instance-concatenated order (bvh/dense.py prim_base)
    base = jnp.take(dbvh.prim_base, jnp.maximum(inst, 0), mode="clip")
    return Hit(t=jnp.where(found, t, BVH_FAR),
               u=jnp.where(found, u, 0.0),
               v=jnp.where(found, v, 0.0),
               prim=jnp.where(found, prim + base, -1),
               inst=jnp.where(found, jnp.maximum(inst, 0), -1))


def intersect_any_dense(dbvh: DenseBVH, o, d, t_max, *,
                        interpret=False, components=None,
                        **_ignored) -> jnp.ndarray:
    """Occlusion query: True where a hit exists with t in (0, t_max)."""
    t, _, _, _, _ = _call_kernel(dbvh, o, d, t_max, closest=False,
                                 interpret=interpret, components=components)
    return t > 0.0


def _cosort_rays(dbvh: DenseBVH, o, d, t_max, mode):
    """ONE multi-operand stable sort carries the key, the original index
    and all seven ray components into coherent-tile order.

    The r4 wrappers did argsort + 3 permutation `take`s in and argsort +
    N `take`s out; at ~9 ns/gathered element those takes cost ~30% of the
    bench frame (profiles/frame_r05_f32, docs/PERF_LOG.md r5). A stable
    co-sort produces the identical permutation (stable on equal keys),
    so hits are bit-identical."""
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_key
    key = morton_key(o, d, dbvh.world_lo, dbvh.world_hi,
                     dead=t_max <= 0.0, mode=mode)
    idx = jnp.arange(t_max.shape[0], dtype=jnp.int32)
    _, idx_s, ox, oy, oz, dx, dy, dz, tm = jax.lax.sort(
        (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_max), num_keys=1)
    return idx_s, (ox, oy, oz, dx, dy, dz), tm


def sorted_closest_dense(dbvh: DenseBVH, o, d, t_max=None, *,
                         interpret=False, sort_mode="octant_major",
                         **_ignored) -> Hit:
    """Closest-hit on octant+Morton-sorted rays (bounce/shadow wavefronts)."""
    if t_max is None:
        t_max = jnp.full((o.shape[0],), BVH_FAR, o.dtype)
    idx_s, comps, tm = _cosort_rays(dbvh, o, d, t_max, sort_mode)
    hit = intersect_closest_dense(dbvh, None, None, tm, interpret=interpret,
                                  components=comps)
    # unsort: co-sort the hit record back by original index (one sort
    # instead of argsort + 5 takes)
    _, t, u, v, prim, inst = jax.lax.sort(
        (idx_s, hit.t, hit.u, hit.v, hit.prim, hit.inst), num_keys=1)
    return Hit(t=t, u=u, v=v, prim=prim, inst=inst)


def sorted_any_dense(dbvh: DenseBVH, o, d, t_max, *,
                     interpret=False, sort_mode="octant_major",
                     **_ignored) -> jnp.ndarray:
    idx_s, comps, tm = _cosort_rays(dbvh, o, d, t_max, sort_mode)
    occ = intersect_any_dense(dbvh, None, None, tm, interpret=interpret,
                              components=comps)
    _, occ = jax.lax.sort((idx_s, occ.astype(jnp.int32)), num_keys=1)
    return occ > 0
