"""Row-parallel Pallas BVH traversal: 8 independent sub-tile traversals.

Second-generation megakernel (vs ops/pallas_trace.py's shared-stack tile).
The shared-stack design makes 1024 divergent rays pay the UNION of their
node/leaf paths; measured on representative bounce wavefronts that union
is ~4x a 128-ray sub-tile's (experiments/count_steps.py). This kernel
assigns each sublane ROW of the (8, 128) vreg its own traversal:

  * 8 per-row stacks, cursors and instance states (SMEM);
  * node phase: each active row fetches ITS node (8 dynamic row reads into
    a (8,16) VMEM scratch), one (8,128) slab test serves all 8 rows, and
    per-row (8,1) lane-reductions drive 8 independent descent decisions;
  * leaf phase (batched): rows park at their pending leaf until no row can
    take a node step, then ALL pending rows sweep together — each row's
    group block is assembled per-row and ``pltpu.roll(axis=1)`` rotates
    every row independently, so the one (8,128) Möller-Trumbore body tests
    8 different leaves against 8 different ray rows at once;
  * two-level TLAS: per-row ray re-basing (each row enters/leaves
    instances on its own schedule) using the same RESTORE-sentinel scheme.

Exactness: per-lane results are identical to the shared kernel (same slab,
same MT, same ordered descent per sub-tile) — pinned by
tests/test_pallas_rows.py against ops/pallas_trace.py.

Scheduling simulated in experiments (row_sim): ~1.2x on coherent primary
tiles, ~2.1x on bounce wavefronts, at equal vector width.
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
from physically_based_ray_tracer_tpu.ops.pallas_trace import (_pack, _rcp,
                                                              _roll1)

TILE = 1024
R = 8                   # sub-tiles per program == sublane rows
DONE = 0x7FFFFFFF       # row finished
WAIT = 0x7FFFFFFE       # row parked at a pending leaf
NEEDPOP = 0x7FFFFFFD    # row must pop its stack next node phase
BIG = 1e30


def _kernel(nodes_ref, groups_ref, inst_ref, perm_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_ref, u_ref, v_ref, prim_ref, iout_ref,
            cur8, sp8, inst8, pend8, stack_ref, nrow_ref,
            stag_ref, *scratch,
            closest, groups_hbm, two_level, max_steps, stack_cap, interpret):
    sc = list(scratch)
    rays_ref = sc.pop(0) if two_level else None
    if groups_hbm:
        (gsem,) = sc

    tmax = tmax_ref[:]
    t_ref[:] = tmax if closest else jnp.zeros_like(tmax)
    u_ref[:] = jnp.zeros_like(tmax)
    v_ref[:] = jnp.zeros_like(tmax)
    prim_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    iout_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    # NOTE: leaf_phase overwrites ALL staging rows before each matmul
    # (inactive rows clamp to group 0), so no zero-init is needed — an
    # uninitialized row would otherwise 0*NaN-poison the permutation product

    wx, wy, wz = ox_ref[:], oy_ref[:], oz_ref[:]
    wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
    wrdx, wrdy, wrdz = _rcp(wdx), _rcp(wdy), _rcp(wdz)
    if two_level:
        for k, comp in enumerate((wx, wy, wz, wdx, wdy, wdz,
                                  wrdx, wrdy, wrdz)):
            rays_ref[pl.ds(R * k, R), :] = comp

    def read_rays():
        if two_level:
            return tuple(rays_ref[pl.ds(R * k, R), :] for k in range(9))
        return (wx, wy, wz, wdx, wdy, wdz, wrdx, wrdy, wrdz)

    for r in range(R):
        cur8[r] = jnp.int32(0)
        sp8[r] = jnp.int32(0)
        inst8[r] = jnp.int32(-1)
        pend8[r] = jnp.int32(-1)

    def classify(r, nxt):
        """Route a next-code for row r: node / tri leaf / instance /
        restore / DONE. Returns nothing; mutates row state."""
        is_done = nxt == jnp.int32(DONE)
        is_node = (nxt >= 0) & ~is_done
        v = jnp.where(nxt < 0, -(nxt + 1), 0)
        if two_level:
            is_inst = (nxt < 0) & (v % 2 == 1) & ~is_done
            iid = v // 2
            is_restore = is_inst & (iid == RESTORE_ID)
            is_enter = is_inst & ~is_restore
            is_tri = (nxt < 0) & (v % 2 == 0) & ~is_done
        else:
            is_tri = (nxt < 0) & ~is_done
            is_enter = is_restore = jnp.bool_(False)
            iid = v

        @pl.when(is_tri)
        def _():
            pend8[r] = v // 2
            cur8[r] = jnp.int32(WAIT)

        @pl.when(is_node)
        def _():
            cur8[r] = nxt

        @pl.when(is_done)
        def _():
            cur8[r] = jnp.int32(DONE)

        if two_level:
            @pl.when(is_enter)
            def _():
                sent = jnp.int32(-((RESTORE_ID * 2 + 1) + 1))
                stack_ref[r, jnp.minimum(sp8[r], stack_cap)] = sent
                # clamp sp too: an unclamped sp after a (pathological)
                # overflow makes pop_or_done read out of bounds (ADVICE r3)
                sp8[r] = jnp.minimum(sp8[r] + 1, stack_cap + 1)
                b = iid * INST_F
                a = [inst_ref[b + k] for k in range(12)]
                rwx = wx[r:r + 1, :]
                rwy = wy[r:r + 1, :]
                rwz = wz[r:r + 1, :]
                rdxw = wdx[r:r + 1, :]
                rdyw = wdy[r:r + 1, :]
                rdzw = wdz[r:r + 1, :]
                ox = a[0] * rwx + a[1] * rwy + a[2] * rwz + a[3]
                oy = a[4] * rwx + a[5] * rwy + a[6] * rwz + a[7]
                oz = a[8] * rwx + a[9] * rwy + a[10] * rwz + a[11]
                dx = a[0] * rdxw + a[1] * rdyw + a[2] * rdzw
                dy = a[4] * rdxw + a[5] * rdyw + a[6] * rdzw
                dz = a[8] * rdxw + a[9] * rdyw + a[10] * rdzw
                for k, comp in enumerate((ox, oy, oz, dx, dy, dz,
                                          _rcp(dx), _rcp(dy), _rcp(dz))):
                    rays_ref[pl.ds(R * k + r, 1), :] = comp
                inst8[r] = iid
                cur8[r] = inst_ref[b + 12].astype(jnp.int32)

            @pl.when(is_restore)
            def _():
                for k, comp in enumerate((wx, wy, wz, wdx, wdy, wdz,
                                          wrdx, wrdy, wrdz)):
                    rays_ref[pl.ds(R * k + r, 1), :] = comp[r:r + 1, :]
                inst8[r] = jnp.int32(-1)
                cur8[r] = jnp.int32(NEEDPOP)

    def pop_or_done(r):
        can = sp8[r] > 0
        top = stack_ref[r, jnp.maximum(sp8[r] - 1, 0)]
        sp8[r] = jnp.where(can, sp8[r] - 1, sp8[r])
        return jnp.where(can, top, jnp.int32(DONE))

    def node_phase():
        rays = read_rays()
        o3 = rays[:3]
        rd3 = rays[6:9]
        # fetch each active row's node row
        for r in range(R):
            safe = jnp.maximum(jnp.where(cur8[r] < NEEDPOP, cur8[r], 0), 0)
            nrow_ref[r:r + 1, :] = nodes_ref[pl.ds(safe, 1), :]
        n = nrow_ref[:]
        lo0 = (n[:, 0:1], n[:, 1:2], n[:, 2:3])
        hi0 = (n[:, 3:4], n[:, 4:5], n[:, 5:6])
        lo1 = (n[:, 6:7], n[:, 7:8], n[:, 8:9])
        hi1 = (n[:, 9:10], n[:, 10:11], n[:, 11:12])
        if closest:
            t_clip = t_ref[:]
        else:
            t_clip = jnp.where(t_ref[:] > 0.0, 0.0, tmax)

        def slab(lo, hi):
            ox, oy, oz = o3
            rdx, rdy, rdz = rd3
            tx0 = (lo[0] - ox) * rdx
            tx1 = (hi[0] - ox) * rdx
            ty0 = (lo[1] - oy) * rdy
            ty1 = (hi[1] - oy) * rdy
            tz0 = (lo[2] - oz) * rdz
            tz1 = (hi[2] - oz) * rdz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            h = (tn <= tf) & (tf > 0.0) & (tn < t_clip) & (t_clip > 0.0)
            return h, tn

        h0, tn0 = slab(lo0, hi0)
        h1, tn1 = slab(lo1, hi1)
        any0f = jnp.max(jnp.where(h0, 1.0, 0.0), axis=1, keepdims=True)
        any1f = jnp.max(jnp.where(h1, 1.0, 0.0), axis=1, keepdims=True)
        m0 = jnp.min(jnp.where(h0, tn0, BIG), axis=1, keepdims=True)
        m1 = jnp.min(jnp.where(h1, tn1, BIG), axis=1, keepdims=True)

        for r in range(R):
            c = cur8[r]

            @pl.when(c == NEEDPOP)
            def _():
                classify(r, pop_or_done(r))

            @pl.when((c >= 0) & (c < NEEDPOP))
            def _():
                c0 = nrow_ref[r, 12].astype(jnp.int32)
                c1 = nrow_ref[r, 13].astype(jnp.int32)
                a0 = (any0f[r, 0] > 0.5) & (c0 != ABSENT)
                a1 = (any1f[r, 0] > 0.5) & (c1 != ABSENT)
                mm0 = jnp.where(a0, m0[r, 0], jnp.float32(BIG))
                mm1 = jnp.where(a1, m1[r, 0], jnp.float32(BIG))
                swap = mm1 < mm0
                near = jnp.where(swap, c1, c0)
                far = jnp.where(swap, c0, c1)
                near_ok = jnp.where(swap, a1, a0)
                far_ok = jnp.where(swap, a0, a1)

                @pl.when(near_ok & far_ok)
                def _():
                    stack_ref[r, jnp.minimum(sp8[r], stack_cap)] = far
                    sp8[r] = jnp.minimum(sp8[r] + 1, stack_cap + 1)

                nxt = jnp.where(near_ok, near,
                                jnp.where(far_ok, far, jnp.int32(DONE)))

                @pl.when(nxt == DONE)
                def _():
                    classify(r, pop_or_done(r))

                @pl.when(nxt != DONE)
                def _():
                    classify(r, nxt)

    def leaf_phase():
        rays = read_rays()
        ox, oy, oz, dx, dy, dz = rays[:6]
        # assemble each pending row's group block at stride GROUP_ROWS,
        # then ONE MXU permutation matmul transposes (row, comp) ->
        # component-major (comp*8 + row) for the (8,128) sweep registers
        if groups_hbm:
            cps = []
            for r in range(R):
                g = jnp.maximum(pend8[r] // 8, 0)
                cp = pltpu.make_async_copy(
                    groups_ref.at[pl.ds(g * GROUP_ROWS, GROUP_ROWS), :],
                    stag_ref.at[pl.ds(r * GROUP_ROWS, GROUP_ROWS), :],
                    gsem.at[r])
                cp.start()
                cps.append(cp)
            for cp in cps:
                cp.wait()
        else:
            for r in range(R):
                g = jnp.maximum(pend8[r] // 8, 0)
                stag_ref[pl.ds(r * GROUP_ROWS, GROUP_ROWS), :] = \
                    groups_ref[pl.ds(g * GROUP_ROWS, GROUP_ROWS), :]
        # HIGHEST precision: the default TPU matmul does bf16 passes,
        # which would round the float-encoded prim-id row (and coords)
        grow = jax.lax.dot(perm_ref[:], stag_ref[:],
                           precision=jax.lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)

        # per-row active mask + max sweep length
        maskv = jnp.concatenate(
            [jnp.where(pend8[r] >= 0, 1.0, 0.0).reshape(1, 1)
             for r in range(R)], axis=0)
        max_c = jnp.int32(1)
        for r in range(R):
            c_r = jnp.where(pend8[r] >= 0,
                            jnp.int32(1) << (pend8[r] % 8), 1)
            max_c = jnp.maximum(max_c, c_r)

        comps0 = [grow[R * k:R * k + R, :] for k in range(10)]
        row_on = maskv > 0.5                    # (R,1) bool
        instv = jnp.concatenate(
            [inst8[r].astype(jnp.float32).reshape(1, 1) for r in range(R)],
            axis=0)                             # (R,1) f32

        def mt(comps):
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
                  & (uu + vv <= 1.0) & (tt > 0.0) & row_on)
            return uu, vv, tt, ok, opr

        if closest:
            def lbody(k, comps):
                uu, vv, tt, base_ok, opr = mt(comps)
                t_cur = t_ref[:]
                ok = base_ok & (tt < t_cur)
                t_ref[:] = jnp.where(ok, tt, t_cur)
                u_ref[:] = jnp.where(ok, uu, u_ref[:])
                v_ref[:] = jnp.where(ok, vv, v_ref[:])
                prim_ref[:] = jnp.where(ok, opr.astype(jnp.int32),
                                        prim_ref[:])
                iout_ref[:] = jnp.where(ok, instv.astype(jnp.int32),
                                        iout_ref[:])
                return [_roll1(c, interpret) for c in comps]
        else:
            def lbody(k, comps):
                _, _, tt, base_ok, _ = mt(comps)
                ok = base_ok & (tt < tmax)
                t_ref[:] = jnp.where(ok, jnp.float32(1.0), t_ref[:])
                return [_roll1(c, interpret) for c in comps]

        jax.lax.fori_loop(0, max_c, lbody, comps0)

        if not closest:
            # per-row early exit: every live lane in the row occluded
            done_rows = jnp.min(
                jnp.where((t_ref[:] > 0.0) | (tmax <= 0.0), 1.0, 0.0),
                axis=1, keepdims=True)
        for r in range(R):
            @pl.when(pend8[r] >= 0)
            def _():
                pend8[r] = jnp.int32(-1)
                if closest:
                    classify(r, pop_or_done(r))
                else:
                    @pl.when(done_rows[r, 0] > 0.5)
                    def _():
                        cur8[r] = jnp.int32(DONE)
                        sp8[r] = jnp.int32(0)

                    @pl.when(done_rows[r, 0] <= 0.5)
                    def _():
                        classify(r, pop_or_done(r))

    def body(carry):
        it = carry
        node_any = jnp.bool_(False)
        for r in range(R):
            node_any = node_any | (cur8[r] < WAIT)

        @pl.when(node_any)
        def _():
            node_phase()

        @pl.when(~node_any)
        def _():
            leaf_phase()

        return it + 1

    def cond(carry):
        alive = jnp.bool_(False)
        for r in range(R):
            alive = alive | (cur8[r] != DONE)
        return alive & (carry < max_steps)

    jax.lax.while_loop(cond, body, jnp.int32(0))


def _call_rows(dbvh: DenseBVH, o, d, t_max, *, closest, interpret=False):
    B = o.shape[0]
    n_prog = -(-B // TILE)
    pad = n_prog * TILE - B
    n_nodes = dbvh.nodes16.shape[0] // NODE_F
    n_groups = dbvh.groups.shape[0] // GROUP_ROWS
    groups_hbm = n_groups > 1280
    two_level = dbvh.inst16.shape[0] >= INST_F
    n_inst = dbvh.inst16.shape[0] // INST_F
    max_steps = min(16 * n_nodes * (n_inst + 1 if two_level else 1) + 256,
                    2**31 - 1)
    stack_depth = min(2 * n_nodes + 16, 2048)
    stack_cap = stack_depth - 1

    ox = _pack(o[:, 0], n_prog, pad)
    oy = _pack(o[:, 1], n_prog, pad)
    oz = _pack(o[:, 2], n_prog, pad)
    dx = _pack(d[:, 0], n_prog, pad)
    dy = _pack(d[:, 1], n_prog, pad)
    dz = _pack(d[:, 2], n_prog, pad)
    tm = _pack(t_max, n_prog, pad)

    nodes = dbvh.nodes16.reshape(-1, NODE_F)
    group_space = pl.ANY if groups_hbm else pltpu.VMEM
    # permutation: out row comp*8 + r  <-  staging row r*GROUP_ROWS + comp
    import numpy as _np
    permm = _np.zeros((128, R * GROUP_ROWS), _np.float32)
    for r_ in range(R):
        for k_ in range(10):
            permm[k_ * R + r_, r_ * GROUP_ROWS + k_] = 1.0
    permm = jnp.asarray(permm)
    ray_spec = pl.BlockSpec((R, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, closest=closest, groups_hbm=groups_hbm,
                             two_level=two_level, max_steps=max_steps,
                             stack_cap=stack_cap, interpret=interpret)
    shape = (n_prog * R, 128)
    scratch = [
        pltpu.SMEM((R,), jnp.int32),            # cur8
        pltpu.SMEM((R,), jnp.int32),            # sp8
        pltpu.SMEM((R,), jnp.int32),            # inst8
        pltpu.SMEM((R,), jnp.int32),            # pend8
        pltpu.SMEM((R, stack_depth), jnp.int32),  # stacks
        pltpu.VMEM((R, 16), jnp.float32),       # node rows
        pltpu.VMEM((R * GROUP_ROWS, 128), jnp.float32),  # leaf staging
    ]
    if two_level:
        scratch += [pltpu.VMEM((72, 128), jnp.float32)]
    if groups_hbm:
        scratch += [pltpu.SemaphoreType.DMA((R,))]
    t, u, v, prim, inst = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=group_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
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
    )(nodes, dbvh.groups, dbvh.inst16, permm, ox, oy, oz, dx, dy, dz, tm)
    return (x.reshape(-1)[:B] for x in (t, u, v, prim, inst))


def rows_closest_dense(dbvh: DenseBVH, o, d, t_max=None, *,
                       interpret=False, **_ignored) -> Hit:
    """Closest-hit via the row-parallel kernel (drop-in for
    intersect_closest_dense)."""
    B = o.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), BVH_FAR, o.dtype)
    t, u, v, prim, inst = _call_rows(dbvh, o, d, t_max, closest=True,
                                     interpret=interpret)
    found = prim >= 0
    base = jnp.take(dbvh.prim_base, jnp.maximum(inst, 0), mode="clip")
    return Hit(t=jnp.where(found, t, BVH_FAR),
               u=jnp.where(found, u, 0.0),
               v=jnp.where(found, v, 0.0),
               prim=jnp.where(found, prim + base, -1),
               inst=jnp.where(found, jnp.maximum(inst, 0), -1))


def rows_any_dense(dbvh: DenseBVH, o, d, t_max, *,
                   interpret=False, **_ignored) -> jnp.ndarray:
    t, _, _, _, _ = _call_rows(dbvh, o, d, t_max, closest=False,
                               interpret=interpret)
    return t > 0.0


def sorted_rows_closest(dbvh: DenseBVH, o, d, t_max=None, *,
                        interpret=False, sort_mode="octant_major",
                        **_ignored) -> Hit:
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    if t_max is None:
        t_max = jnp.full((o.shape[0],), BVH_FAR, o.dtype)
    perm = morton_order(o, d, dbvh.world_lo, dbvh.world_hi,
                        dead=t_max <= 0.0, mode=sort_mode)
    hit = rows_closest_dense(dbvh, jnp.take(o, perm, axis=0),
                             jnp.take(d, perm, axis=0),
                             jnp.take(t_max, perm), interpret=interpret)
    inv = jnp.argsort(perm)
    return jax.tree.map(lambda x: jnp.take(x, inv, axis=0), hit)


def sorted_rows_any(dbvh: DenseBVH, o, d, t_max, *,
                    interpret=False, sort_mode="octant_major",
                    **_ignored) -> jnp.ndarray:
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    perm = morton_order(o, d, dbvh.world_lo, dbvh.world_hi,
                        dead=t_max <= 0.0, mode=sort_mode)
    occ = rows_any_dense(dbvh, jnp.take(o, perm, axis=0),
                         jnp.take(d, perm, axis=0),
                         jnp.take(t_max, perm), interpret=interpret)
    return jnp.take(occ, jnp.argsort(perm), axis=0)
