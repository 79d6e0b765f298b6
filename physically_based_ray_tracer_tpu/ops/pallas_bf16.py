"""Small-tile bf16 Pallas traversal megakernel (256-ray tiles, 8-band leaf
sweeps).

Round-4 redesign of ops/pallas_trace.py's shared-stack kernel, built from
two on-chip measurements (docs/BF16_SWEEP_r04.json, docs/UNION_GROWTH_r04
.json):

  * a shared tile pays the UNION of its rays' leaf paths; the union per
    ray SHRINKS fast with smaller tiles (bounce wavefront: 2.83
    roll-units/ray at 1024-ray tiles -> 1.70 at 256);
  * bf16's native (16, 128) tile packs 2048 lanes per vreg, and the
    per-iteration cost of a banded Moller-Trumbore sweep is nearly flat
    in the band count (alpha(2..16) = 96..104 ns vs f32 83 ns).

So: traverse 256-ray sub-tiles (one shared stack each — the divergence
union is 1.7x smaller per ray) and test p = 8 triangles per ray per
iteration by pairing a (2,128) ray tile duplicated 8x against 8
pre-rolled "bands" of the leaf group (bvh/dense.py groups_bf). Net
measured-model speedup ~2-2.5x over the 1024-ray f32 kernel on bounce
wavefronts at 2.56x leaf-table bytes.

Mosaic bf16 constraints (measured, experiments/probe_bf16{,b}.py): NO
bf16 vector comparisons or selects (packed i1 masks unsupported); rolls
via an i32 bitcast; masks built arithmetically:

    margins y_i > 0 for (u, v, 1-u-v, t);  m = clamp(min_i(y_i)*1e4,0,1)
    m_det   = clamp(|det|*1e8 - 0.01, 0, 1)      (separate scale: det is
                                                  quadratic in edge length)
    t_cand  = max(t,0) + (1 - m*m_det)*1e30      (miss -> huge, never NaN:
                                                  inv = det/max(|det|,eps)^2)
    t_best  = min(t_best, t_cand)                 (pure bf16 min-accumulate)

and the winner id is tracked with ONE f32-domain mask per iteration
(t_cand upcast + compare + selects). The kernel returns the bf16-precise
(t, winner-id) only; the EXACT f32 hit record (t, u, v, prim) is
reconstructed outside the kernel by decoding the winner id back to a
triangle (band/iteration/lane arithmetic) and re-intersecting that one
triangle in f32 (`_decode_refine`). Selection near triangle edges can
differ from f32 by the bf16 quantization band (~0.2% of a leaf-local
unit — the documented precision trade, tests/test_pallas_bf16.py).

The occlusion variant drops ordered descent (shadow rays need no best-t)
and is pure bf16 max-accumulate in the sweep (VERDICT r3 item #3).

Reference roles covered: tinybvh BVH8_CPU::Intersect/IsOccluded + TLAS
dispatch (Core/tiny_bvh.h:6302-6636, :2500-2565); the banded-leaf idea is
the TPU analogue of its 4-wide SIMD triangle leaves (BVHTri4Leaf,
:1136-1143) at vector-register scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from physically_based_ray_tracer_tpu.bvh.dense import (ABSENT, BF_BANDS,
                                                       BF_ROWS, DenseBVH,
                                                       GROUP_ROWS, INST_F,
                                                       NODE_F, RESTORE_ID)
from physically_based_ray_tracer_tpu.config import BVH_FAR
from physically_based_ray_tracer_tpu.ops.intersect import Hit

TILE = 1024            # rays per program (4 sub-tiles of SUB)
SUB = 256              # rays per traversal sub-tile: (2, 128)
DONE = 0x7FFFFFFF
BIG = 1e30
SMEM_NODE_LIMIT = 3072
GLO_SMEM_LIMIT = 8192          # groups whose origins fit SMEM comfortably
VMEM_BF_GROUP_LIMIT = 512      # 512 * 80 * 128 * 2 B = 10.5 MB of VMEM
APRON = 0.02                   # barycentric accept apron (see _bf16_mt)


def _bf(x):
    return np.asarray(x, jnp.bfloat16)


def _roll_bf(x, interpret):
    if interpret:
        return jnp.roll(x, 1, axis=1)
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), 1, 1),
                         jnp.bfloat16)


def _rep(x, n, interpret):
    return jnp.repeat(x, n, axis=0) if interpret else pltpu.repeat(x, n, 0)


def _rcp(d):
    eps = jnp.float32(1e-20)
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


def _slab2(o, rd, lo, hi, t_clip):
    """(2,128) per-lane slab test vs one child box given as 6 scalars."""
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


def _bf16_mt(o3, d3, comps):
    """Banded bf16 Moller-Trumbore: (16,128) dup rays vs 8-band comps.
    Returns (tt, m) where m in [0,1] is the arithmetic accept mask."""
    ox, oy, oz = o3
    dx, dy, dz = d3
    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = comps
    one = _bf(1.0)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    adet = jnp.abs(det)
    # NaN-free reciprocal: det / max(|det|, eps)^2 == 1/det for |det|>=eps,
    # bounded otherwise (and masked off by m_det below)
    r = one / jnp.maximum(adet, _bf(1e-8))
    inv = det * r * r
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    uu = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    # WIDENED barycentric margins: bf16 noise in u/v is ~1-2% near edges;
    # a strict test would reject a near-edge hit on BOTH neighbouring
    # triangles (shared edge) and punch a pinhole through the surface
    # (measured: 3.7% of sphere hits fell through to the BACK surface).
    # Accepting a 0.02-barycentric apron makes both neighbours candidates.
    # The apron is GRADED, not flat: an apron hit (min_uv < 0) carries a
    # ~5% t penalty ramping with how far outside it is, so at a convex
    # geometry edge the true interior hit on the adjacent face always
    # outranks the wrong-face apron hit (equal t, different normal — the
    # cornell-edge shading flips this fixes), while in the pinhole case
    # the penalized near hit still beats the far-surface interior hit.
    # The t margin stays strict (widening it would re-admit the
    # EPSILON-offset origin triangle = self-intersection).
    min_uv = jnp.minimum(jnp.minimum(uu, vv), one - uu - vv)
    # NOTE: the t>0 margin is NOT part of this mask — tt is LOCAL to the
    # advanced origin, which for flat leaf groups (cornell walls) lands
    # exactly on the surface so local tt ~ 0 +- noise; the caller folds a
    # GLOBAL-t margin (tn + tt > 0) instead, which keeps the strict
    # self-intersection guard (the origin's own group has tn = 0, local
    # noise only) without rejecting half of every flat group's hits.
    y = min_uv + _bf(APRON)
    m = jnp.maximum(jnp.minimum(y * _bf(1e4), one), _bf(0.0))
    m_det = jnp.maximum(jnp.minimum(adet * _bf(1e8) - _bf(0.01), one),
                        _bf(0.0))
    # interiorness ramp: 1 for min_uv >= 0, 0 at the apron's outer rim
    r_in = jnp.maximum(jnp.minimum(min_uv * _bf(1.0 / APRON) + one,
                                   one), _bf(0.0))
    return tt, m * m_det, r_in


def _traverse_kernel(nodes_ref, groups_ref, inst_ref_smem, glo_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                     t_ref, gk_ref, iout_ref,
                     stack_ref, rays_ref, dbf_ref, t16_ref, gk16_ref,
                     i16_ref, clip_ref, *scratch,
                     closest, smem_nodes, groups_hbm, two_level, max_steps,
                     interpret):
    """One program: 4 sequential 256-ray sub-tile traversals.

    Scratch layout (all mutated under pl.when — the while-loop carry stays
    scalar-only, see the pallas_trace.py control-flow NOTE):
      rays_ref (24,128) f32 : current-space rays, comp k at rows [2k,2k+2)
                              (o, d, rd — 9 comps, rows 18..24 pad)
      dbf_ref  (48,128) bf16: 8x-banded dup of object-space d (3 comps)
      t16_ref  (16,128) bf16: per-(band x ray-row) best t   (closest)
                              / occlusion accumulator m     (any-hit)
      gk16_ref (16,128) i32 : winner id (g8l*16 + k)*8 + band
      i16_ref  (16,128) i32 : winner instance (two_level only; else unused)
      clip_ref (8,128)  f32 : rows 0-2 = per-ray slab clip (best-t or
                              occluded-flag-derived), refreshed per visit
    """
    sc = list(scratch)
    if groups_hbm:
        gscratch, gsem = sc
    band_iota = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) % BF_BANDS

    def sub_tile(s, _):
        r0 = 2 * s
        wx = ox_ref[pl.ds(r0, 2), :]
        wy = oy_ref[pl.ds(r0, 2), :]
        wz = oz_ref[pl.ds(r0, 2), :]
        wdx = dx_ref[pl.ds(r0, 2), :]
        wdy = dy_ref[pl.ds(r0, 2), :]
        wdz = dz_ref[pl.ds(r0, 2), :]
        tmax = tmax_ref[pl.ds(r0, 2), :]

        def set_rays(o3, d3):
            for k, comp in enumerate((*o3, *d3,
                                      _rcp(d3[0]), _rcp(d3[1]), _rcp(d3[2]))):
                rays_ref[pl.ds(2 * k, 2), :] = comp
            for k in range(3):
                dbf = _rep(d3[k].astype(jnp.bfloat16), BF_BANDS, interpret)
                dbf_ref[pl.ds(16 * k, 16), :] = dbf

        set_rays((wx, wy, wz), (wdx, wdy, wdz))
        if closest:
            t16_ref[:] = _rep(tmax.astype(jnp.bfloat16), BF_BANDS, interpret)
            clip_ref[pl.ds(0, 2), :] = tmax
        else:
            t16_ref[:] = jnp.zeros((16, 128), jnp.bfloat16)
            clip_ref[pl.ds(0, 2), :] = jnp.zeros((2, 128), jnp.float32)
        gk16_ref[:] = jnp.full((16, 128), -1, jnp.int32)
        if two_level:
            i16_ref[:] = jnp.full((16, 128), -1, jnp.int32)

        def rn(cur, k):
            if smem_nodes:
                return nodes_ref[cur * NODE_F + k]
            return nodes_ref[cur, k]

        def leaf_visit(v, inst):
            g = v // 8
            log2c = v % 8
            count2 = jnp.int32(1) << jnp.maximum(log2c - 3, 0)
            base = g * BF_ROWS
            if groups_hbm:
                cp = pltpu.make_async_copy(
                    groups_ref.at[pl.ds(base, BF_ROWS), :], gscratch, gsem)
                cp.start()
                cp.wait()
                blk = gscratch[:]
            else:
                blk = groups_ref[pl.ds(base, BF_ROWS), :]    # (80,128) bf16

            # RE-ORIGIN: advance the ray to the group's AABB entry in f32,
            # then subtract the group origin and cast. Without the advance,
            # bf16's absolute error is ~0.4% of the ORIGIN-to-leaf distance
            # — bigger than whole triangles on finely tessellated meshes
            # (helmet: 0.015 absolute vs 0.01 triangles — measured 6% of
            # primary hits lost). With it, local magnitudes are group-sized
            # and barycentric noise drops to ~bf16_eps * extent/edge ≈ 2%.
            gx = glo_ref[g * 8 + 0]
            gy = glo_ref[g * 8 + 1]
            gz = glo_ref[g * 8 + 2]
            hx = glo_ref[g * 8 + 4]
            hy = glo_ref[g * 8 + 5]
            hz = glo_ref[g * 8 + 6]
            o2 = (rays_ref[pl.ds(0, 2), :], rays_ref[pl.ds(2, 2), :],
                  rays_ref[pl.ds(4, 2), :])
            d2 = (rays_ref[pl.ds(6, 2), :], rays_ref[pl.ds(8, 2), :],
                  rays_ref[pl.ds(10, 2), :])
            rd2 = (rays_ref[pl.ds(12, 2), :], rays_ref[pl.ds(14, 2), :],
                   rays_ref[pl.ds(16, 2), :])
            tx0 = (gx - o2[0]) * rd2[0]
            tx1 = (hx - o2[0]) * rd2[0]
            ty0 = (gy - o2[1]) * rd2[1]
            ty1 = (hy - o2[1]) * rd2[1]
            tz0 = (gz - o2[2]) * rd2[2]
            tz1 = (hz - o2[2]) * rd2[2]
            tn_g = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1))
            tn_g = jnp.maximum(tn_g, 0.0)     # origin inside the box
            o3 = (_rep((o2[0] + tn_g * d2[0] - gx).astype(jnp.bfloat16),
                       BF_BANDS, interpret),
                  _rep((o2[1] + tn_g * d2[1] - gy).astype(jnp.bfloat16),
                       BF_BANDS, interpret),
                  _rep((o2[2] + tn_g * d2[2] - gz).astype(jnp.bfloat16),
                       BF_BANDS, interpret))
            tn16 = _rep(tn_g.astype(jnp.bfloat16), BF_BANDS, interpret)
            d3 = (dbf_ref[pl.ds(0, 16), :], dbf_ref[pl.ds(16, 16), :],
                  dbf_ref[pl.ds(32, 16), :])

            if closest:
                def lbody(k, blk):
                    comps = [jnp.concatenate(
                        [blk[8 * i:8 * i + 8, :]] * 2, axis=0)
                        for i in range(9)]
                    tt, m, r_in = _bf16_mt(o3, d3, comps)
                    t_glob = tn16 + tt
                    m = m * jnp.maximum(
                        jnp.minimum(t_glob * _bf(1e4), _bf(1.0)), _bf(0.0))
                    pen = _bf(1.0) + _bf(0.05) * (_bf(1.0) - r_in)
                    t_cand = (jnp.maximum(t_glob, _bf(0.0)) * pen
                              + (_bf(1.0) - m) * _bf(1e30))
                    t_new = jnp.minimum(t16_ref[:], t_cand)
                    tc32 = t_cand.astype(jnp.float32)
                    won = (tc32 <= t_new.astype(jnp.float32)) & (tc32 < 9e29)
                    t16_ref[:] = t_new
                    gkv = (v * 16 + k) * 8 + band_iota
                    gk16_ref[:] = jnp.where(won, gkv, gk16_ref[:])
                    if two_level:
                        i16_ref[:] = jnp.where(won, inst, i16_ref[:])
                    return _roll_bf(blk, interpret)
            else:
                tmax16 = _rep(tmax.astype(jnp.bfloat16), BF_BANDS, interpret)

                def lbody(k, blk):
                    comps = [jnp.concatenate(
                        [blk[8 * i:8 * i + 8, :]] * 2, axis=0)
                        for i in range(9)]
                    tt, m, _r_in = _bf16_mt(o3, d3, comps)
                    # inside (0, tmax), both bounds on GLOBAL t
                    t_glob = tn16 + tt
                    m = m * jnp.maximum(
                        jnp.minimum(t_glob * _bf(1e4), _bf(1.0)), _bf(0.0))
                    mt_hi = jnp.maximum(
                        jnp.minimum((tmax16 - t_glob) * _bf(1e4), _bf(1.0)),
                        _bf(0.0))
                    t16_ref[:] = jnp.maximum(t16_ref[:], m * mt_hi)
                    return _roll_bf(blk, interpret)

            jax.lax.fori_loop(0, count2, lbody, blk)

            # refresh the (2,128) f32 slab clip from the banded state
            t32 = t16_ref[:].astype(jnp.float32)
            if closest:
                m0 = jnp.min(t32[0:8], axis=0, keepdims=True)
                m1 = jnp.min(t32[8:16], axis=0, keepdims=True)
                clip_ref[pl.ds(0, 2), :] = jnp.concatenate([m0, m1], axis=0)
            else:
                m0 = jnp.max(t32[0:8], axis=0, keepdims=True)
                m1 = jnp.max(t32[8:16], axis=0, keepdims=True)
                clip_ref[pl.ds(0, 2), :] = jnp.concatenate([m0, m1], axis=0)

        def body(carry):
            i, cur, sp, inst = carry
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

            o3 = (rays_ref[pl.ds(0, 2), :], rays_ref[pl.ds(2, 2), :],
                  rays_ref[pl.ds(4, 2), :])
            rd3 = (rays_ref[pl.ds(12, 2), :], rays_ref[pl.ds(14, 2), :],
                   rays_ref[pl.ds(16, 2), :])
            if closest:
                t_clip = clip_ref[pl.ds(0, 2), :]
            else:
                occ = clip_ref[pl.ds(0, 2), :]
                t_clip = jnp.where(occ > 0.5, 0.0, tmax)

            lo0 = (rn(ncur, 0), rn(ncur, 1), rn(ncur, 2))
            hi0 = (rn(ncur, 3), rn(ncur, 4), rn(ncur, 5))
            lo1 = (rn(ncur, 6), rn(ncur, 7), rn(ncur, 8))
            hi1 = (rn(ncur, 9), rn(ncur, 10), rn(ncur, 11))
            c0 = rn(ncur, 12).astype(jnp.int32)
            c1 = rn(ncur, 13).astype(jnp.int32)
            h0, tn0 = _slab2(o3, rd3, lo0, hi0, t_clip)
            h1, tn1 = _slab2(o3, rd3, lo1, hi1, t_clip)
            any0 = jnp.any(h0) & (c0 != ABSENT)
            any1 = jnp.any(h1) & (c1 != ABSENT)
            if closest:
                # ordered near-first descent with best-t pruning
                m0 = jnp.min(jnp.where(h0, tn0, BIG))
                m1 = jnp.min(jnp.where(h1, tn1, BIG))
                swap = m1 < m0
                near = jnp.where(swap, c1, c0)
                far = jnp.where(swap, c0, c1)
                near_ok = jnp.where(swap, any1, any0)
                far_ok = jnp.where(swap, any0, any1)
            else:
                # occlusion: any hit ends the ray — order is wasted work
                near, far = c0, c1
                near_ok, far_ok = any0, any1

            push = push_far = near_ok & far_ok & ~is_leaf
            sp_cap = stack_ref.shape[0] - 1

            @pl.when(push_far)
            def _():
                stack_ref[jnp.minimum(sp, sp_cap)] = far

            sp2 = jnp.where(push, jnp.minimum(sp + 1, sp_cap + 1), sp)
            done_c = jnp.int32(DONE)
            nxt = jnp.where(near_ok, near, jnp.where(far_ok, far, done_c))
            nxt = jnp.where(is_leaf, done_c, nxt)

            @pl.when(is_tri)
            def _():
                leaf_visit(v // 2, inst)

            if two_level:
                enter = is_inst & ~is_restore
                new_inst = jnp.where(enter, iid,
                                     jnp.where(is_restore, -1, inst))
                sent = jnp.int32(-((RESTORE_ID * 2 + 1) + 1))

                @pl.when(enter)
                def _():
                    stack_ref[jnp.minimum(sp2, sp_cap)] = sent

                sp2b = jnp.where(enter, jnp.minimum(sp2 + 1, sp_cap + 1), sp2)
                safe_b = jnp.where(enter, iid, 0) * INST_F
                obj_root = inst_ref_smem[safe_b + 12].astype(jnp.int32)

                @pl.when(enter)
                def _():
                    a = [inst_ref_smem[safe_b + k] for k in range(12)]
                    ox = a[0] * wx + a[1] * wy + a[2] * wz + a[3]
                    oy = a[4] * wx + a[5] * wy + a[6] * wz + a[7]
                    oz = a[8] * wx + a[9] * wy + a[10] * wz + a[11]
                    dx = a[0] * wdx + a[1] * wdy + a[2] * wdz
                    dy = a[4] * wdx + a[5] * wdy + a[6] * wdz
                    dz = a[8] * wdx + a[9] * wdy + a[10] * wdz
                    set_rays((ox, oy, oz), (dx, dy, dz))

                @pl.when(is_restore)
                def _():
                    set_rays((wx, wy, wz), (wdx, wdy, wdz))

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
                occ = clip_ref[pl.ds(0, 2), :]
                done = jnp.all((occ > 0.5) | (tmax <= 0.0))
                nxt = jnp.where(done, done_c, nxt)
            return i + 1, nxt, sp3, new_inst

        def cond(carry):
            i, cur, _, _ = carry
            return (cur != DONE) & (i < max_steps)

        jax.lax.while_loop(cond, body,
                           (jnp.int32(0), jnp.int32(0), jnp.int32(0),
                            jnp.int32(-1)))

        # ---- merge the 8 bands per ray-row and write this sub-tile -------
        t32 = t16_ref[:].astype(jnp.float32)
        if closest:
            gk16 = gk16_ref[:]
            for q in (0, 1):
                rows = t32[8 * q:8 * q + 8]
                mn = jnp.min(rows, axis=0, keepdims=True)
                won = rows == mn
                gkw = jnp.max(jnp.where(won, gk16[8 * q:8 * q + 8], -1),
                              axis=0, keepdims=True)
                t_ref[pl.ds(r0 + q, 1), :] = mn
                gk_ref[pl.ds(r0 + q, 1), :] = gkw
                if two_level:
                    iw = jnp.max(jnp.where(won, i16_ref[8 * q:8 * q + 8], -1),
                                 axis=0, keepdims=True)
                    iout_ref[pl.ds(r0 + q, 1), :] = iw
                else:
                    iout_ref[pl.ds(r0 + q, 1), :] = jnp.zeros((1, 128),
                                                              jnp.int32)
        else:
            for q in (0, 1):
                mx = jnp.max(t32[8 * q:8 * q + 8], axis=0, keepdims=True)
                t_ref[pl.ds(r0 + q, 1), :] = mx
                gk_ref[pl.ds(r0 + q, 1), :] = jnp.zeros((1, 128), jnp.int32)
                iout_ref[pl.ds(r0 + q, 1), :] = jnp.zeros((1, 128), jnp.int32)
        return 0

    jax.lax.fori_loop(0, TILE // SUB, sub_tile, 0)


def _pack(x, n_prog, pad, fill=0.0):
    x = jnp.pad(x, (0, pad), constant_values=fill)
    return x.reshape(n_prog * 8, 128)


def _call_bf16(dbvh: DenseBVH, o, d, t_max, *, closest, stack_depth=128,
               interpret=False):
    assert dbvh.groups_bf is not None, \
        "DenseBVH built without bf16 banded groups (rebuild the scene)"
    B = o.shape[0]
    n_prog = -(-B // TILE)
    pad = n_prog * TILE - B
    n_nodes = dbvh.nodes16.shape[0] // NODE_F
    n_groups = dbvh.groups_bf.shape[0] // BF_ROWS
    smem_nodes = n_nodes <= SMEM_NODE_LIMIT
    groups_hbm = n_groups > VMEM_BF_GROUP_LIMIT
    two_level = dbvh.inst16.shape[0] >= INST_F
    n_inst = dbvh.inst16.shape[0] // INST_F
    max_steps = min(8 * n_nodes * (n_inst + 1 if two_level else 1) + 64,
                    2**31 - 1)
    stack_depth = max(stack_depth, min(2 * n_nodes + 16, 4096))

    ox = _pack(o[:, 0], n_prog, pad)
    oy = _pack(o[:, 1], n_prog, pad)
    oz = _pack(o[:, 2], n_prog, pad)
    dx = _pack(d[:, 0], n_prog, pad)
    dy = _pack(d[:, 1], n_prog, pad)
    dz = _pack(d[:, 2], n_prog, pad)
    tm = _pack(t_max, n_prog, pad)

    nodes = (dbvh.nodes16 if smem_nodes
             else dbvh.nodes16.reshape(-1, NODE_F))
    node_space = pltpu.SMEM if smem_nodes else pltpu.VMEM
    group_space = pl.ANY if groups_hbm else pltpu.VMEM
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kern = functools.partial(_traverse_kernel, closest=closest,
                             smem_nodes=smem_nodes, groups_hbm=groups_hbm,
                             two_level=two_level, max_steps=max_steps,
                             interpret=interpret)
    shape = (n_prog * 8, 128)
    scratch = [
        pltpu.SMEM((stack_depth,), jnp.int32),
        pltpu.VMEM((24, 128), jnp.float32),      # rays (9 comps x 2 rows)
        pltpu.VMEM((48, 128), jnp.bfloat16),     # banded-dup d
        pltpu.VMEM((16, 128), jnp.bfloat16),     # t16 / occ accumulator
        pltpu.VMEM((16, 128), jnp.int32),        # gk16
        pltpu.VMEM((16, 128), jnp.int32),        # i16 (unused if 1-level)
        pltpu.VMEM((8, 128), jnp.float32),       # clip rows 0-2
    ]
    if groups_hbm:
        scratch += [pltpu.VMEM((BF_ROWS, 128), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA]
    t, gk, inst = pl.pallas_call(
        kern,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec(memory_space=node_space),
            pl.BlockSpec(memory_space=group_space),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec,
        ],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
            jax.ShapeDtypeStruct(shape, jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(nodes, dbvh.groups_bf, dbvh.inst16, dbvh.glo,
      ox, oy, oz, dx, dy, dz, tm)
    return (x.reshape(-1)[:B] for x in (t, gk, inst))


REFINE_WIN = 16   # group-window retested exactly in f32 (covers all
                  # distinct triangles of a group when c <= 16)


def _decode_refine(dbvh: DenseBVH, o, d, t_max, tb, gk, inst):
    """Decode the kernel's winner id to its leaf GROUP and re-intersect a
    16-triangle window of that group with the exact f32 kernel predicate.

    Why the whole window and not just the winner: the bf16 sweep accepts a
    graded 0.02-barycentric apron around each triangle (see _bf16_mt) so
    near-edge hits cannot fall through; the apron winner may therefore be
    (a) a hair outside its triangle while the TRUE hit is on the adjacent
    one (pinhole fuzz), or (b) a silhouette ray that truly misses. Exact
    retesting of the group resolves both: (a) finds the true neighbour hit
    EXACTLY, (b) finds nothing and reports a miss. Because interior hits
    always outrank apron hits by the 5% penalty, the true closest hit lies
    in the winner's group except for cross-group coplanar near-ties
    (within bf16 t noise) and the rare pinhole whose two edge triangles
    landed in different groups (~1e-4 of rays on tessellated surfaces —
    measured in tests/test_pallas_bf16.py)."""
    B = o.shape[0]
    two_level = dbvh.inst16.shape[0] >= INST_F
    found = gk >= 0
    gkc = jnp.maximum(gk, 0)
    band = gkc % 8
    rest = gkc // 8
    k = rest % 16
    g8l = rest // 16
    g = g8l // 8
    log2c = g8l % 8
    c = jnp.left_shift(jnp.int32(1), log2c)
    shift = (band * c) // BF_BANDS
    lane = (jnp.arange(B, dtype=jnp.int32) % 128)
    slot = (lane - k - shift) % 128
    # 16-lane window ending at the winner slot: covers every distinct
    # triangle when c <= 16 (production leaf_target), else a neighbourhood
    # of the winner (j = 0 is the winner itself)
    slots = (slot[:, None] - jnp.arange(REFINE_WIN, dtype=jnp.int32)[None, :]
             ) % 128                                          # (B, 16)

    gflat = dbvh.groups.reshape(-1)

    def grow(i):
        return jnp.take(gflat, (g[:, None] * GROUP_ROWS + i) * 128 + slots,
                        mode="clip")                          # (B, 16)

    prims = jnp.rint(grow(9)).astype(jnp.int32)               # (B, 16)

    v0 = jnp.stack([grow(0), grow(1), grow(2)], axis=-1)      # (B, 16, 3)
    e1 = jnp.stack([grow(3), grow(4), grow(5)], axis=-1)
    e2 = jnp.stack([grow(6), grow(7), grow(8)], axis=-1)

    if two_level:
        iid = jnp.maximum(inst, 0)
        irow = dbvh.inst16.reshape(-1, INST_F)
        a = jnp.take(irow, iid, axis=0, mode="clip")          # (B, 16)
        A = a[:, 0:12].reshape(B, 3, 4)
        oo = jnp.einsum("bij,bj->bi", A[:, :, 0:3], o) + A[:, :, 3]
        dd = jnp.einsum("bij,bj->bi", A[:, :, 0:3], d)
    else:
        oo, dd = o, d

    # exact f32 Moller-Trumbore — IDENTICAL predicate to the f32 kernel
    p = jnp.cross(dd[:, None, :], e2)
    det = jnp.sum(e1 * p, axis=-1)                            # (B, 16)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-9, det, 1.0)
    tv = oo[:, None, :] - v0
    u = jnp.sum(tv * p, axis=-1) * inv
    q = jnp.cross(tv, e1)
    v = jnp.sum(dd[:, None, :] * q, axis=-1) * inv
    t = jnp.sum(e2 * q, axis=-1) * inv
    ok = ((jnp.abs(det) > 1e-9) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > 0.0) & (t < t_max[:, None])
          & (prims >= 0))
    t_rank = jnp.where(ok, t, jnp.inf)
    j = jnp.argmin(t_rank, axis=1)                            # (B,)
    hitq = jnp.take_along_axis(ok, j[:, None], axis=1)[:, 0]
    found = found & hitq
    pick = lambda x: jnp.take_along_axis(x, j[:, None], axis=1)[:, 0]
    t, u, v = pick(t), pick(u), pick(v)
    prim_local = pick(prims)

    base = jnp.take(dbvh.prim_base, jnp.maximum(inst, 0), mode="clip")
    return Hit(t=jnp.where(found, t, BVH_FAR),
               u=jnp.where(found, u, 0.0),
               v=jnp.where(found, v, 0.0),
               prim=jnp.where(found, prim_local + base, -1),
               inst=jnp.where(found, jnp.maximum(inst, 0), -1))


def intersect_closest_bf16(dbvh: DenseBVH, o, d, t_max=None, *,
                           interpret=False, **_ignored) -> Hit:
    """Closest-hit via the bf16 banded small-tile kernel + f32 refine."""
    B = o.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), BVH_FAR, o.dtype)
    tb, gk, inst = _call_bf16(dbvh, o, d, t_max, closest=True,
                              interpret=interpret)
    return _decode_refine(dbvh, o, d, t_max, tb, gk, inst)


def intersect_any_bf16(dbvh: DenseBVH, o, d, t_max, *,
                       interpret=False, **_ignored) -> jnp.ndarray:
    """Occlusion query: True where a hit exists with t in (0, t_max)."""
    t, _, _ = _call_bf16(dbvh, o, d, t_max, closest=False,
                         interpret=interpret)
    return t > 0.5


def _morton_perm(dbvh: DenseBVH, o, d, dead=None, mode="octant_major"):
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    return morton_order(o, d, dbvh.world_lo, dbvh.world_hi, dead=dead,
                        mode=mode)


def sorted_closest_bf16(dbvh: DenseBVH, o, d, t_max=None, *,
                        interpret=False, sort_mode="octant_major",
                        **_ignored) -> Hit:
    if t_max is None:
        t_max = jnp.full((o.shape[0],), BVH_FAR, o.dtype)
    perm = _morton_perm(dbvh, o, d, dead=t_max <= 0.0, mode=sort_mode)
    hit = intersect_closest_bf16(dbvh, jnp.take(o, perm, axis=0),
                                 jnp.take(d, perm, axis=0),
                                 jnp.take(t_max, perm), interpret=interpret)
    inv = jnp.argsort(perm)
    return jax.tree.map(lambda x: jnp.take(x, inv, axis=0), hit)


def sorted_any_bf16(dbvh: DenseBVH, o, d, t_max, *,
                    interpret=False, sort_mode="octant_major",
                    **_ignored) -> jnp.ndarray:
    perm = _morton_perm(dbvh, o, d, dead=t_max <= 0.0, mode=sort_mode)
    occ = intersect_any_bf16(dbvh, jnp.take(o, perm, axis=0),
                             jnp.take(d, perm, axis=0),
                             jnp.take(t_max, perm), interpret=interpret)
    return jnp.take(occ, jnp.argsort(perm), axis=0)
