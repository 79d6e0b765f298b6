"""bf16-sweep Pallas traversal megakernel: the production 1024-ray
shared-stack traversal (ops/pallas_trace.py) with the leaf roll sweep in
2-band bf16 — testing TWO triangles per ray per iteration in one packed
(16, 128) bf16 vreg.

Design history (round 4, all on-chip measurements in docs/):
  * bf16's native (16,128) tile holds 2048 lanes; a banded Moller-Trumbore
    sweep costs ~96-104 ns/iteration regardless of band count vs 83 ns
    for the f32 (8,128) sweep (docs/BF16_SWEEP_r04.json) — so packing 2
    triangles per ray halves the iteration count for ~1.17x the cost:
    a 1.7x sweep speedup with the SAME per-tile divergence union.
  * Narrower tiles with more bands (256 rays x 8 tris) look better on the
    union model (docs/UNION_GROWTH_r04.json) but LOSE ~14x on instanced
    scenes: every small tile re-enters every overlapping instance's BLAS,
    multiplying the TLAS phase that a 1024-wide tile shares. The node /
    control phase here is therefore IDENTICAL to the proven f32 kernel.

Mosaic bf16 constraints (measured, experiments/probe_bf16{,b}.py): NO
bf16 vector comparisons or selects (packed i1 masks are unsupported);
lane rolls go through an i32 bitcast; pltpu.repeat lowers as TILE (not
element-repeat) so duplications use broadcast+concat; masks are built
arithmetically:

    margins y_i > 0 for (u, v, 1-u-v);  m = clamp((min_i y_i + APRON)*1e4)
    m_det  = clamp(|det|*1e8 - 0.01, 0, 1)
    m_t    = clamp((tn + tt)*1e4, 0, 1)          (GLOBAL t: local tt ~ 0
                                                  on flat groups)
    t_cand = max(tn + tt, 0)*(1 + 0.05*(1-r_in)) + (1 - m)*1e30
    t_best = min(t_best, t_cand)                 (bf16 min-accumulate)

Numerics: rays re-origin at each leaf's AABB entry (f32 slab, then cast)
so bf16 error applies to leaf-LOCAL coordinates — without this, helmet-
scale tessellation loses 6% of primary hits. The graded APRON accepts a
0.02-barycentric ring (bf16 u/v noise) with a 5% t penalty so interior
hits always outrank wrong-face apron hits at shared edges. The kernel
returns (bf16 t, winner id); the EXACT f32 hit record is rebuilt outside
by decoding the winner to its leaf group and re-intersecting a
16-triangle window with the f32 kernel's exact predicate
(`_decode_refine`). Residual deviations vs the f32 kernel are
edge-tie-class (hit-point displacement < 1% scene scale, <0.5% of rays;
tests/test_pallas_bf16.py pins them against brute force).

The occlusion variant drops ordered descent (shadow rays need no best-t
ordering). Because the apron would otherwise turn near-miss grazes into
FALSE occlusions (there is no winner retest on this path), it splits the
accept into CERTAIN (min_uv > +APRON: occluded, ends the ray) and
UNCERTAIN (apron zone: flagged per lane; the wrapper resolves flagged
lanes with one gated exact-f32 any pass over that few-% subset — skipped
entirely, via lax.cond, on batches with no apron grazes).

UNIT-SCALE ASSUMPTION: the arithmetic accept masks use absolute margins
(y*1e4, |det|*1e8 - 0.01, t*1e4) tuned for ~unit-scale scenes (the
reference's asset convention: helmet ~ 1-10 units). Hits closer than
~1e-4 scene units are progressively rejected and the det cutoff scales
with triangle area, so scenes authored in very small (micrometre) or
very large (planetary) units should be normalised on import, or use
leaf_precision="f32". The apron/penalty constants are scale-free
(barycentric / relative-t).

Reference roles: tinybvh BVH8_CPU::Intersect/IsOccluded + TLAS dispatch
(Core/tiny_bvh.h:6302-6636, :2500-2565); the 2-band packed sweep is the
TPU analogue of its 4-wide SIMD triangle leaves (BVHTri4Leaf,
:1136-1143) at vector-register scale.
"""

from __future__ import annotations

import functools
import os

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

TILE = 1024            # rays per program: one (8, 128) vreg block
DONE = 0x7FFFFFFF
BIG = 1e30
SMEM_NODE_LIMIT = 3072
GLO_SMEM_LIMIT = 8192          # groups whose AABBs fit SMEM comfortably
VMEM_BF_GROUP_LIMIT = 1280     # 1280 * 32 * 128 * 2 B = 10.5 MB of VMEM
APRON = 0.02                   # barycentric accept apron (see _bf16_mt)


def _bf(x):
    return np.asarray(x, jnp.bfloat16)


def _roll_bf(x, interpret):
    if interpret:
        return jnp.roll(x, 1, axis=1)
    return pltpu.bitcast(pltpu.roll(pltpu.bitcast(x, jnp.int32), 1, 1),
                         jnp.bfloat16)


def _dup2(x):
    """(8,128) -> (16,128) rows [x, x] (ray tile duplicated into both
    packed halves; pairs with comps [band0 x8, band1 x8])."""
    return jnp.concatenate([x, x], axis=0)


def _rcp(d):
    eps = jnp.float32(1e-20)
    return 1.0 / jnp.where(jnp.abs(d) < eps, jnp.where(d < 0, -eps, eps), d)


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


def _bf16_mt(o3, d3, comps):
    """2-band bf16 Moller-Trumbore: (16,128) dup rays vs 2-band comps.
    Returns (tt, m, r_in): local-t, arithmetic accept mask (u/v/det terms
    only — the t margins are folded by the caller on GLOBAL t), and the
    interiorness ramp for the apron penalty."""
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
    # graded apron: accept a 0.02-barycentric ring around the triangle
    # (bf16 u/v noise near shared edges would otherwise punch pinholes
    # through to the BACK surface — measured); r_in ramps 1 (interior) ->
    # 0 (apron rim) and drives a 5% t penalty so true interior hits always
    # outrank wrong-face apron hits at convex geometry edges.
    min_uv = jnp.minimum(jnp.minimum(uu, vv), one - uu - vv)
    y = min_uv + _bf(APRON)
    m = jnp.maximum(jnp.minimum(y * _bf(1e4), one), _bf(0.0))
    m_det = jnp.maximum(jnp.minimum(adet * _bf(1e8) - _bf(0.01), one),
                        _bf(0.0))
    r_in = jnp.maximum(jnp.minimum(min_uv * _bf(1.0 / APRON) + one, one),
                       _bf(0.0))
    return tt, m * m_det, r_in, min_uv


def _traverse_kernel(nodes_ref, groups_ref, inst_ref_smem, glo_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                     t_ref, gk_ref, iout_ref,
                     stack_ref, *scratch, closest, smem_nodes, groups_hbm,
                     two_level, max_steps, interpret):
    """Structure is a LITERAL mirror of ops/pallas_trace.py's kernel (same
    scratch discipline, same per-visit update-into-output-refs pattern —
    an earlier persistent-band-scratch variant was 17x slower through
    Mosaic); only the leaf sweep body differs:

      * the (32,128) bf16 group block holds 2 pre-rolled bands per
        component; each iteration tests 2 triangles/ray on a (16,128)
        packed vreg (comps = [band0 x8 rows, band1 x8 rows], rays dup2);
      * band-local best (t16, gk16) ride the fori CARRY and merge into
        the (8,128) output refs once per visit;
      * t_ref carries the bf16-accumulated (apron-penalized) best t and
        doubles as the slab clip exactly like the f32 kernel's t_ref.

    Occlusion mode reuses t_ref as the occluded mask and drops ordered
    descent (VERDICT r3 item #3)."""
    sc = list(scratch)
    rays_ref = sc.pop(0) if two_level else None
    if groups_hbm:
        # decoupled leaf queue (r5, VERDICT #5): ping-pong DMA buffers — a
        # discovered leaf's fetch is STARTED immediately but its sweep is
        # DEFERRED until the next leaf discovery (or the post-loop drain),
        # so every group DMA overlaps a full sweep + the node steps in
        # between instead of ~25 setup ops (docs/BIG_SCENE_r04.json).
        gs0, gs1, sem0, sem1 = sc
    band_iota = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0) // 8

    wx, wy, wz = ox_ref[:], oy_ref[:], oz_ref[:]
    wdx, wdy, wdz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]

    t_ref[:] = tmax if closest else jnp.zeros_like(tmax)
    gk_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)
    iout_ref[:] = jnp.full(tmax.shape, -1, jnp.int32)

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
        """Recompute the ray tuple in instance ``pinst``'s object space
        (or world space for pinst < 0) — the deferred sweep cannot read
        rays_ref, which may have been rewritten by instance enters/restores
        between the leaf's discovery and its sweep."""
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
        base = (gv // 8) * BF_ROWS

        @pl.when(nb == 0)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, BF_ROWS), :], gs0, sem0).start()

        @pl.when(nb == 1)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, BF_ROWS), :], gs1, sem1).start()

    def wait_fetch(gv, nb):
        base = (gv // 8) * BF_ROWS

        @pl.when(nb == 0)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, BF_ROWS), :], gs0, sem0).wait()

        @pl.when(nb == 1)
        def _():
            pltpu.make_async_copy(
                groups_ref.at[pl.ds(base, BF_ROWS), :], gs1, sem1).wait()

    def pending_block(nb):
        """Select the filled ping-pong buffer. bf16 vector selects are
        unsupported on Mosaic; round-trip through f32 (exact for bf16)."""
        b0 = gs0[:].astype(jnp.float32)
        b1 = gs1[:].astype(jnp.float32)
        return jnp.where(nb == 0, b0, b1).astype(jnp.bfloat16)

    def leaf_visit(v, inst, rays, blk_in=None):
        g = v // 8
        log2c = v % 8
        count2 = jnp.int32(1) << jnp.maximum(log2c - 1, 0)
        base = g * BF_ROWS
        ox, oy, oz, dx, dy, dz, rdx, rdy, rdz = rays
        # RE-ORIGIN: advance to the group AABB entry in f32 before casting
        # (bf16 absolute error otherwise scales with origin-to-leaf
        # distance and exceeds whole triangles on fine meshes)
        gx = glo_ref[g * 8 + 0]
        gy = glo_ref[g * 8 + 1]
        gz = glo_ref[g * 8 + 2]
        hx = glo_ref[g * 8 + 4]
        hy = glo_ref[g * 8 + 5]
        hz = glo_ref[g * 8 + 6]
        tn_g = jnp.maximum(jnp.maximum(
            jnp.minimum((gx - ox) * rdx, (hx - ox) * rdx),
            jnp.minimum((gy - oy) * rdy, (hy - oy) * rdy)),
            jnp.minimum((gz - oz) * rdz, (hz - oz) * rdz))
        tn_g = jnp.maximum(tn_g, 0.0)     # origin inside the box
        # per-lane box gate (r5): a group is visited when ANY tile lane's
        # slab passes, but every lane gets swept — and a lane that truly
        # MISSES the box is re-originated at a garbage entry point, where
        # the bf16 apron can phantom-accept (observed: one false shadow
        # whose verdict flipped with tile composition). The lane's own
        # exact f32 slab verdict masks its accepts: any true hit lies
        # inside the box, so tn<=tf & tf>=0 is conservative.
        tf_g = jnp.minimum(jnp.minimum(
            jnp.maximum((gx - ox) * rdx, (hx - ox) * rdx),
            jnp.maximum((gy - oy) * rdy, (hy - oy) * rdy)),
            jnp.maximum((gz - oz) * rdz, (hz - oz) * rdz))
        bm = _dup2(((tn_g <= tf_g) & (tf_g >= 0.0)).astype(jnp.bfloat16))
        if groups_hbm:
            blk = blk_in                  # pre-fetched by the leaf queue
        else:
            blk = groups_ref[pl.ds(base, BF_ROWS), :]    # (32,128) bf16
        o3 = (_dup2((ox + tn_g * dx - gx).astype(jnp.bfloat16)),
              _dup2((oy + tn_g * dy - gy).astype(jnp.bfloat16)),
              _dup2((oz + tn_g * dz - gz).astype(jnp.bfloat16)))
        d3 = (_dup2(dx.astype(jnp.bfloat16)),
              _dup2(dy.astype(jnp.bfloat16)),
              _dup2(dz.astype(jnp.bfloat16)))
        tn16 = _dup2(tn_g.astype(jnp.bfloat16))

        def comps_of(blk):
            out = []
            for i in range(9):
                out.append(jnp.concatenate(
                    [jnp.broadcast_to(blk[2 * i:2 * i + 1, :], (8, 128)),
                     jnp.broadcast_to(blk[2 * i + 1:2 * i + 2, :], (8, 128))],
                    axis=0))
            return out

        if closest:
            ab_nogk = bool(os.environ.get("PBRT_BF16_NOGK"))
            ab_nomerge = bool(os.environ.get("PBRT_BF16_NOMERGE"))
            t16_0 = _dup2(t_ref[:].astype(jnp.bfloat16))

            def lbody(k, carry):
                blk, t16, gk16 = carry
                tt, m, r_in, _muv = _bf16_mt(o3, d3, comps_of(blk))
                m = m * bm
                t_glob = tn16 + tt
                m = m * jnp.maximum(
                    jnp.minimum(t_glob * _bf(1e4), _bf(1.0)), _bf(0.0))
                pen = _bf(1.0) + _bf(0.05) * (_bf(1.0) - r_in)
                t_cand = (jnp.maximum(t_glob, _bf(0.0)) * pen
                          + (_bf(1.0) - m) * _bf(1e30))
                t_new = jnp.minimum(t16, t_cand)
                if not ab_nogk:
                    tc32 = t_cand.astype(jnp.float32)
                    won = (tc32 <= t_new.astype(jnp.float32)) & (tc32 < 9e29)
                    gkv = (v * 64 + k) * 2 + band_iota
                    gk16 = jnp.where(won, gkv, gk16)
                return (_roll_bf(blk, interpret), t_new, gk16)

            _, t16, gk16 = jax.lax.fori_loop(
                0, count2, lbody,
                (blk, t16_0, jnp.full((16, 128), -1, jnp.int32)))
            if not ab_nomerge:
                # band merge -> the (8,128) refs (pure elementwise)
                t32 = t16.astype(jnp.float32)
                t8 = jnp.minimum(t32[0:8], t32[8:16])
                gk8 = jnp.maximum(jnp.where(t32[0:8] == t8, gk16[0:8], -1),
                                  jnp.where(t32[8:16] == t8, gk16[8:16], -1))
                won8 = (t8 < t_ref[:]) & (gk8 >= 0)
                t_ref[:] = jnp.where(won8, t8, t_ref[:])
                gk_ref[:] = jnp.where(won8, gk8, gk_ref[:])
                iout_ref[:] = jnp.where(won8, inst, iout_ref[:])
        else:
            # Occlusion with CERTAIN/UNCERTAIN split (r5): the graded apron
            # accepts hits up to APRON *outside* a triangle — fine for the
            # closest path (the f32 winner retest drops phantoms) but a
            # FALSE OCCLUSION for IsOccluded, which had no retest: shadow
            # rays grazing any silhouette within 0.02 barycentric went
            # dark (found via a black center pixel in test_integrator).
            #   certain   (min_uv > +APRON, outside bf16 noise): occluded,
            #             ends the ray exactly as before;
            #   uncertain (apron zone |min_uv| <= APRON): flagged in
            #             gk_ref; the wrapper resolves flagged lanes with
            #             ONE gated exact-f32 any pass over the (few %,
            #             usually zero) uncertain subset.
            # The hot loop stays pure bf16 — one extra ramp + accumulate
            # per iteration (an int32/f32 per-candidate variant of this
            # fix cost +70% frame time and was reverted, PERF_LOG r5).
            tmax16 = _dup2(tmax.astype(jnp.bfloat16))

            def lbody(k, carry):
                blk, cert16, unc16 = carry
                tt, m, _r_in, muv = _bf16_mt(o3, d3, comps_of(blk))
                m = m * bm
                t_glob = tn16 + tt
                mt = jnp.maximum(
                    jnp.minimum(t_glob * _bf(1e4), _bf(1.0)), _bf(0.0)
                ) * jnp.maximum(
                    jnp.minimum((tmax16 - t_glob) * _bf(1e4), _bf(1.0)),
                    _bf(0.0))
                m_cert = jnp.maximum(
                    jnp.minimum((muv - _bf(APRON)) * _bf(1e4), _bf(1.0)),
                    _bf(0.0))
                cert16 = jnp.maximum(cert16, m * m_cert * mt)
                unc16 = jnp.maximum(unc16, m * mt)
                return (_roll_bf(blk, interpret), cert16, unc16)

            _, cert16, unc16 = jax.lax.fori_loop(
                0, count2, lbody,
                (blk, jnp.zeros((16, 128), jnp.bfloat16),
                 jnp.zeros((16, 128), jnp.bfloat16)))
            c32 = cert16.astype(jnp.float32)
            u32 = unc16.astype(jnp.float32)
            t_ref[:] = jnp.maximum(t_ref[:],
                                   jnp.maximum(c32[0:8], c32[8:16]))
            gk_ref[:] = jnp.maximum(
                gk_ref[:], (jnp.maximum(u32[0:8], u32[8:16])
                            > 0.5).astype(jnp.int32))

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
            t_clip = jnp.where(t_ref[:] > 0.5, 0.0, tmax)

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
        any0 = jnp.any(h0) & (c0 != ABSENT)
        any1 = jnp.any(h1) & (c1 != ABSENT)
        if closest:
            m0 = jnp.min(jnp.where(h0, tn0, BIG))
            m1 = jnp.min(jnp.where(h1, tn1, BIG))
            swap = m1 < m0
            near = jnp.where(swap, c1, c0)
            far = jnp.where(swap, c0, c1)
            near_ok = jnp.where(swap, any1, any0)
            far_ok = jnp.where(swap, any0, any1)
        else:
            # occlusion: any hit ends the ray — ordering is wasted work
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

        if groups_hbm:
            # leaf queue: start this leaf's DMA into the idle buffer, then
            # sweep the PREVIOUS leaf (whose DMA has been in flight across
            # all node steps since its discovery)
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
            enter = is_inst & ~is_restore
            new_inst = jnp.where(enter, iid, jnp.where(is_restore, -1, inst))
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
            done = jnp.all((t_ref[:] > 0.5) | (tmax <= 0.0))
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
    if os.environ.get("PBRT_BF16_DEBUG_STEPS"):
        t_ref[:] = jnp.full((8, 128), fin[0].astype(jnp.float32))


def _read_node(nodes_ref, cur, k, smem):
    if smem:
        return nodes_ref[cur * NODE_F + k]
    return nodes_ref[cur, k]


def _pack(x, n_prog, pad, fill=0.0):
    x = jnp.pad(x, (0, pad), constant_values=fill)
    return x.reshape(n_prog * 8, 128)


def _call_bf16(dbvh: DenseBVH, o, d, t_max, *, closest, stack_depth=128,
               interpret=False, components=None):
    assert dbvh.groups_bf is not None, \
        "DenseBVH built without bf16 banded groups (rebuild the scene)"
    B = t_max.shape[0] if components is not None else o.shape[0]
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
    if os.environ.get("PBRT_BF16_MAX_STEPS"):      # debug hook
        max_steps = int(os.environ["PBRT_BF16_MAX_STEPS"])
    stack_depth = max(stack_depth, min(2 * n_nodes + 16, 4096))

    if components is None:
        components = (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])
    ox, oy, oz, dx, dy, dz = (_pack(c, n_prog, pad) for c in components)
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
    scratch = [pltpu.SMEM((stack_depth,), jnp.int32)]
    if two_level:
        scratch += [pltpu.VMEM((72, 128), jnp.float32)]
    if groups_hbm:
        # leaf-queue ping-pong buffers (see _traverse_kernel)
        scratch += [pltpu.VMEM((BF_ROWS, 128), jnp.bfloat16),
                    pltpu.VMEM((BF_ROWS, 128), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
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


REFINE_WIN = int(os.environ.get("PBRT_BF16_REFINE_WIN", "1"))
# Refine window: lanes of the winner's group retested exactly in f32.
#   1 (default): winner-only — ~10 scalar gathers per ray. The exact
#     record of the winner; apron winners whose exact test misses keep
#     the hit with CLAMPED barycentrics (displacement <= APRON x triangle
#     size) unless they miss beyond the apron (rejected).
#   16: covers every distinct triangle of a c<=16 group — resolves
#     pinhole fuzz to the exact neighbour and rejects silhouette-apron
#     hits exactly, but costs 16x the gathers: measured 160 ms per 131k
#     rays on-chip (~5x the traversal itself) — XLA scalar gathers are
#     the bottleneck, hence not the default.


def _decode_fast(dbvh: DenseBVH, tb, gk, inst):
    """Minimal decode for the integrator path: winner prim id only (ONE
    scalar gather per ray) + the kernel's bf16 t. The integrator's own
    refine_hit recomputes the exact f32 (t, u, v) from the prim — doing it
    here too would duplicate 9 more gathers (measured ~12 ms / 131k rays,
    comparable to the traversal itself). Callers needing a standalone
    exact record use the default exact decode instead."""
    B = tb.shape[0]
    found = gk >= 0
    gkc = jnp.maximum(gk, 0)
    band = gkc % 2
    rest = gkc // 2
    k = rest % 64
    g8l = rest // 64
    g = g8l // 8
    log2c = g8l % 8
    c = jnp.left_shift(jnp.int32(1), log2c)
    shift = (band * c) // BF_BANDS
    lane = (jnp.arange(B, dtype=jnp.int32) % 128)
    slot = (lane - k - shift) % 128
    if dbvh.pids_c is not None:
        # compact decode table: group g's distinct prims live at
        # [g*C, g*C + c); the id row is c-periodic so slot mod c indexes it
        # (c is a power of two). Gathering from the (G*C,) table instead of
        # the (G*16,128) groups array cuts the scalar-gather cost ~2.5x
        # (profiles/frame_r05_bf16).
        C = dbvh.pids_c.shape[0] // (dbvh.groups_bf.shape[0] // BF_ROWS)
        prim_local = jnp.rint(jnp.take(
            dbvh.pids_c, g * C + (slot & (c - 1)), mode="clip")
        ).astype(jnp.int32)
    else:
        gflat = dbvh.groups.reshape(-1)
        prim_local = jnp.rint(jnp.take(
            gflat, (g * GROUP_ROWS + 9) * 128 + slot, mode="clip")
        ).astype(jnp.int32)
    found = found & (prim_local >= 0)
    base = jnp.take(dbvh.prim_base, jnp.maximum(inst, 0), mode="clip")
    return Hit(t=jnp.where(found, tb, BVH_FAR),
               u=jnp.zeros((B,), jnp.float32),
               v=jnp.zeros((B,), jnp.float32),
               prim=jnp.where(found, prim_local + base, -1),
               inst=jnp.where(found, jnp.maximum(inst, 0), -1))


def _decode_refine(dbvh: DenseBVH, o, d, t_max, tb, gk, inst):
    """Decode the kernel's winner id to its leaf GROUP and re-intersect a
    16-triangle window of that group with the exact f32 kernel predicate.

    Why the whole window and not just the winner: the bf16 sweep accepts a
    graded apron around each triangle (see _bf16_mt) so near-edge hits
    cannot fall through; the apron winner may be (a) a hair outside its
    triangle while the TRUE hit is on the adjacent one (pinhole fuzz) or
    (b) a silhouette ray that truly misses. Exact retesting resolves both:
    (a) finds the true neighbour hit EXACTLY, (b) finds nothing and
    reports a miss. Because interior hits outrank apron hits by the 5%
    penalty, the true closest hit lies in the winner's group except for
    cross-group coplanar near-ties (bf16 t noise) and the rare pinhole
    whose two edge triangles landed in different groups (~1e-4 of rays)."""
    B = o.shape[0]
    two_level = dbvh.inst16.shape[0] >= INST_F
    found = gk >= 0
    gkc = jnp.maximum(gk, 0)
    band = gkc % 2
    rest = gkc // 2
    k = rest % 64
    g8l = rest // 64
    g = g8l // 8
    log2c = g8l % 8
    c = jnp.left_shift(jnp.int32(1), log2c)
    shift = (band * c) // BF_BANDS
    lane = (jnp.arange(B, dtype=jnp.int32) % 128)
    slot = (lane - k - shift) % 128
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
    if REFINE_WIN > 1:
        t_rank = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t_rank, axis=1)                        # (B,)
        hitq = jnp.take_along_axis(ok, j[:, None], axis=1)[:, 0]
        found = found & hitq
        pick = lambda x: jnp.take_along_axis(x, j[:, None], axis=1)[:, 0]
        t, u, v = pick(t), pick(u), pick(v)
        prim_local = pick(prims)
    else:
        # winner-only: exact record for true winners; apron winners whose
        # exact test misses within the apron keep a CLAMPED hit (pinhole
        # protection), beyond the apron they are rejected (silhouettes)
        t, u, v = t[:, 0], u[:, 0], v[:, 0]
        prim_local = prims[:, 0]
        min_uv = jnp.minimum(jnp.minimum(u, v), 1.0 - u - v)
        det0 = det[:, 0]
        found = found & (jnp.abs(det0) > 1e-9) & (t > 0.0) \
            & (t < t_max) & (prim_local >= 0) & (min_uv > -APRON)
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, jnp.maximum(1.0 - u, 0.0))

    base = jnp.take(dbvh.prim_base, jnp.maximum(inst, 0), mode="clip")
    return Hit(t=jnp.where(found, t, BVH_FAR),
               u=jnp.where(found, u, 0.0),
               v=jnp.where(found, v, 0.0),
               prim=jnp.where(found, prim_local + base, -1),
               inst=jnp.where(found, jnp.maximum(inst, 0), -1))


DECODE_TILE = int(os.environ.get("PBRT_BF16_DECODE_TILE", "8192"))


def _gated_decode(dbvh: DenseBVH, tb, gk, inst, refine,
                  o=None, d=None, t_max=None, tile=None):
    """Winner decode in gated TILE-lane slices: the decode gathers ran
    full-width although deep-bounce wavefronts are 91-98% miss/dead
    (9.3% of the scene1 frame, profiles/scene1_r05) — and under the
    co-sort, dead/miss lanes cluster, so whole slices skip to a constant
    miss record behind a scalar any(). Slices are multiples of 128 so
    the in-slice lane position equals the global one (the slot decode
    depends on it)."""
    tile = DECODE_TILE if tile is None else tile
    B = tb.shape[0]
    n = -(-B // tile) if tile > 0 else 1
    if refine != "fast":
        # the exact decode recomputes (t, u, v) in f32: slicing changes
        # XLA's vectorization and shifts results by ULPs — keep it
        # full-width so standalone exact records stay batch-invariant
        # (the gather-only fast decode is exact under slicing)
        n = 1

    def full(args):
        tb, gk, inst, o, d, t_max = args
        if refine == "fast":
            return _decode_fast(dbvh, tb, gk, inst)
        return _decode_refine(dbvh, o, d, t_max, tb, gk, inst)

    if n <= 1 or tile % 128:
        return full((tb, gk, inst, o, d, t_max))
    Bp = n * tile

    def pad(x, fill=0):
        if x is None:
            return None
        w = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, w, constant_values=fill).reshape(
            (n, tile) + x.shape[1:])

    args = (pad(tb), pad(gk, -1), pad(inst, -1), pad(o), pad(d), pad(t_max))

    def miss(args):
        w = args[0].shape[0]
        neg1 = jnp.full((w,), -1, jnp.int32)
        z = jnp.zeros((w,), jnp.float32)
        return Hit(t=jnp.full((w,), BVH_FAR, jnp.float32), u=z, v=z,
                   prim=neg1, inst=neg1)

    hit = jax.lax.map(
        lambda a: jax.lax.cond(jnp.any(a[1] >= 0), full, miss, a), args)
    return jax.tree.map(lambda x: x.reshape((Bp,) + x.shape[2:])[:B], hit)


def intersect_closest_bf16(dbvh: DenseBVH, o, d, t_max=None, *,
                           interpret=False, refine="exact",
                           **_ignored) -> Hit:
    """Closest-hit via the bf16-sweep kernel.

    refine="exact": standalone exact f32 hit record (winner retest).
    refine="fast": prim decode only — for callers that refine themselves
    (the integrator's refine_hit); t is the kernel's bf16 value, u=v=0."""
    B = o.shape[0]
    if t_max is None:
        t_max = jnp.full((B,), BVH_FAR, o.dtype)
    tb, gk, inst = _call_bf16(dbvh, o, d, t_max, closest=True,
                              interpret=interpret)
    return _gated_decode(dbvh, tb, gk, inst, refine, o, d, t_max)


def _resolve_uncertain(dbvh: DenseBVH, o, d, t_max, cert, unc,
                       interpret=False, components=None):
    """Resolve the occlusion kernel's UNCERTAIN (apron-zone) lanes with an
    exact f32 any pass restricted to those lanes (t_max masked to 0
    elsewhere), gated on a scalar any() — a batch with no apron grazes
    pays one reduction.

    Layout matters (both measured, PERF_LOG r5.13): pass ``components``
    to REUSE an existing coherent sort — tiles without uncertain lanes
    are then all-dead and exit at the kernel's first whole-tile check.
    Without components the rays are re-sorted here: an UNSORTED masked
    pass looks cheaper but scatters the uncertain lanes across every
    tile (788 ms frame vs 640 sorted)."""
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        intersect_any_dense, sorted_any_dense)
    need = unc & ~cert

    def rerun(_):
        tm = jnp.where(need, t_max, 0.0)
        if components is not None:
            return intersect_any_dense(dbvh, None, None, tm,
                                       interpret=interpret,
                                       components=components)
        return sorted_any_dense(dbvh, o, d, tm, interpret=interpret)

    occ2 = jax.lax.cond(jnp.any(need), rerun,
                        lambda _: jnp.zeros_like(need), 0)
    return cert | (need & occ2)


def intersect_any_bf16(dbvh: DenseBVH, o, d, t_max, *,
                       interpret=False, **_ignored) -> jnp.ndarray:
    """Occlusion query: True where a hit exists with t in (0, t_max).

    Occluded = kernel-certain (interior hit by more than the apron) OR an
    exact f32 verdict on the apron-uncertain lanes — without that second
    pass, shadow rays grazing silhouettes within the 0.02 apron were
    falsely darkened (black center pixel in test_integrator)."""
    t, gk, _ = _call_bf16(dbvh, o, d, t_max, closest=False,
                          interpret=interpret)
    return _resolve_uncertain(dbvh, o, d, t_max, t > 0.5, gk > 0,
                              interpret=interpret)


def _cosort_rays(dbvh: DenseBVH, o, d, t_max, mode):
    """One multi-operand stable sort into coherent-tile order (identical
    permutation to the old argsort+take path; see ops/pallas_trace.py)."""
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_key
    key = morton_key(o, d, dbvh.world_lo, dbvh.world_hi,
                     dead=t_max <= 0.0, mode=mode)
    idx = jnp.arange(t_max.shape[0], dtype=jnp.int32)
    _, idx_s, ox, oy, oz, dx, dy, dz, tm = jax.lax.sort(
        (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         t_max), num_keys=1)
    return idx_s, (ox, oy, oz, dx, dy, dz), tm


def sorted_closest_bf16(dbvh: DenseBVH, o, d, t_max=None, *,
                        interpret=False, sort_mode="octant_major",
                        refine="exact", **_ignored) -> Hit:
    if t_max is None:
        t_max = jnp.full((o.shape[0],), BVH_FAR, o.dtype)
    idx_s, comps, tm = _cosort_rays(dbvh, o, d, t_max, sort_mode)
    tb, gk, inst = _call_bf16(dbvh, None, None, tm, closest=True,
                              interpret=interpret, components=comps)
    # decode in SORTED order (the winner-slot decode depends on the lane
    # position the kernel saw; miss/dead lanes cluster here, so the gated
    # decode skips their slices), then co-sort the hit record back
    if refine == "fast":
        hit = _gated_decode(dbvh, tb, gk, inst, "fast")
    else:
        os_ = jnp.stack(comps[0:3], axis=1)
        ds_ = jnp.stack(comps[3:6], axis=1)
        hit = _gated_decode(dbvh, tb, gk, inst, refine, os_, ds_, tm)
    _, t, u, v, prim, inst = jax.lax.sort(
        (idx_s, hit.t, hit.u, hit.v, hit.prim, hit.inst), num_keys=1)
    return Hit(t=t, u=u, v=v, prim=prim, inst=inst)


def sorted_any_bf16(dbvh: DenseBVH, o, d, t_max, *,
                    interpret=False, sort_mode="octant_major",
                    **_ignored) -> jnp.ndarray:
    idx_s, comps, tm = _cosort_rays(dbvh, o, d, t_max, sort_mode)
    t, gk, _ = _call_bf16(dbvh, None, None, tm, closest=False,
                          interpret=interpret, components=comps)
    # resolve the uncertain lanes IN SORTED SPACE, reusing the coherent
    # layout (no second sort; skip-at-root for uncertain-free tiles),
    # then co-sort the final verdict back
    occ_s = _resolve_uncertain(dbvh, None, None, tm, t > 0.5, gk > 0,
                               interpret=interpret, components=comps)
    _, occ = jax.lax.sort((idx_s, occ_s.astype(jnp.int32)), num_keys=1)
    return occ > 0
