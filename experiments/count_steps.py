"""Exact per-tile step/roll accounting for the Pallas megakernel.

Mirrors ops/pallas_trace.py's shared-stack tile traversal control flow in
numpy (same node ordering, same pruning, same whole-tile decisions) and
counts, per 1024-ray tile:
  * node steps (the while-loop iterations on internal nodes),
  * leaf visits and roll iterations (= the leaf's power-of-two period c).

With the measured ms/variant from sweep_dense_tpu.py this calibrates the
cost split C_step vs C_roll — what actually dominates the kernel.

Usage: python experiments/count_steps.py [leaf_target] [shape01]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tile_traverse(nodes, seg_of_group, o, d, t0):
    """One 1024-ray tile run to completion; returns (steps, visits, rolls)."""
    from physically_based_ray_tracer_tpu.bvh.dense import ABSENT

    rd = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d < 0, -1e-20, 1e-20), d)
    t = t0.copy()
    steps = visits = rolls = 0
    stack = []
    cur = 0
    while True:
        code = cur
        if code < 0:
            v = -(code + 1)
            g8l = v // 2
            g, log2c = g8l // 8, g8l % 8
            visits += 1
            rolls += 1 << log2c
            # real Möller-Trumbore vs all seg triangles: best-t tightening
            # drives the pruning exactly like the kernel
            tri = tile_traverse.tri[seg_of_group[g]]     # (k, 3, 3)
            v0 = tri[:, 0][None]                          # (1, k, 3)
            e1 = (tri[:, 1] - tri[:, 0])[None]
            e2 = (tri[:, 2] - tri[:, 0])[None]
            dd = d[:, None, :]
            oo = o[:, None, :]
            p = np.cross(dd, e2)
            det = np.sum(e1 * p, axis=-1)
            inv = 1.0 / np.where(np.abs(det) > 1e-9, det, 1.0)
            tv = oo - v0
            u = np.sum(tv * p, axis=-1) * inv
            q = np.cross(tv, e1)
            vv = np.sum(dd * q, axis=-1) * inv
            tt = np.sum(e2 * q, axis=-1) * inv
            ok = ((np.abs(det) > 1e-9) & (u >= 0) & (vv >= 0)
                  & (u + vv <= 1) & (tt > 0) & (tt < t[:, None]))
            t = np.where(ok.any(axis=1),
                         np.minimum(t, np.where(ok, tt, np.inf).min(axis=1)), t)
            cur = None
        else:
            steps += 1
            row = nodes[code]
            hits = []
            for side in range(2):
                c = int(np.rint(row[12 + side]))
                if c == ABSENT:
                    hits.append((False, np.inf, c))
                    continue
                lo = row[6 * side:6 * side + 3]
                hi = row[6 * side + 3:6 * side + 6]
                t0s = (lo[None, :] - o) * rd
                t1s = (hi[None, :] - o) * rd
                tn = np.minimum(t0s, t1s).max(axis=1)
                tf = np.maximum(t0s, t1s).min(axis=1)
                h = (tn <= tf) & (tf > 0) & (tn < t) & (t > 0)
                hits.append((h.any(), np.where(h, tn, np.inf).min(), c))
            (a_any, a_min, a_c), (b_any, b_min, b_c) = hits
            if b_min < a_min:
                (a_any, a_min, a_c), (b_any, b_min, b_c) = hits[1], hits[0]
            if a_any and b_any:
                stack.append(b_c)
                cur = a_c
            elif a_any:
                cur = a_c
            elif b_any:
                cur = b_c
            else:
                cur = None
            if cur is not None and cur < 0:
                continue
        if cur is None:
            if not stack:
                break
            cur = stack.pop()
    return steps, visits, rolls


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from physically_based_ray_tracer_tpu.bvh.dense import (_build_core,
                                                           shape_dense_leaves)
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
    from physically_based_ray_tracer_tpu.scene.procedural import (make_quad,
                                                                  make_sphere)
    import jax.numpy as jnp

    lt = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    shape = len(sys.argv) > 2 and sys.argv[2] == "1"

    sphere = make_sphere(radius=1.0, lat=32, lon=64)[0].reshape(-1, 3, 3)
    floor = make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]
                      )[0].reshape(-1, 3, 3)
    offs = [(dx, 0, dz) for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
    world = np.concatenate([sphere + np.asarray(o, np.float32) for o in offs]
                           + [floor]).astype(np.float32)

    nodes, segs, depth, lo, hi = _build_core(world, lt)
    if shape:
        nodes, segs = shape_dense_leaves(world, nodes, segs)
    tile_traverse.tri = world

    cam = Camera.make(pos=(0, 2.5, 7), target=(0, 0, 0))
    B = 16384
    stride = (1280 * 720) // B
    ids = (np.arange(B, dtype=np.int64) * stride).astype(np.int32)
    xs = (ids % 1280).astype(np.float32)
    ys = (ids // 1280).astype(np.float32)
    o, d = primary_rays(cam, jnp.asarray(xs), jnp.asarray(ys), 1280, 720)
    o = np.asarray(o)
    d = np.asarray(d)
    perm = np.asarray(morton_order(jnp.asarray(o), jnp.asarray(d),
                                   jnp.asarray(lo), jnp.asarray(hi)))
    o, d = o[perm], d[perm]

    tot = np.zeros(3, np.int64)
    n_tiles = B // 1024
    for tile in range(n_tiles):
        sl = slice(tile * 1024, (tile + 1) * 1024)
        s, v, r = tile_traverse(nodes, segs, o[sl], d[sl],
                                np.full(1024, 1e30, np.float32))
        tot += (s, v, r)
    print(f"lt={lt} shape={shape}: nodes={len(nodes)} groups={len(segs)} "
          f"depth={depth}")
    print(f"per tile: steps={tot[0]/n_tiles:.0f} leaf_visits={tot[1]/n_tiles:.0f} "
          f"rolls={tot[2]/n_tiles:.0f}")


if __name__ == "__main__":
    main()
