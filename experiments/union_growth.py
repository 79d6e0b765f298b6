"""Tile-union growth when doubling the traversal tile to 2048 rays.

The bf16 2048-ray variant (experiments/bf16_sweep.py case B) doubles
tests/op but a shared-stack tile pays the UNION of its rays' leaf paths —
a 2048-lane union is larger than a 1024-lane one. This measures exactly
how much larger, with the count_steps exact accounting, on the flagship
bench geometry for:
  * primary rays (coherent, Morton pixel order), and
  * real bounce-1 wavefronts (trace_paths collect_debug rays, dead lanes
    sorted last) — the incoherent case that dominates the frame.

Effective bf16-B speedup on the sweep = 2 / union_growth; compare with
case C/D (1024 rays x 2 triangles: growth exactly 1.0 by construction).

Run:  JAX_PLATFORMS=cpu python experiments/union_growth.py [leaf_target]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from count_steps import tile_traverse
    from physically_based_ray_tracer_tpu.bvh.dense import (_build_core,
                                                           shape_dense_leaves)
    from physically_based_ray_tracer_tpu.ops.traverse_packet import morton_order
    from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
    from physically_based_ray_tracer_tpu.scene.procedural import (make_quad,
                                                                  make_sphere)

    lt = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    sphere = make_sphere(radius=1.0, lat=32, lon=64)[0].reshape(-1, 3, 3)
    floor = make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]
                      )[0].reshape(-1, 3, 3)
    offs = [(dx, 0, dz) for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
    world = np.concatenate([sphere + np.asarray(o, np.float32) for o in offs]
                           + [floor]).astype(np.float32)
    nodes, segs, depth, lo, hi = _build_core(world, lt)
    nodes, segs = shape_dense_leaves(world, nodes, segs)
    tile_traverse.tri = world

    cam = Camera.make(pos=(0, 2.5, 7), target=(0, 0, 0))
    B = 16384
    stride = (1280 * 720) // B
    ids = (np.arange(B, dtype=np.int64) * stride).astype(np.int32)
    xs = (ids % 1280).astype(np.float32)
    ys = (ids // 1280).astype(np.float32)
    o1, d1 = primary_rays(cam, jnp.asarray(xs), jnp.asarray(ys), 1280, 720)

    # real bounce-1 rays: run the integrator 2 bounces with the world-baked
    # scene and read the depth-1 wavefront from the debug tap
    from physically_based_ray_tracer_tpu.config import RenderConfig
    from physically_based_ray_tracer_tpu.render.integrator import trace_paths
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.procedural import make_quad as _
    from physically_based_ray_tracer_tpu.scene.scene import (MeshModel,
                                                             build_scene)
    from physically_based_ray_tracer_tpu.scene.scene import Instance

    import bench as bench_mod
    scene, cam2, _depth = bench_mod.build_bench_scene()
    cfg = RenderConfig(width=1280, height=720, bounces=2, antialias=False,
                       skybox=False, max_stack_depth=32, traversal="pallas",
                       one_shadow_ray=True)
    key = jax.random.key(0)
    _, _, dbg = trace_paths(scene, cfg, o1, d1, jnp.asarray(ids), key, 0,
                            collect_debug=True)
    ob = np.asarray(dbg["ray_o"][1])      # bounce-1 wavefront
    db = np.asarray(dbg["ray_d"][1])
    alive = np.asarray(dbg["alive_out"][0])

    o1, d1 = np.asarray(o1), np.asarray(d1)

    def rolls_per_tile(o, d, dead, tile):
        perm = np.asarray(morton_order(jnp.asarray(o), jnp.asarray(d),
                                       jnp.asarray(lo), jnp.asarray(hi),
                                       dead=None if dead is None
                                       else jnp.asarray(dead)))
        o, d = o[perm], d[perm]
        t0 = np.full(len(o), 1e30, np.float32)
        if dead is not None:
            t0[~dead[perm].astype(bool) ^ True] = t0[0]  # no-op placeholder
            t0 = np.where(dead[perm], 0.0, 1e30).astype(np.float32)
        tot = np.zeros(3, np.int64)
        n_tiles = len(o) // tile
        for t in range(n_tiles):
            sl = slice(t * tile, (t + 1) * tile)
            s, v, r = tile_traverse(nodes, segs, o[sl], d[sl], t0[sl])
            tot += (s, v, r)
        return tot / n_tiles, n_tiles

    out = {"leaf_target": lt, "shaped": True, "n_rays": B,
           "what": "U(R): per-tile traversal union (node steps, leaf "
                   "visits, roll units) for tile sizes R. Sweep cost of a "
                   "p-triangle bf16 packing (R*p=2048 lanes) is "
                   "alpha(p)*U(R) per fixed ray population — smaller tiles "
                   "shrink the union; alpha(p) from BF16_SWEEP_r04.json."}
    for name, (o, d, dead) in {
            "primary": (o1, d1, None),
            "bounce1": (ob, db, ~alive)}.items():
        res = {}
        for R in (128, 256, 512, 1024, 2048):
            (s, v, r), _nt = rolls_per_tile(o, d, dead, R)
            res[f"tile{R}"] = {
                "steps": round(s, 1), "visits": round(v, 1),
                "rolls": round(r, 1),
                "steps_per_2048rays": round(s * 2048 / R, 1),
                "rolls_per_2048rays": round(r * 2048 / R, 1),
            }
        out[name] = res
        print(name, json.dumps(res))
    with open("/root/repo/docs/UNION_GROWTH_r04.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote docs/UNION_GROWTH_r04.json")


if __name__ == "__main__":
    main()
