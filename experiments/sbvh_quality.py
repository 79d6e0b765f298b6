"""SBVH (BuildHQ analogue) vs binned SAH: quality + traversal speed.

VERDICT.md round-1 #5 done-bar: sah_cost reported for both builders on the
helmet mesh, traversal speedup measured. Runs on whatever backend is live
(pass --cpu to force CPU; on the real chip the Pallas engine is timed with
the slope method from experiments/devtime.py).

Usage: python experiments/sbvh_quality.py [--cpu] [--rays N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HELMET = "/root/reference/assets/prefabs/models/SciFiHelmet/SciFiHelmet.gltf"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rays", type=int, default=1 << 17)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from experiments.devtime import fetch_scalar
    from physically_based_ray_tracer_tpu.bvh.builder import (build_bvh,
                                                             build_bvh_hq,
                                                             bvh_depth)
    from physically_based_ray_tracer_tpu.bvh.dense import build_dense
    from physically_based_ray_tracer_tpu.bvh.types import sah_cost
    from physically_based_ray_tracer_tpu.models.gltf import load_gltf
    from physically_based_ray_tracer_tpu.ops.pallas_trace import \
        intersect_closest_dense

    m = load_gltf(HELMET)
    tri = np.asarray(m.corners, np.float32).reshape(-1, 3, 3)
    print(f"helmet: {tri.shape[0]} tris")

    # --- classic 2-wide builders: SAH cost diagnostic ---
    for name, fn in (("binned-SAH", build_bvh), ("SBVH", build_bvh_hq)):
        t0 = time.time()
        b = fn(tri, leaf_size=4)
        dt = time.time() - t0
        c = sah_cost(np.asarray(b.nodes_box), np.asarray(b.nodes_child))
        print(f"  {name:11s}: sah={c:7.2f} nodes={b.n_nodes} "
              f"prims={b.n_prims} depth={bvh_depth(b)} build={dt:.2f}s")

    # --- dense Pallas engine: traversal timing std vs hq ---
    rng = np.random.default_rng(0)
    o = rng.normal(size=(args.rays, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=1, keepdims=True) * 4.0
    tgt = rng.normal(size=(args.rays, 3)).astype(np.float32) * 0.5
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    interpret = jax.devices()[0].platform == "cpu"
    for name, hq in (("std", False), ("hq ", True)):
        dbvh, depth = build_dense(tri, leaf_target=64, hq=hq)
        f = jax.jit(lambda o, d, dbvh=dbvh: intersect_closest_dense(
            dbvh, o, d, interpret=interpret).t.sum())
        fetch_scalar(f(o, d))  # compile+warm
        t0 = time.perf_counter()
        fetch_scalar(f(o, d))
        t1 = time.perf_counter()
        fetch_scalar(f(o, d))
        t2 = time.perf_counter()
        dt = min(t1 - t0, t2 - t1)
        print(f"  dense {name}: groups={dbvh.n_groups} depth={depth} "
              f"closest-hit {args.rays / dt / 1e6:7.2f} Mrays/s "
              f"({dt * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
