"""Profile traversal kernels on the real chip (dev tool, not part of bench)."""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import build_bench_scene
from physically_based_ray_tracer_tpu.scene.camera import primary_rays
from physically_based_ray_tracer_tpu.render.renderer import morton_pixel_order


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    scene, cam, _ = build_bench_scene()
    W, H = 1280, 720
    ids = jnp.asarray(morton_pixel_order(W, H))
    xs = (ids % W).astype(jnp.float32)
    ys = (ids // W).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, W, H)
    o = jax.block_until_ready(o)
    n = o.shape[0]
    print(f"rays: {n}, tris: {scene.bvh.tris.shape[0]}, nodes: {scene.bvh.nodes_box.shape[0]}")

    from physically_based_ray_tracer_tpu.ops import traverse_packet as tp

    for chunk in (65536, 262144, n):
        for tile in (128, 256):
            for node_steps, leaf_cap in ((8, 4), (16, 8)):
                f = jax.jit(functools.partial(
                    tp.intersect_closest_wave, tile=tile, stack_depth=32,
                    leaf_size=16, node_steps=node_steps, leaf_cap=leaf_cap,
                    dense="mt", shrink=8))
                oc, dc = o[:chunk], d[:chunk]
                try:
                    dt = timeit(f, scene.bvh, oc, dc)
                    print(f"wave chunk={chunk:8d} tile={tile} steps={node_steps} "
                          f"cap={leaf_cap}: {dt*1e3:8.1f} ms  "
                          f"{chunk/dt/1e6:8.1f} Mrays/s")
                except Exception as e:
                    print(f"wave chunk={chunk} tile={tile}: FAIL {type(e).__name__} {str(e)[:120]}")


if __name__ == "__main__":
    main()
