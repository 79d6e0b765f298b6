"""Leaf-target sweep for the bf16 2-band sweep engine (kernel level).

r3's sweep fixed lt=16 for the f32 kernel. The bf16 engine halves the
per-iteration count (2 triangles/ray), which shifts the node-step /
leaf-roll balance: larger leaves buy fewer node steps at cheaper extra
rolls. Slope-times bounce-wavefront closest-hit (the dominant pass) for
lt in {16, 24, 32} on the bench geometry, both engines.

Run: python experiments/lt_sweep_bf16.py -> docs/LT_SWEEP_BF16_r04.json
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import numpy as np
    import jax.numpy as jnp
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(jnp.sum(jnp.ravel(leaf)[:1].astype(jnp.float32))))


def wall(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def slope_of(body, init, K=8):
    import jax

    def repeat(n):
        @jax.jit
        def f(c):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)
        return f
    t1 = wall(repeat(1), init)
    tk = wall(repeat(K), init)
    return max((tk - t1) / (K - 1), 0.0)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from physically_based_ray_tracer_tpu.config import EPSILON
    from physically_based_ray_tracer_tpu.ops.pallas_bf16 import (
        sorted_closest_bf16)
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        sorted_closest_dense)
    from physically_based_ray_tracer_tpu.scene.camera import Camera, primary_rays
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.procedural import (make_quad,
                                                                  make_sphere)
    from physically_based_ray_tracer_tpu.scene.scene import (
        Instance, MeshModel, build_scene_instanced)
    from physically_based_ray_tracer_tpu.utils import rng
    from physically_based_ray_tracer_tpu.utils.rng import Purpose

    interp = jax.default_backend() not in ("tpu", "axon")
    sphere = MeshModel.from_fat(make_sphere(radius=1.0, lat=32, lon=64),
                                base_color=(0.8, 0.3, 0.2), roughness=0.4)
    floor = MeshModel.from_fat(
        make_quad([-8, -1, -8], [8, -1, -8], [8, -1, 8], [-8, -1, 8]),
        base_color=(0.6, 0.6, 0.6), roughness=0.8)
    lights = LightSet.make(point_pos=[[2, 3, 2]],
                           point_color=[[20, 20, 20]]).pad_points(4)
    instances = [Instance(0, position=(dx, 0, dz))
                 for dx in (-2.2, 0.0, 2.2) for dz in (-2.2, 0.0, 2.2)]
    instances.append(Instance(1))
    cam = Camera.make(pos=(0, 2.5, 7), target=(0, 0, 0))

    B = 131072
    ids = jnp.arange(B, dtype=jnp.int32) * ((1280 * 720) // B)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)

    out = {}
    for lt in (32, 48, 64):
        scene, _h, _dep = build_scene_instanced(
            [sphere, floor], instances, lights, dense_leaf_target=lt,
            legacy_bvh=False)
        dn = scene.dense

        # bounce-like rays from this build's own primary hits
        f0 = jax.jit(functools.partial(sorted_closest_dense,
                                       interpret=interp))
        hit = f0(dn, o, d, t_init)
        alive = hit.prim >= 0
        hp = o + d * jnp.where(alive, hit.t, 1.0)[:, None]
        u2 = rng.uniform2(jax.random.key(0), ids, 0, 0, Purpose.BRDF_SAMPLE)
        phi = 2 * np.pi * u2[:, 0]
        st = jnp.sqrt(u2[:, 1])
        bd = jnp.stack([jnp.cos(phi) * st, jnp.sqrt(1 - u2[:, 1]),
                        jnp.sin(phi) * st], -1)
        bo = hp + bd * EPSILON
        bt = jnp.where(alive, 1e30, 0.0)
        bo, bd, bt = jax.block_until_ready((bo, bd, bt))

        for name, fn, kw in (("f32", sorted_closest_dense, {}),
                             ("bf16", sorted_closest_bf16,
                              {"refine": "fast"})):
            def body(c, fn=fn, kw=kw, dn=dn, bo=bo, bd=bd, bt=bt):
                h = fn(dn, bo + c[:, None] * jnp.float32(0.0), bd, bt,
                       interpret=interp, **kw)
                return h.t
            ms = slope_of(body, jnp.zeros((B,), jnp.float32))
            out[f"lt{lt}_bounce_{name}_ms"] = round(ms, 2)
            print(f"lt={lt} {name}: {ms:.2f} ms", flush=True)

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "LT_SWEEP_BF16_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
