"""HBM-resident big-scene traversal benchmark (VERDICT r3 item #6).

A >=1M-triangle scene (15 instanced SciFiHelmets, ~70k tris each, shared
BLAS) whose leaf-group table exceeds the VMEM budget, so every leaf visit
DMAs its (32,128) bf16 / (16,128) f32 block from HBM. Reports per-pass
traversal rates for the f32 and bf16 engines and, for scale, the same
passes on a VMEM-resident scene — the HBM tax per visit.

Run:  python experiments/big_scene_tpu.py   (one TPU job at a time)
-> docs/BIG_SCENE_r04.json
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


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from physically_based_ray_tracer_tpu.models.gltf import load_gltf
    from physically_based_ray_tracer_tpu.ops.pallas_bf16 import (
        sorted_closest_bf16)
    from physically_based_ray_tracer_tpu.ops.pallas_trace import (
        sorted_closest_dense)
    from physically_based_ray_tracer_tpu.scene.camera import (Camera,
                                                              primary_rays)
    from physically_based_ray_tracer_tpu.scene.lights import LightSet
    from physically_based_ray_tracer_tpu.scene.scene import (
        Instance, build_scene_instanced)

    interp = jax.default_backend() not in ("tpu", "axon")
    helmet = load_gltf(
        "/root/reference/assets/prefabs/models/SciFiHelmet/SciFiHelmet.gltf")
    n_tris = helmet.n_tris
    insts = [Instance(0, position=(2.5 * (i % 7) - 7.5,
                                   2.5 * ((i // 7) % 7) - 3.75,
                                   -2.5 * (i // 49)))
             for i in range(45)]
    lights = LightSet.make(dir_pos=[[4, 6, 5]],
                           dir_color=[[2, 2, 2]]).pad_points(4)
    scene, _h, depth = build_scene_instanced([helmet], insts, lights,
                                             legacy_bvh=False)
    dn = scene.dense
    total_tris = n_tris * 45
    print(f"scene: {total_tris} instanced tris, "
          f"{dn.groups.shape[0] // 16} groups "
          f"(bf16 table {dn.groups_bf.nbytes / 1e6:.1f} MB)", flush=True)

    cam = Camera.make(pos=(0, 0.6, 9.0), target=(0, 0.6, 0))
    B = 131072
    ids = jnp.arange(B, dtype=jnp.int32) * ((1280 * 720) // B)
    xs = (ids % 1280).astype(jnp.float32)
    ys = (ids // 1280).astype(jnp.float32)
    o, d = primary_rays(cam, xs, ys, 1280, 720)
    t_init = jnp.full((B,), 1e30, jnp.float32)

    out = {"total_tris": int(total_tris),
           "groups": int(dn.groups.shape[0] // 16),
           "note": "r5: bf16 path uses the decoupled leaf queue (ping-pong DMA; fetch N+1 overlaps sweep N); f32 path still start-before-setup only"}
    for name, fn, kw in (
            ("f32", sorted_closest_dense, {}),
            ("bf16", sorted_closest_bf16, {"refine": "fast"})):
        f = jax.jit(functools.partial(fn, interpret=interp, **kw))
        ms = wall(lambda: f(dn, o, d, t_init).t)
        out[f"primary_closest_{name}_ms"] = round(ms, 2)
        out[f"primary_closest_{name}_mrays"] = round(B / ms / 1e3, 2)
        print(f"{name}: {ms:.1f} ms ({B / ms / 1e3:.2f} Mrays/s, "
              f"HBM leaf groups)", flush=True)

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    with open(os.path.join(docs, "BIG_SCENE_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
